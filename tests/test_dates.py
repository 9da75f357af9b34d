"""Portuguese legal-date extraction: format priority, calendar
validity under ANSI, accent folding."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from legislation_scraper_spark.functions.dates import extract_date_pt

CASES = [
    # header form, any case, thousands-dotted act number nearby
    ("LEI Nº 12.345, DE 2 DE MARÇO DE 2004", dt.date(2004, 3, 2)),
    # leap-year Feb 29 valid
    ("de 29 de fevereiro de 2000", dt.date(2000, 2, 29)),
    # century non-leap: textual invalid, nothing else → NULL
    ("de 29 de fevereiro de 1900", None),
    # invalid textual (Apr 31) falls through to the slashed form
    (
        "31 de abril de 2020 revoga; publicado em 15/06/2020",
        dt.date(2020, 6, 15),
    ),
    # accent-folded month (OCR drops ç)
    ("2 de marco de 1995", dt.date(1995, 3, 2)),
    # invalid slashed (month 13) falls through to ISO
    ("Prazo: 32/13/2020 e depois 2021-12-31", dt.date(2021, 12, 31)),
    ("sem data nenhuma", None),
    # unknown month word → NULL textual, slashed wins
    ("1 de framboesa de 2010, DOU de 05/01/2010", dt.date(2010, 1, 5)),
    # textual takes priority over a later ISO date
    ("4 de maio de 1999 ... 2001-01-01", dt.date(1999, 5, 4)),
]


def test_extract_date_pt_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i int, t string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", extract_date_pt(F.col("t")).alias("d")
        ).collect()
    }
    for i, (text, want) in enumerate(CASES):
        assert got[i] == want, (text, got[i], want)


def test_extract_date_plan_is_codegen_only(spark):
    df = spark.createDataFrame([("x",)], "t string")
    out = df.select(extract_date_pt(F.col("t")).alias("d"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
