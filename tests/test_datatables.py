"""S4 DataTables protocol parity: the Spark column algebra in
operators/datatables.py must reproduce a straight-line Python twin of
the reference loop (distrito_federal.py:214-287, 360-395) on the same
bodies — including Unicode norm types, empty pages, and broken JSON."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from legislation_scraper_spark.operators import datatables as dt


def _py_transform_norm_type(s: str) -> str:
    # distrito_federal.py:252-261 verbatim semantics
    return "".join(c if c.isalnum() else "_" for c in s)


def _py_docs(body: str, base_url: str):
    # the reference's _get_docs_links JSON branch, straight-line
    try:
        data = json.loads(body)
    except ValueError:
        return None
    docs = []
    for item in data["aaData"]:
        s = item["_source"]
        title = f"{s['nm_tipo_norma']} {s['nr_norma']} de {s['dt_assinatura']}"
        link = (
            f"{base_url}/Norma/{s['ch_norma']}/"
            f"{_py_transform_norm_type(s['nm_tipo_norma'])}_{s['nr_norma']}_"
            f"{s['dt_assinatura'].replace('/', '_')}.html"
        )
        docs.append((title, s["ds_ementa"], s["dt_assinatura"], link))
    return docs


BODIES = [
    json.dumps(
        {
            "aaData": [
                {
                    "_source": {
                        "nm_tipo_norma": "Instrução Normativa",
                        "nr_norma": "123",
                        "ch_norma": "abc-1",
                        "dt_assinatura": "12/03/2021",
                        "ds_ementa": "Dispõe sobre x",
                    }
                },
                {
                    "_source": {
                        "nm_tipo_norma": "Lei Complementar",
                        "nr_norma": "7",
                        "ch_norma": "k9",
                        "dt_assinatura": "01/01/1999",
                        "ds_ementa": "y",
                    }
                },
                {
                    # º is Unicode-alnum: Java \p{L} must agree with
                    # Python str.isalnum here
                    "_source": {
                        "nm_tipo_norma": "Decreto Nº 2.1 (especial)",
                        "nr_norma": "88",
                        "ch_norma": "zz",
                        "dt_assinatura": "31/12/2000",
                        "ds_ementa": "z",
                    }
                },
            ],
            "iTotalRecords": 2,
        }
    ),
    json.dumps({"aaData": [], "iTotalRecords": 0}),
    "<html>not json (server error page)</html>",
]


def test_doc_records_parity(spark):
    base = "https://www.sinj.df.gov.br"
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(BODIES)], "i int, body string"
    )
    out = {
        r["i"]: r["recs"]
        for r in df.select(
            "i", dt.doc_records(F.col("body"), F.lit(base)).alias("recs")
        ).collect()
    }
    for i, body in enumerate(BODIES):
        expect = _py_docs(body, base)
        got = out[i]
        if expect is None:
            assert got is None  # broken JSON → NULL struct → NULL array
            continue
        assert [tuple(r) for r in got] == expect


def test_unicode_norm_type_matches_isalnum():
    # ç/ã/º are alnum in Python (º is category Lo) ⇒ must survive;
    # space and punctuation must not
    assert _py_transform_norm_type("Instrução Nº 2.1") == "Instrução_Nº_2_1"


def test_count_probe_and_page_starts(spark):
    rows = [(0, json.dumps({"counts": [{"count": 0}]})),
            (1, json.dumps({"counts": [{"count": 1}]})),
            (2, json.dumps({"counts": [{"count": 100}]})),
            (3, json.dumps({"counts": [{"count": 101}]})),
            (4, json.dumps({"counts": [{"count": 250}]}))]
    df = spark.createDataFrame(rows, "i int, body string")
    total = dt.probe_count(F.col("body"))
    got = {
        r["i"]: (r["total"], r["starts"])
        for r in df.select(
            "i", total.alias("total"), dt.page_starts(total).alias("starts")
        ).collect()
    }
    for i, body in rows:
        n = json.loads(body)["counts"][0]["count"]
        pages = math.ceil(n / dt.DISPLAY_LENGTH)
        expect = [p * dt.DISPLAY_LENGTH for p in range(pages)]
        assert got[i] == (n, expect), i


def test_search_body_duplicate_keys_ordered(spark):
    df = spark.createDataFrame([(2020, 42, "Vigente", 7, 3)],
                               "year int, sid int, sit string, tid int, pg int")
    body = df.select(
        dt.search_body(
            F.col("year"), F.col("sid"), F.col("sit"), F.col("tid"),
            F.col("pg"),
        ).alias("b")
    ).collect()[0]["b"]
    # reference order: params first, then argumento (year), then
    # argumento (situation) — distrito_federal.py:238-243
    assert body == (
        "ch_tipo_norma=7&iDisplayLength=100&iDisplayStart=200"
        "&argumento=number#ano_assinatura#Ano de Assinatura#igual#"
        "igual a#2020#2020#E"
        "&argumento=autocomplete#ch_situacao#Situação#igual#igual a#"
        "42#Vigente#E"
    )
    assert body.count("argumento=") == 2
