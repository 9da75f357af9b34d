"""Streaming frontier admission == batch twin (stateless gates)."""

from __future__ import annotations

from legislation_scraper_spark.operators.traps import template_stats
from legislation_scraper_spark.streaming.admission_stream import (
    admission_batch_twin,
    stream_admission,
)


def _world(spark):
    trap_pages = spark.createDataFrame(
        [
            ("https://www.a.leg.br/cal/2020/1?view=month", "cal"),
            ("https://www.a.leg.br/cal/2020/2?view=month", "cal"),
            ("https://www.a.leg.br/cal/2021/1?view=month", "cal"),
            ("https://www.a.leg.br/cal/2021/2?view=month", "cal"),
            ("https://www.a.leg.br/norma/1", "doc um"),
            ("https://www.a.leg.br/norma/2", "doc dois"),
        ],
        "url string, text string",
    )
    stats = template_stats(trap_pages)
    rules = spark.createDataFrame(
        [("br,leg,", True), ("br,leg,b)", False)],
        "surt_prefix string, allow boolean",
    )
    links = [
        ("https://www.a.leg.br/norma/9",),          # admitted
        ("https://www.a.leg.br/cal/2022/7?view=month",),  # trap
        ("https://www.b.leg.br/norma/9",),          # out_of_scope (deny)
        ("https://www.other.com/x",),               # out_of_scope (default)
    ]
    return stats, rules, links


def test_stream_admission_matches_batch_twin(spark, tmp_path):
    stats, rules, links = _world(spark)
    schema = "url string"
    batch = spark.createDataFrame(links, schema)
    expect = sorted(
        (r["url"], r["reason"], r["admitted"])
        for r in admission_batch_twin(
            batch, rules, stats, trap_threshold=3.0
        ).collect()
    )
    assert sorted(e[1] for e in expect) == sorted(
        ["admitted", "trap", "out_of_scope", "out_of_scope"]
    )

    src = tmp_path / "src"
    batch.coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(schema).json(str(src))
    out = stream_admission(stream, rules, stats, trap_threshold=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("admission_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["url"], r["reason"], r["admitted"])
        for r in spark.sql("SELECT * FROM admission_out").collect()
    )
    assert got == expect
