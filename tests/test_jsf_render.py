"""S6 JSF partial-AJAX parsing and S7/C3 rendered-fetch driver
lifecycle."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from legislation_scraper_spark.operators.jsf import (
    faces_post_body,
    parse_result_rows,
    partial_update,
)
from legislation_scraper_spark.operators.render import rendered_fetch

ROW = (
    '<tr class="ui-widget-content odd">'
    '<label class="ui-outputlabel ui-widget">LEI 42</label>'
    '<label class="ui-outputlabel ui-widget ementa">Disp&otilde;e x</label>'
    '<label class="ui-outputlabel ui-widget">PL 7/2020</label>'
    '<label class="ui-outputlabel ui-widget">01/02/2021</label>'
    '<a href="http://h/pdf/42">pdf</a></tr>'
)
ENVELOPE = (
    "<?xml version='1.0' encoding='UTF-8'?><partial-response><changes>"
    f'<update id="table_resultados"><![CDATA[{ROW}{ROW}]]></update>'
    '<update id="javax.faces.ViewState"><![CDATA[-9:17]]></update>'
    "</changes></partial-response>"
)


def test_faces_post_body(spark):
    df = spark.createDataFrame([(5, 2021, 3, "-9:17")],
                               "tid int, year int, page int, vs string")
    body = df.select(
        faces_post_body(F.col("tid"), F.col("year"), F.col("page"),
                        F.col("vs")).alias("b")
    ).collect()[0]["b"]
    assert body == (
        "javax.faces.partial.ajax=true&javax.faces.source=table_resultados"
        "&javax.faces.partial.execute=table_resultados"
        "&javax.faces.partial.render=table_resultados"
        "&javax.faces.behavior.event=page&javax.faces.partial.event=page"
        "&in_tipo_doc_input=5&j_idt53=&in_ano_doc=2021"
        "&table_resultados_first=60"
        "&javax.faces.ViewState=-9:17&javax.faces.ClientWindow=1381"
    )


def test_partial_update_and_rows(spark):
    df = spark.createDataFrame([(ENVELOPE,), ("<partial-response/>",)],
                               "xml string")
    out = df.select(
        partial_update(F.col("xml")).alias("html"),
        partial_update(F.col("xml"), "javax.faces.ViewState").alias("vs"),
    ).collect()
    assert out[0]["html"] == ROW + ROW
    assert out[0]["vs"] == "-9:17"
    assert out[1]["html"] == "" and out[1]["vs"] == ""

    rows = df.limit(1).select(
        F.explode(
            parse_result_rows(partial_update(F.col("xml")))
        ).alias("r")
    ).select("r.*").collect()
    assert len(rows) == 2
    # straight-line expectation from the reference's label indexing
    for r in rows:
        assert (r["title"], r["project"], r["publication"], r["summary"],
                r["pdf_link"]) == (
            "LEI 42", "PL 7/2020", "01/02/2021", "Disp&otilde;e x",
            "http://h/pdf/42",
        )


def test_rendered_fetch_one_driver_per_task(spark, tmp_path):
    marker = tmp_path / "factory_calls"

    class CountingDriver:
        def __init__(self):
            with open(marker, "a") as f:
                f.write("x\n")

        def render(self, url, body):
            return f"{url}|{(body or b'').decode()}|R"

        def close(self):
            pass

    df = spark.createDataFrame(
        [(f"u{i}", f"b{i}".encode()) for i in range(40)],
        "url string, body binary",
    ).repartition(4)
    out = rendered_fetch(df, driver_factory=CountingDriver)
    rows = {r["url"]: r["rendered"] for r in out.collect()}
    assert rows["u7"] == "u7|b7|R"
    assert len(rows) == 40
    n_calls = len(marker.read_text().splitlines())
    assert n_calls == 4  # exactly one driver per task, reused across rows


def test_stub_driver_marker(spark):
    df = spark.createDataFrame([("u", b"<html>x</html>")],
                               "url string, body binary")
    r = rendered_fetch(df).collect()[0]["rendered"]
    assert re.fullmatch(r"<html>x</html><!-- rendered:[0-9a-f]{8} -->", r)
