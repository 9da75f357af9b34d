"""HTTP response-message parser (sources/http.py) — adversarial byte
cases the latin-1 bijection must survive."""

import hashlib

from pyspark.sql import functions as F

from legislation_scraper_spark.sources.http import parse_http_response


def _parse_one(spark, payload: bytes):
    df = spark.createDataFrame([(payload,)], "payload binary")
    return parse_http_response(df).collect()[0]


def test_non_utf8_body_roundtrips_byte_exact(spark):
    body = bytes(range(256)) + b"\xff\xfe tail \x80"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n"
        b"\r\n" + body
    )
    r = _parse_one(spark, payload)
    assert r.http_status == 200 and r.http_reason == "OK"
    got = bytes(r.http_body)
    assert got == body
    assert hashlib.md5(got).hexdigest() == hashlib.md5(body).hexdigest()


def test_body_split_at_first_crlfcrlf_only(spark):
    body = b"part1\r\n\r\npart2"
    payload = b"HTTP/1.0 200 OK\r\nX: 1\r\n\r\n" + body
    r = _parse_one(spark, payload)
    assert bytes(r.http_body) == body


def test_headers_lowercased_keep_last_and_skip_malformed(spark):
    payload = (
        b"HTTP/1.1 301 Moved Permanently\r\n"
        b"Set-Cookie: a=1\r\n"
        b"garbage line without colon\r\n"
        b"SET-COOKIE: b=2\r\n"
        b"Location:  http://x/  \r\n"
        b"\r\n"
    )
    r = _parse_one(spark, payload)
    assert r.http_status == 301
    assert r.http_reason == "Moved Permanently"
    assert r.http_headers == {
        "set-cookie": "b=2",
        "location": "http://x/",
    }
    assert bytes(r.http_body) == b""


def test_malformed_inputs_yield_nulls(spark):
    # no CRLFCRLF: all head, no body
    r = _parse_one(spark, b"HTTP/1.1 204 No Content\r\nA: 1")
    assert r.http_status == 204 and r.http_body is None
    # not an HTTP message at all
    r = _parse_one(spark, b"<html>not http</html>")
    assert r.http_status is None and r.http_reason is None
    assert r.http_headers == {}
    # status line without reason phrase (strict ABNF wants the SP, but
    # real servers omit it — tolerate, like every mainstream client)
    r = _parse_one(spark, b"HTTP/1.1 200\r\n\r\nx")
    assert r.http_status == 200 and r.http_reason == ""


def test_passthrough_and_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(7, b"HTTP/1.1 200 OK\r\nA: 1\r\n\r\nbody")], "id int, payload binary"
    )
    out = parse_http_response(df)
    row = out.collect()[0]
    assert row.id == 7  # original columns pass through
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_charset_precedence_bom_header_meta_default(spark):
    from legislation_scraper_spark.sources.http import (
        decode_html,
        sniff_charset,
    )

    txt = "ação — nº 5º"
    rows = [
        # BOM beats header AND meta
        (b"\xff\xfe" + txt.encode("utf-16-le"),
         "text/html; charset=iso-8859-1", "utf-16le", "bom"),
        (b"\xef\xbb\xbf" + txt.encode("utf-8"), None, "utf-8", "bom"),
        # header beats meta
        (('<meta charset="utf-16le">' + txt).encode("utf-8"),
         'text/html; charset="UTF-8"', "utf-8", "header"),
        # meta, with alias normalization
        (("<meta http-equiv=Content-Type content=\"text/html; "
          "charset=utf8\">" + txt).encode("utf-8"), None, "utf-8", "meta"),
        # nothing → HTML5 default
        (txt.encode("utf-8"), None, "utf-8", "default"),
    ]
    df = spark.createDataFrame(
        [(b, ct) for b, ct, _, _ in rows], "body binary, ct string"
    )
    cs, src = sniff_charset(F.col("body"), F.col("ct"))
    got = df.select(
        cs.alias("cs"), src.alias("src"),
        decode_html(F.col("body"), cs).alias("txt"),
    ).collect()
    for r, (_, _, want_cs, want_src) in zip(got, rows):
        assert (r.cs, r.src) == (want_cs, want_src)
    # every branch decodes back to the original text, BOM stripped,
    # except the meta/header rows whose content includes their tag
    assert got[0].txt == txt and got[1].txt == txt and got[4].txt == txt
    assert got[2].txt.endswith(txt) and got[3].txt.endswith(txt)


def test_charset_unknown_label_falls_back_to_utf8(spark):
    from legislation_scraper_spark.sources.http import sniff_charset

    df = spark.createDataFrame(
        [(b"x", "text/html; charset=ks_c_5601-1987")], "body binary, ct string"
    )
    cs, src = sniff_charset(F.col("body"), F.col("ct"))
    r = df.select(cs.alias("cs"), src.alias("src")).collect()[0]
    assert r.cs == "utf-8" and r.src == "header"
