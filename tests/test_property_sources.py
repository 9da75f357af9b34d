"""Property tests for the pure parser kernels (no Spark session —
these run per-example, so they stay on the Python side)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from legislation_scraper_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_stream,
)

payloads = st.lists(
    st.binary(min_size=0, max_size=200), min_size=0, max_size=8
)


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_warc_roundtrip_any_binary_payload(ps):
    """Arbitrary binary payloads — including ones containing CRLFs,
    'WARC/1.0', or full fake record headers — survive framing exactly."""
    recs = [("response", f"http://h/{i}", p) for i, p in enumerate(ps)]
    parsed = list(parse_warc_stream(build_warc_bytes(recs)))
    assert [r["payload"] for r in parsed] == ps
    assert [r["headers"]["warc-target-uri"] for r in parsed] == [
        f"http://h/{i}" for i in range(len(ps))
    ]


@settings(max_examples=100, deadline=None)
@given(payloads, st.binary(min_size=0, max_size=40))
def test_warc_truncated_tail_never_crashes(ps, garbage):
    """A truncated/garbage tail after valid records yields exactly the
    valid prefix (Common Crawl truncation tolerance), never an
    exception or a phantom record."""
    recs = [("response", f"http://h/{i}", p) for i, p in enumerate(ps)]
    data = build_warc_bytes(recs) + garbage
    parsed = list(parse_warc_stream(data))
    # parsing may extend into the garbage ONLY if the garbage itself
    # begins a well-formed record; it must never lose a valid one
    assert len(parsed) >= len(ps)
    assert [r["payload"] for r in parsed[: len(ps)]] == ps
