#!/usr/bin/env python
"""Generate the multimodal_features oracle fixture.

The driver's DuckDB oracle cannot express the md5-seeded RandomState
fake decode (operators/multimodal.py:56), so the expected rows are
precomputed here by an INDEPENDENT straight-line implementation — no
Spark, no code shared with the pipeline beyond the spec itself — and
committed as a parquet fixture the oracle SQL reads directly
(VERDICT r1, next-round item 9).

Spec being reproduced (kept in lockstep with __spark_entry__
q_multimodal_features + operators/multimodal.py):
- payload  = PNG magic (89504E470D0A1A0A) + utf-8 text bytes
- width    = 16 + len(payload) % 16 ; height = 16 + len(payload) % 8
- pixels   = RandomState(int.from_bytes(md5(payload)[:4],'big'))
             .randint(0,256,(h,w,3),uint8)
- feature  = per-channel mean / 255 as float32
- feat_mean = ROUND_HALF_UP(sum(double(feature))/3, 6)  (Spark round())

Usage: python scripts/gen_multimodal_fixture.py [sf_dir] [out_parquet]
"""

from __future__ import annotations

import hashlib
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pandas as pd

PNG_MAGIC = bytes.fromhex("89504E470D0A1A0A")


def expected_rows(sf_dir: str) -> pd.DataFrame:
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchdf()
    out = {
        "doc_id": [], "format": [], "media_type": [],
        "width": [], "height": [], "feat_mean": [],
    }
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        raw = PNG_MAGIC + str(text).encode("utf-8")
        w = 16 + len(raw) % 16
        h = 16 + len(raw) % 8
        seed = int.from_bytes(hashlib.md5(raw).digest()[:4], "big")
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        feature = (px.mean(axis=(0, 1)).astype(np.float32) / 255.0)
        mean = sum(float(x) for x in feature) / 3.0
        fm = float(
            Decimal(repr(mean)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        out["doc_id"].append(int(doc_id))
        out["format"].append("png")
        out["media_type"].append("image")
        out["width"].append(np.int32(w))
        out["height"].append(np.int32(h))
        out["feat_mean"].append(fm)
    df = pd.DataFrame(out)
    df["width"] = df["width"].astype("int32")
    df["height"] = df["height"].astype("int32")
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "fixtures/multimodal_features_sf0.01.parquet"
    )
    df = expected_rows(sf_dir)
    duckdb.sql("SELECT * FROM df").write_parquet(out)
    print(f"wrote {len(df)} rows to {out}")


if __name__ == "__main__":
    main()
