#!/usr/bin/env python
"""Generate the bpe_encode oracle fixture: per-document token counts
under the 12-merge BPE model trained on the same corpus.

Shares the straight-line trainer with gen_bpe_fixture.py (both are
oracle-side, independent of the pipeline code); encoding applies the
merge list in rank order with the same greedy left-to-right fold,
then counts tokens across the document's whitespace words.

Usage: python scripts/gen_bpe_encode_fixture.py [sf_dir] [out_parquet]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gen_bpe_fixture import N_MERGES, train


def encode_word(word: str, pairs: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in pairs:
        res: list[str] = []
        for s in syms:
            if res and res[-1] == a and s == b:
                res[-1] = a + b
            else:
                res.append(s)
        syms = res
    return syms


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "fixtures/bpe_encode_sf0.01.parquet"
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    freqs: Counter = Counter()
    words_of: dict[int, list[str]] = {}
    for doc_id, t in docs:
        ws = [w for w in re.split(r"\s+", (t or "").strip()) if w]
        words_of[doc_id] = ws
        for w in ws:
            freqs[w] += 1
    merges = train(freqs, N_MERGES)
    pairs = [(m[1], m[2]) for m in merges]
    # encode each DISTINCT word once, then sum per doc
    tok_len = {w: len(encode_word(w, pairs)) for w in freqs}
    rows = [
        (doc_id, sum(tok_len[w] for w in ws))
        for doc_id, ws in words_of.items()
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "n_tokens"])
    table = pa.Table.from_pandas(
        df,
        schema=pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]),
        preserve_index=False,
    )
    pq.write_table(table, out)
    print(f"wrote {len(df)} rows -> {out}")


if __name__ == "__main__":
    main()
