#!/usr/bin/env python
"""Generate the bpe_merges oracle fixture.

BPE training is an iterative argmax-then-rewrite loop, which DuckDB
SQL cannot express directly, so the expected merge table is
precomputed here by an INDEPENDENT straight-line implementation — no
Spark, no code shared with operators/tokenize.py beyond the spec —
and committed as a parquet fixture the oracle SQL reads directly
(the multimodal/token_bucket fixture pattern).

Spec being reproduced (kept in lockstep with
operators/tokenize.bpe_train + __spark_entry__ q_bpe_merges):
- pre-tokenize: whitespace split (\\s+), empties dropped; train on
  distinct words weighted by corpus frequency
- initial symbols = the word's characters; no end-of-word marker
- each round: count adjacent symbol pairs (freq-weighted, with
  multiplicity inside a word), pick max count with ties broken
  lexicographically on (left, right), merge greedily left-to-right
- n_merges = 12 (the registry query's setting); stop early when no
  pair remains
- output rows: (rank INT 1-based, left, right, merged, freq BIGINT =
  the pair count at selection time)

Usage: python scripts/gen_bpe_fixture.py [sf_dir] [out_parquet]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

N_MERGES = 12


def train(word_freqs: dict[str, int], n_merges: int) -> list[tuple]:
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    out = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # max count, ties lexicographic on (left, right)
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, left, right, left + right, freq))
        merged = left + right
        nxt = {}
        for syms, f in vocab.items():
            res = []
            for s in syms:
                if res and res[-1] == left and s == right:
                    res[-1] = merged
                else:
                    res.append(s)
            key = tuple(res)
            nxt[key] = nxt.get(key, 0) + f
        vocab = nxt
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "fixtures/bpe_merges_sf0.01.parquet"
    )
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    freqs: Counter = Counter()
    for (t,) in texts:
        for w in re.split(r"\s+", (t or "").strip()):
            if w:
                freqs[w] += 1
    rows = train(freqs, N_MERGES)
    df = pd.DataFrame(
        rows, columns=["merge_rank", "lhs", "rhs", "merged", "freq"]
    )
    table = pa.Table.from_pandas(
        df,
        schema=pa.schema(
            [
                ("merge_rank", pa.int32()),
                ("lhs", pa.string()),
                ("rhs", pa.string()),
                ("merged", pa.string()),
                ("freq", pa.int64()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(table, out)
    print(f"wrote {len(df)} merges -> {out}")


if __name__ == "__main__":
    main()
