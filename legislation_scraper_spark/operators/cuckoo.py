"""Partitioned cuckoo filter — the deletable alternative to the Bloom
shards in operators/seen.py (north star: "partitioned bloom/cuckoo-filter
URL-seen set").

Per shard: ``m`` buckets × ``SLOTS`` slots of 16-bit fingerprints
(uint16, 0 = empty).  Standard partial-key cuckoo hashing
(Fan et al., CoNEXT'14):

- fingerprint fp(x) = 16 bits of the key hash, never 0;
- candidate buckets i1 = h(x) mod m and i2 = i1 XOR h'(fp) mod m —
  computable from (i, fp) alone, which is what makes relocation and
  DELETION possible (a Bloom bitmap can do neither);
- insert: free slot in i1/i2, else evict a random-ish victim and kick it
  to its alternate bucket (bounded kicks).

Same two-tier contract as the Bloom path: a probe MISS proves the key
was never inserted (no false negatives while occupancy stays below
capacity — construction fails loudly otherwise); HITS are verified by
the exact anti-join.  Used through ``SeenSet(filter_kind="cuckoo")``.

Scale: a shard of n keys needs ~(n / (SLOTS·0.95)) buckets → 2 bytes ×
SLOTS per bucket ≈ 2.2 bytes/key vs Bloom's ~1.2 bytes/key at 1% FPP —
the price of deletability; FPP ≈ 2·SLOTS/2^16 ≈ 0.012%.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS = 4
_FP_MUL = np.uint64(0xFF51AFD7ED558CCD)
_ALT_MUL = np.uint64(0x9E3779B97F4A7C15)
_B1_MUL = np.uint64(0xD6E8FEB86659FD93)
MAX_KICKS = 500


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit fingerprints, never 0 (0 marks an empty slot)."""
    fp = ((hashes * _FP_MUL) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _bucket1(hashes: np.ndarray, m: int) -> np.ndarray:
    """Remix before masking: shard assignment is pmod(url_hash, n_shards),
    so within a shard every key shares its low lg(n_shards) bits — a bare
    ``h & (m-1)`` would reach only m/n_shards buckets, overloading them
    and failing construction.  Multiply-shift spreads the surviving
    entropy into the masked bits."""
    mixed = (hashes * _B1_MUL) >> np.uint64(32)
    return (mixed & np.uint64(m - 1)).astype(np.int64)


def _alt_bucket(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """i2 = i1 XOR h'(fp), masked to m buckets.  m MUST be a power of
    two: only then is the mapping an involution (alt(alt(i)) == i), the
    property that lets eviction relocate a fingerprint using (i, fp)
    alone and still be found by the probe's two candidate buckets."""
    h = (fp.astype(np.uint64) * _ALT_MUL) >> np.uint64(48)
    return ((i.astype(np.uint64) ^ h) & np.uint64(m - 1)).astype(np.int64)


def n_buckets_for(n_keys: int, load: float = 0.84) -> int:
    """Bucket count for target occupancy (0.84 is safe for SLOTS=4),
    rounded UP to a power of two (required by the XOR alternate)."""
    need = max(8, int(np.ceil(n_keys / (SLOTS * load))))
    return 1 << int(np.ceil(np.log2(need)))


def _insert_fp(
    table: np.ndarray, i1: int, fp: int, m: int, rng_state: int
) -> tuple[bool, int]:
    """Insert one fingerprint given ONE of its two candidate buckets
    (alt() is an involution, so (i1, fp) fully determines the pair).
    Returns (placed, rng_state)."""
    i2 = int(_alt_bucket(np.array([i1]), np.array([fp]), m)[0])
    for b in (int(i1), i2):
        empt = np.nonzero(table[b] == 0)[0]
        if len(empt):
            table[b, empt[0]] = fp
            return True, rng_state
    cur_fp, cur_b = int(fp), int(i1)
    for kick in range(MAX_KICKS):
        rng_state = (rng_state * int(_FP_MUL) + kick) & 0xFFFFFFFFFFFFFFFF
        slot = rng_state % SLOTS
        cur_fp, table[cur_b, slot] = int(table[cur_b, slot]), cur_fp
        cur_b = int(
            _alt_bucket(
                np.array([cur_b]), np.array([cur_fp], dtype=np.uint16), m
            )[0]
        )
        empt = np.nonzero(table[cur_b] == 0)[0]
        if len(empt):
            table[cur_b, empt[0]] = cur_fp
            return True, rng_state
    return False, rng_state


def build_table(hashes: np.ndarray, m: int) -> bytes:
    """Construct the (m × SLOTS) uint16 table; raises if insertion fails
    (over capacity) — callers size ``m`` with n_buckets_for()."""
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    fps = _fingerprints(hashes)
    i1s = _bucket1(hashes, m)
    rng_state = 0x243F6A8885A308D3  # python int: no uint64 overflow warnings
    for fp, i1 in zip(fps, i1s):
        placed, rng_state = _insert_fp(table, int(i1), int(fp), m, rng_state)
        if not placed:
            raise RuntimeError(
                f"cuckoo filter over capacity (m={m}, keys={len(hashes)})"
            )
    return table.tobytes()


def build_table_fixed(hashes: np.ndarray, m: int) -> bytes | None:
    """Fixed-geometry build for the INCREMENTAL delta log: same as
    build_table but returns None instead of raising when the batch does
    not fit (the caller records a saturated shard, which the probe
    treats as all-maybe-seen — correctness falls back to the exact
    anti-join, never to a false negative)."""
    try:
        return build_table(hashes, m)
    except RuntimeError:
        return None


def merge_tables(blobs: list[bytes | None], m: int) -> bytes | None:
    """Fold delta tables of IDENTICAL geometry into one by re-inserting
    every occupied slot of the later tables into the first.

    Works because i2 = i1 XOR h'(fp) is an involution: an occupied slot
    (b, fp) yields the key's exact candidate pair {b, alt(b, fp)}
    without knowing the key, so the merged table preserves the
    no-false-negative contract.  Returns None when any input is None
    (saturated delta) or capacity is exceeded — the probe then treats
    the shard as all-maybe-seen and the exact anti-join decides.
    """
    if not blobs or any(b is None for b in blobs):
        return None
    acc = np.frombuffer(blobs[0], dtype=np.uint16).reshape(m, SLOTS).copy()
    rng_state = 0x452821E638D01377
    for blob in blobs[1:]:
        t = np.frombuffer(blob, dtype=np.uint16).reshape(m, SLOTS)
        bs, ss = np.nonzero(t)
        for b, s in zip(bs, ss):
            placed, rng_state = _insert_fp(
                acc, int(b), int(t[b, s]), m, rng_state
            )
            if not placed:
                return None
    return acc.tobytes()


def probe_table(blob: bytes, hashes: np.ndarray, m: int) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False = proven
    absent (no false negatives)."""
    table = np.frombuffer(blob, dtype=np.uint16).reshape(m, SLOTS)
    fps = _fingerprints(hashes)
    i1 = _bucket1(hashes, m)
    i2 = _alt_bucket(i1, fps, m).astype(np.int64)
    hit1 = (table[i1] == fps[:, None]).any(axis=1)
    hit2 = (table[i2] == fps[:, None]).any(axis=1)
    return hit1 | hit2


def delete_from_table(blob: bytes, hashes: np.ndarray, m: int) -> bytes:
    """Remove one fingerprint occurrence per key (the operation a Bloom
    bitmap cannot do; correct only for previously-inserted keys)."""
    table = np.frombuffer(blob, dtype=np.uint16).reshape(m, SLOTS).copy()
    fps = _fingerprints(hashes)
    i1s = _bucket1(hashes, m)
    i2s = _alt_bucket(i1s, fps, m).astype(np.int64)
    for fp, i1, i2 in zip(fps, i1s, i2s):
        done = False
        for b in (int(i1), int(i2)):
            slots = np.nonzero(table[b] == fp)[0]
            if len(slots):
                table[b, slots[0]] = 0
                done = True
                break
        # absent fp: no-op (caller guarantees prior insertion)
        _ = done
    return table.tobytes()


def build_cuckoo_shards(
    seen: DataFrame, n_shards: int = 64, load: float = 0.84
) -> DataFrame:
    """(shard, table, m, n_keys) — one cuckoo table per shard, built
    executor-side in applyInPandas (mirrors seen.build_bloom_shards)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy().astype(np.int64).view(np.uint64)
        h = np.unique(h)
        m = n_buckets_for(len(h), load)
        # tiny tables cycle easily (few distinct (i1,i2) pairs): retry
        # with doubled m — the standard cuckoo construction fallback
        for _ in range(4):
            try:
                blob = build_table(h, m)
                break
            except RuntimeError:
                m *= 2
        else:
            blob = build_table(h, m)  # raise loudly if still failing
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [blob],
                "m": [m],
                "n_keys": [len(h)],
            }
        )

    return (
        seen.select("shard", "url_hash")
        .groupBy("shard")
        .applyInPandas(
            build, schema="shard int, table binary, m long, n_keys long"
        )
    )


def build_cuckoo_delta_shards(seen: DataFrame, m: int) -> DataFrame:
    """(shard, table, m, n_keys) delta rows at FIXED geometry ``m`` for
    the incremental filter log (merge_tables folds them).  A batch that
    exceeds the fixed capacity yields table=NULL with its n_keys — a
    saturated marker the probe treats as all-maybe-seen."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy().astype(np.int64).view(np.uint64)
        h = np.unique(h)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [build_table_fixed(h, m)],
                "m": [m],
                "n_keys": [len(h)],
            }
        )

    return (
        seen.select("shard", "url_hash")
        .groupBy("shard")
        .applyInPandas(
            build, schema="shard int, table binary, m long, n_keys long"
        )
    )


def merge_cuckoo_shards(log: DataFrame) -> DataFrame:
    """Fold the delta log to one row per shard via merge_tables (the
    incremental analogue of the Bloom OR-merge)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m = int(pdf["m"].iloc[0])
        blobs = [
            None if b is None else bytes(b) for b in pdf["table"]
        ]
        merged = merge_tables(blobs, m)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [merged],
                "m": [m],
                "n_keys": [int(pdf["n_keys"].sum())],
            }
        )

    return log.groupBy("shard").applyInPandas(
        merge, schema="shard int, table binary, m long, n_keys long"
    )


def cuckoo_probe(candidates: DataFrame, shards: DataFrame) -> DataFrame:
    """Adds ``maybe_seen``: False ⇒ provably unseen (per-shard tables
    broadcast, numpy probe in mapInPandas — mirrors seen.bloom_probe)."""
    joined = candidates.join(F.broadcast(shards), "shard", "left")

    def probe(batches):
        for pdf in batches:
            out = pdf.drop(columns=["table", "m", "n_keys"])
            maybe = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                h = pdf["url_hash"].to_numpy().astype(np.int64).view(np.uint64)
                for _, idx in pdf.groupby("shard").indices.items():
                    blob = pdf["table"].iloc[idx[0]]
                    if blob is None:
                        nk = pdf["n_keys"].iloc[idx[0]]
                        if nk is not None and not pd.isna(nk) and nk > 0:
                            # saturated shard (incremental log overflow):
                            # no filter evidence — everything goes to the
                            # exact anti-join backstop
                            maybe[idx] = True
                        # else: shard has no seen keys → provably unseen
                        continue
                    m = int(pdf["m"].iloc[idx[0]])
                    maybe[idx] = probe_table(bytes(blob), h[idx], m)
            out["maybe_seen"] = maybe
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.schema.fields
        if f.name not in ("table", "m", "n_keys")
    ) + ", maybe_seen boolean"
    return joined.mapInPandas(probe, schema=schema)
