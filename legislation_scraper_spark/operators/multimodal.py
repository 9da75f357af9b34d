"""Multimodal columns: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries non-text payloads through the
same tables as text.  The representation here:

- payload: ``binary`` column (bytes of the original asset)
- typed metadata struct: ``media_type`` (image/audio/video), ``format``
  (png/jpeg/wav/mp4/…), plus per-type fields (width/height,
  sample_rate/duration, fps/n_frames)

Processing stages (decode → feature-extract / resize / frame-sample)
run as ``mapInPandas`` over Arrow batches — the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested; the actual
codec work is STUBBED (``decode_stub=True`` produces deterministic fake
pixels/samples from the byte content; ``decode_stub=False`` raises
``NotImplementedError``) because no image/audio libraries ship in this
container.  Swapping the stub for PIL/ffmpeg changes only the innermost
function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, format string, width int, height int, "
    "sample_rate int, duration_s double, fps double, n_frames int"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff magic bytes → typed metadata struct (JVM-side, no decode).

    Covers the formats a mixed crawl actually lands: images
    (png/jpeg/gif/webp), audio (wav/ogg/mp3), video (mp4/avi),
    documents (pdf/html/json) and archives (gzip/zip — the WARC and
    sitemap.xml.gz path).  RIFF containers disambiguate on bytes 9–12
    (WEBP/AVI /else wav); a server's Content-Type header is NOT
    trusted at web scale (mislabeled payloads are routine), the bytes
    are.  Everything is a hex-prefix CASE over ``substring`` — pure
    codegen, zero shuffle, NULL-safe (NULL payload → unknown)."""
    head = F.hex(F.substring(F.col(payload_col), 1, 8))
    riff_tag = F.hex(F.substring(F.col(payload_col), 9, 4))
    fmt = (
        F.when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("FFD8"), F.lit("jpeg"))
        .when(head.startswith("47494638"), F.lit("gif"))
        .when(head.startswith("25504446"), F.lit("pdf"))
        .when(head.startswith("1F8B"), F.lit("gzip"))
        .when(head.startswith("504B0304"), F.lit("zip"))
        .when(
            head.startswith("52494646"),
            F.when(riff_tag == "57454250", F.lit("webp"))
            .when(riff_tag == "41564920", F.lit("avi"))
            .otherwise(F.lit("wav")),
        )
        .when(head.startswith("4F676753"), F.lit("ogg"))
        .when(head.startswith("494433"), F.lit("mp3"))
        .when(head.startswith("00000018"), F.lit("mp4"))
        # ftyp box at offset 4 (size-prefixed mp4 variants)
        .when(F.hex(F.substring(F.col(payload_col), 5, 4)) == "66747970",
              F.lit("mp4"))
        .when(
            head.startswith("3C21") | head.startswith("3C68")
            | head.startswith("3C48"),
            F.lit("html"),
        )
        .when(head.startswith("7B"), F.lit("json"))
        .otherwise(F.lit("unknown"))
    )
    mtype = (
        F.when(fmt.isin("png", "jpeg", "gif", "webp"), F.lit("image"))
        .when(fmt.isin("wav", "ogg", "mp3"), F.lit("audio"))
        .when(fmt.isin("mp4", "avi"), F.lit("video"))
        .when(fmt.isin("pdf", "html", "json"), F.lit("document"))
        .when(fmt.isin("gzip", "zip"), F.lit("archive"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn("format", fmt).withColumn("media_type", mtype)


def _fake_pixels(data: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: pixels derived from content md5."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    thumb: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode → resize(thumb×thumb) → mean-channel feature vector.

    mapInPandas over Arrow batches; output schema
    (id, width, height, thumb binary, feature array<float>).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, thumbs, feats = [], [], [], [], []
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                if data is None:
                    continue
                if not decode_stub:
                    raise NotImplementedError(
                        "real image decode requires PIL/libvips — not in "
                        "this container; set decode_stub=True"
                    )
                raw = bytes(data)
                # fake decode at a deterministic "native" size
                w = 16 + (len(raw) % 16)
                h = 16 + (len(raw) % 8)
                px = _fake_pixels(raw, w, h)
                # resize = block mean to thumb×thumb (plumbing-real)
                ys = np.linspace(0, h, thumb + 1, dtype=int)
                xs = np.linspace(0, w, thumb + 1, dtype=int)
                tb = np.zeros((thumb, thumb, 3), dtype=np.uint8)
                for yi in range(thumb):
                    for xi in range(thumb):
                        block = px[ys[yi]:ys[yi + 1], xs[xi]:xs[xi + 1]]
                        tb[yi, xi] = block.mean(axis=(0, 1))
                ids.append(int(i))
                ws.append(w)
                hs.append(h)
                thumbs.append(tb.tobytes())
                feats.append(
                    (px.mean(axis=(0, 1)).astype(np.float32) / 255.0).tolist()
                )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    # object dtype: an empty batch must not default to
                    # float64 (Arrow can't convert that to binary/list)
                    "thumb": pd.Series(thumbs, dtype="object"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    schema = (
        f"{id_col} long, width int, height int, thumb binary, "
        "feature array<float>"
    )
    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    n_frames: int = 100,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame
    (id, frame_no, frame binary).  Stubbed decode, real explode shape.
    """
    if not decode_stub:
        raise NotImplementedError("real video decode requires ffmpeg")
    frames = F.sequence(F.lit(0), F.lit(n_frames - 1), F.lit(every_n))
    fake_frame = F.md5(
        F.concat(
            F.hex(F.substring(F.col(payload_col), 1, 8)),
            F.col("frame_no").cast("string"),
        )
    )
    return (
        df.select(id_col, payload_col, F.explode(frames).alias("frame_no"))
        .withColumn("frame", F.encode(fake_frame, "utf-8"))
        .select(id_col, "frame_no", "frame")
    )
