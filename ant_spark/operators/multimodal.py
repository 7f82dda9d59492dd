"""Multimodal (image/audio/video) column plumbing.

At 100 TB scale, media travels as opaque ``binary`` columns with typed
metadata structs beside them; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` stages so bytes never cross the JVM↔Python
boundary row-at-a-time. The decode kernels themselves need codec libraries
that are NOT available in this container, so they are stubbed two ways:

- ``decoder="fake"`` (default): a deterministic fake decoder — parses the
  tiny header our synthetic generator writes and fabricates features from
  byte statistics. Everything around it (schema, batching, partitioning,
  UDF signatures) is the real production plumbing and IS tested.
- ``decoder="real"``: raises NotImplementedError with the dependency story
  (pillow/av/soundfile), marking exactly where the real kernel drops in.

Reference tie-in: ant has no media path; this extends the engine for the
training-data-pipeline requirements (multimodal columns, stubbed decode).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

_MAGIC = b"ASMK"  # ant_spark synthetic media header


def synth_media(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media rows: payload = magic + dims + pseudo-bytes."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h, d = int(8 + i % 32), int(8 + (i * 7) % 32), int(1000 + i % 5000)
        body = rng.integers(0, 256, size=64 + i % 192, dtype=np.uint8).tobytes()
        payload = _MAGIC + struct.pack("<III", w, h, d) + body
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind],
                "width": w if kind != "audio" else None,
                "height": h if kind != "audio" else None,
                "duration_ms": d if kind != "image" else None,
                "payload": payload,
            }
        )
    pdf = pd.DataFrame(rows)
    # keep nullable int columns object-typed (int | None): pandas would
    # otherwise coerce to float NaN, which Spark's non-Arrow conversion
    # path rejects for IntegerType (same pattern as webgraph.py pages).
    for c in ("width", "height", "duration_ms"):
        pdf[c] = pd.Series(
            [None if pd.isna(v) else int(v) for v in pdf[c]], dtype=object
        )
    return pdf


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic 'features' from byte statistics (the stub kernel)."""
    if payload is None or len(payload) < 16 or payload[:4] != _MAGIC:
        return []
    body = np.frombuffer(payload[16:], dtype=np.uint8).astype(np.float32)
    if len(body) == 0:
        return [0.0] * dim
    chunks = np.array_split(body, dim)
    return [float(np.round(c.mean() / 255.0, 6)) if len(c) else 0.0 for c in chunks]


def extract_features(
    media: DataFrame, dim: int = 8, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched decode/feature stage over the payload binary column.

    Production shape: mapInPandas over batches; per-batch numpy work; output
    schema fixed (MEDIA_FEATURES). Swap ``_fake_decode`` for a real pillow /
    libav kernel via decoder="real" when the codecs are installed.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decode needs pillow/av/soundfile — not available in "
            "this container; the Spark plumbing is identical, only the "
            "per-batch kernel changes (see _fake_decode)."
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": b["payload"].map(lambda p: _fake_decode(p, dim)),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, MEDIA_FEATURES
    )


def resize_images(
    media: DataFrame, out_w: int = 4, out_h: int = 4, decoder: str = "fake"
) -> DataFrame:
    """Image resize stage: mapInPandas over payload bytes → resized payload
    + updated dims. Production plumbing (schema, Arrow batching, per-batch
    numpy) is real; the pixel kernel is the same honest stub as
    extract_features — the fake decoder treats the body bytes as a row-major
    grid and block-averages it down to (out_h × out_w), re-wrapping the
    result in the synthetic header. decoder='real' marks where a pillow
    kernel drops in."""
    if decoder == "real":
        raise NotImplementedError(
            "real image resize needs pillow — not available in this "
            "container; only the per-batch kernel changes."
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def _resize_one(payload: bytes) -> bytes | None:
        if payload is None or len(payload) < 16 or payload[:4] != _MAGIC:
            return None
        w, h, d = struct.unpack("<III", payload[4:16])
        body = np.frombuffer(payload[16:], dtype=np.uint8)
        # fake grid: pad/trim body to w*h, block-average to out_h*out_w
        grid = np.resize(body.astype(np.float32), w * h).reshape(h, w)
        ys = np.array_split(np.arange(h), out_h)
        xs = np.array_split(np.arange(w), out_w)
        out = np.array(
            [[grid[np.ix_(y, x)].mean() if len(y) and len(x) else 0.0
              for x in xs] for y in ys],
            dtype=np.float32,
        )
        small = out.astype(np.uint8).tobytes()
        return _MAGIC + struct.pack("<III", out_w, out_h, d) + small

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            resized = b["payload"].map(_resize_one)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "mime": b["mime"],
                    "width": pd.Series(
                        [None if p is None else out_w for p in resized],
                        dtype=object,
                    ),
                    "height": pd.Series(
                        [None if p is None else out_h for p in resized],
                        dtype=object,
                    ),
                    "duration_ms": pd.Series(
                        [None if pd.isna(v) else int(v) for v in b["duration_ms"]],
                        dtype=object,
                    ),
                    "payload": resized,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, MEDIA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (native exprs —
    the decode of each frame is the stubbed kernel above). Demonstrates the
    explode-by-schedule pattern used for real frame extraction."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx", "_i"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )
