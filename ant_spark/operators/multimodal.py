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
- ``decoder="real"``: a pure-numpy UNCOMPRESSED image decoder — binary PPM
  (P6), PGM (P5) and 24-bit uncompressed BMP — so the "real" seam is
  executable without pillow: decode to grayscale in [0,1], then the same
  chunk-mean feature recipe. Compressed codecs (JPEG/PNG/audio/video)
  raise NotImplementedError naming the missing dependency
  (pillow/av/soundfile) — or yield empty features with
  ``on_unsupported="skip"``, the 100 TB-job-safe mode where one JPEG row
  must not kill the stage.

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


def synth_uncompressed_media(n: int = 6) -> pd.DataFrame:
    """Deterministic REAL image payloads (binary PPM/PGM/uncompressed BMP24
    in rotation) — the fixture behind the hash-checked ``media_features_real``
    oracle. Pure arithmetic function of media_id: pixel (y,x) of image i is
    ``(x*37 + y*11 + i*53) mod 256``, so every byte regenerates identically
    and the decoded features freeze as oracle literals (the ivf_trained
    freezing pattern). Columns: (media_id, kind=format name, payload)."""
    rows = []
    for i in range(n):
        w, h = 5 + (i % 3), 4 + (i % 2)
        y, x = np.mgrid[0:h, 0:w]
        px = ((x * 37 + y * 11 + i * 53) % 256).astype(np.uint8)
        kind = ("ppm", "pgm", "bmp")[i % 3]
        if kind == "ppm":
            rgb = np.stack(
                [px, (px.astype(np.int32) + 17) % 256, (px.astype(np.int32) + 89) % 256],
                axis=-1,
            ).astype(np.uint8)
            payload = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
        elif kind == "pgm":
            payload = b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()
        else:  # bottom-up 24-bit BI_RGB BMP, rows padded to 4 bytes
            row_bytes = (w * 3 + 3) & ~3
            data = bytearray()
            for yy in range(h - 1, -1, -1):
                row = bytearray()
                for xx in range(w):
                    v = int(px[yy, xx])
                    row += bytes((v, v, v))  # B, G, R (gray)
                row += b"\x00" * (row_bytes - len(row))
                data += row
            payload = (
                b"BM"
                + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
                + bytes(data)
            )
        rows.append({"media_id": i, "kind": kind, "payload": payload})
    return pd.DataFrame(rows)


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic 'features' from byte statistics (the stub kernel)."""
    if payload is None or len(payload) < 16 or payload[:4] != _MAGIC:
        return []
    body = np.frombuffer(payload[16:], dtype=np.uint8).astype(np.float32)
    if len(body) == 0:
        return [0.0] * dim
    chunks = np.array_split(body, dim)
    return [float(np.round(c.mean() / 255.0, 6)) if len(c) else 0.0 for c in chunks]


def _pnm_decode(payload: bytes) -> "np.ndarray | None":
    """Binary PPM (P6, RGB) / PGM (P5, gray) → float32 grayscale in [0,1].
    Returns None when the payload is not a parseable 8-bit PNM."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        return None
    toks: list[bytes] = []
    i, n = 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i : i + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        elif c == b"#":  # comment to end of line
            j = payload.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            j = i
            while j < n and payload[j : j + 1] not in (b" ", b"\t", b"\r", b"\n"):
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not 0 < maxval < 256:  # 16-bit PNM unsupported
        return None
    ch = 3 if magic == b"P6" else 1
    start = i + 1  # exactly one whitespace byte between maxval and raster
    need = w * h * ch
    if len(payload) < start + need:
        return None
    arr = np.frombuffer(payload, np.uint8, count=need, offset=start)
    gray = arr.reshape(h, w, ch).astype(np.float32).mean(axis=2)
    return gray / float(maxval)


def _bmp24_decode(payload: bytes) -> "np.ndarray | None":
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) → float32
    grayscale in [0,1]. Returns None for other depths/compressions."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr = struct.unpack_from("<I", payload, 14)[0]
    if hdr < 40:
        return None
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    if len(payload) < off + row_bytes * h:
        return None
    rows = np.frombuffer(
        payload, np.uint8, count=row_bytes * h, offset=off
    ).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3).astype(np.float32)
    if h_signed > 0:  # positive height = bottom-up row order
        img = img[::-1]
    return img.mean(axis=2) / 255.0


def _real_decode(payload: bytes, dim: int, on_unsupported: str = "error") -> list[float]:
    """The executable 'real' kernel: pure-numpy uncompressed decode
    (PPM/PGM/BMP), then the chunk-mean feature recipe over grayscale."""
    if payload is None or len(payload) < 2:
        return []
    gray = None
    if payload[:2] in (b"P5", b"P6"):
        gray = _pnm_decode(payload)
    elif payload[:2] == b"BM":
        gray = _bmp24_decode(payload)
    if gray is None:
        if on_unsupported == "skip":
            return []
        raise NotImplementedError(
            f"unsupported/compressed media payload (magic {payload[:4]!r}): "
            "the pure-numpy real decoder covers uncompressed PPM/PGM/BMP "
            "only; JPEG/PNG need pillow, audio needs soundfile, video needs "
            "av — none available in this container. Pass "
            "on_unsupported='skip' to yield empty features instead."
        )
    flat = gray.astype(np.float32).ravel()
    if flat.size == 0:
        return [0.0] * dim
    chunks = np.array_split(flat, dim)
    return [
        float(np.round(c.mean(), 6)) if len(c) else 0.0 for c in chunks
    ]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decoder: str = "fake",
    on_unsupported: str = "error",
) -> DataFrame:
    """Arrow-batched decode/feature stage over the payload binary column.

    Production shape: mapInPandas over batches; per-batch numpy work; output
    schema fixed (MEDIA_FEATURES). ``decoder="real"`` runs the pure-numpy
    uncompressed kernel (``_real_decode``: PPM/PGM/BMP); compressed codecs
    raise NotImplementedError (or skip to empty features with
    ``on_unsupported="skip"`` — at 100 TB one undecodable row must not kill
    the stage). A pillow/libav kernel drops into the same seam.
    """
    if decoder == "real":
        kernel = lambda p: _real_decode(p, dim, on_unsupported)  # noqa: E731
    elif decoder == "fake":
        kernel = lambda p: _fake_decode(p, dim)  # noqa: E731
    else:
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
                    "feature": b["payload"].map(kernel),
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
