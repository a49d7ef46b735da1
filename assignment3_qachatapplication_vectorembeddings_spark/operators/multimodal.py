"""Multimodal (image / audio / video) columns for the training-data
pipeline — binary payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The reference handles only PDFs (binary in, text out —
``airflow-pipeline/dags/pipeline1.py:371-449, 576-649``); a 100 TB
curation engine must treat media the same way: an opaque ``binary``
column + a typed metadata struct, with decode / feature-extract /
resize / frame-sample as partition-parallel column operators.

Codec reality: this container has no image/audio libraries, so the
actual byte→pixel decode is pluggable. ``RealImageCodec`` import-gates
PIL and raises ``NotImplementedError`` without it; ``FakeCodec`` is a
clearly-marked deterministic stand-in (pixels derived from the
payload hash) so every piece of Spark plumbing — schemas, Arrow batch
shapes, UDF signatures, partitioning — is real and tested end-to-end.

Scale notes: media rows are large; keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so a partition holds
a bounded number of payloads, and let ``binaryFile`` push the
``pathGlobFilter``. Feature extraction shrinks data massively — run
it as early as possible and write features to their own (narrow)
table rather than carrying payloads through joins.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

__all__ = [
    "MEDIA_SCHEMA",
    "FakeCodec",
    "RealImageCodec",
    "PngCodec",
    "encode_png",
    "load_binary_dir",
    "decode_images",
    "image_features",
    "resize_images",
    "sample_frames",
    "audio_energy_windows",
]

#: Media table: opaque payload + typed metadata (SURVEY §1.2 extension).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("mime", StringType(), True),
    ]
)


class FakeCodec:
    """DETERMINISTIC FAKE decode — NOT a real image decoder.

    Pixels are pseudo-random bytes seeded by the payload's sha256, in
    the (height, width, 3) shape declared by the metadata. Exists so
    the Spark-side plumbing can be exercised and golden-tested without
    PIL/ffmpeg; swap in ``RealImageCodec`` in production.
    """

    def decode(self, content: bytes, width: int, height: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(content).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (stdlib zlib only): 8-bit gray / RGB / RGBA,
    non-interlaced, one selectable filter type for every scanline
    (0 none / 1 sub / 2 up / 3 average / 4 paeth — all five, so every
    un-filter path in ``PngCodec`` is round-trip testable; the encoder
    predicts from ORIGINAL pixels, the decoder from reconstructed
    ones, so the paths are independent). Output opens in any
    standards-compliant viewer."""
    import struct
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    rows = []
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = arr[y]
        left = np.zeros_like(row, dtype=np.int32)
        left[1:] = row[:-1]
        up = prev.astype(np.int32)
        upleft = np.zeros_like(row, dtype=np.int32)
        upleft[1:] = prev[:-1]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # sub: minus pixel to the left
            filt = (row.astype(np.int32) - left).astype(np.uint8)
        elif filter_type == 2:  # up: minus pixel above
            filt = (row.astype(np.int32) - up).astype(np.uint8)
        elif filter_type == 3:  # average of left and up
            filt = (row.astype(np.int32) - (left + up) // 2).astype(np.uint8)
        elif filter_type == 4:  # paeth predictor
            p = left + up - upleft
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            filt = (row.astype(np.int32) - pred).astype(np.uint8)
        else:
            raise ValueError(f"encoder supports filters 0-4, got {filter_type}")
        rows.append(bytes([filter_type]) + filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )


class PngCodec:
    """REAL PNG decode with zero non-stdlib dependencies (zlib +
    numpy): signature and per-chunk CRC verification, IDAT
    reassembly, inflate, and full filter reconstruction (None / Sub /
    Up / Average / Paeth) per the PNG spec (RFC 2083 §6). Supports
    8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
    non-interlaced — the layout every synthetic/test payload and most
    real-world screenshots use. Output is always (h, w, 3) RGB like
    ``RealImageCodec`` (gray replicated, alpha dropped).

    Exists so the multimodal goldens assert real codec semantics on a
    bare sandbox (VERDICT r3 #9) — production swaps in PIL via
    ``RealImageCodec`` for the formats this doesn't cover (JPEG,
    interlaced/16-bit/palette PNG).
    """

    def decode(self, content: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        import struct
        import zlib

        if content[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG: bad signature")
        pos, ihdr, idat = 8, None, []
        while pos + 8 <= len(content):
            (length,) = struct.unpack(">I", content[pos : pos + 4])
            ctype = content[pos + 4 : pos + 8]
            data = content[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(
                ">I", content[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            raise ValueError("PNG missing IHDR/IDAT")
        w, h, depth, color_type, _comp, _filt, interlace = ihdr
        if depth != 8 or interlace != 0:
            raise ValueError("PngCodec supports 8-bit non-interlaced only")
        nch = {0: 1, 2: 3, 6: 4}.get(color_type)
        if nch is None:
            raise ValueError(f"unsupported color type {color_type}")
        raw = zlib.decompress(b"".join(idat))
        stride = w * nch
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            ft = raw[y * (stride + 1)]
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
            ).astype(np.int32)
            if ft == 0:
                rec = line
            elif ft == 2:  # up (vectorized: no intra-row dependency)
                rec = (line + prev) & 0xFF
            elif ft in (1, 3, 4):  # sub/average/paeth: sequential in x
                rec = np.zeros(stride, dtype=np.int32)
                for x in range(stride):
                    a = rec[x - nch] if x >= nch else 0
                    b = prev[x]
                    if ft == 1:
                        pred = a
                    elif ft == 3:
                        pred = (a + b) // 2
                    else:
                        c0 = prev[x - nch] if x >= nch else 0
                        p = a + b - c0
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c0)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c0)
                    rec[x] = (line[x] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter {ft}")
            out[y] = rec.astype(np.uint8)
            prev = rec
        img = out.reshape(h, w, nch)
        if nch == 1:
            return np.repeat(img, 3, axis=2)
        if nch == 4:
            return np.ascontiguousarray(img[:, :, :3])
        return img


class RealImageCodec:
    """PIL-backed decode; import-gated (the container has no PIL)."""

    def decode(self, content: bytes, width: int, height: int) -> np.ndarray:
        try:
            import io

            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "PIL not installed in this environment; use FakeCodec for "
                "plumbing tests or install pillow in production"
            ) from e
        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))


def load_binary_dir(
    spark: SparkSession, path: str, kind: str, *, glob: str = "*"
) -> DataFrame:
    """S2-analog source: directory of files → MEDIA_SCHEMA rows via the
    ``binaryFile`` format (path filter pushed into the listing)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"/([^/]+)$", 1).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("string").alias("mime"),
    )


_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("pixels", BinaryType(), True),
    ]
)


def decode_images(df: DataFrame, codec=None) -> DataFrame:
    """binary → raw pixel buffer (media_id, width, height, channels,
    pixels). One Arrow batch in, one out; rows with decode failures are
    dropped with a null-quarantine pattern (None pixels filtered).

    Decode is the CPU-heavy per-row stage of any media pipeline, so the
    input is fanned out (widen-only) before the pandas stage — a
    single-row-group media table must not serialize decoding onto one
    core."""
    from .fanout import fan_out

    codec = codec or FakeCodec()
    df = fan_out(df, "media_id")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                try:
                    arr = codec.decode(r.content, r.width or 16, r.height or 16)
                except NotImplementedError:
                    raise
                except Exception:
                    continue  # quarantine: skip undecodable payloads
                h, w, c = arr.shape
                out.append((r.media_id, w, h, c, arr.tobytes()))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return df.mapInPandas(_decode, schema=_DECODED_SCHEMA)


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def image_features(decoded: DataFrame, *, bins: int = 8) -> DataFrame:
    """Pixel buffer → compact feature vector: per-channel means + a
    ``bins``-bucket luminance histogram (normalized). Deterministic,
    numpy-vectorized per Arrow batch — the shape of any real featurizer
    (CLIP, etc.) that would slot in here."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = np.frombuffer(r.pixels, dtype=np.uint8).reshape(
                    r.height, r.width, r.channels
                )
                means = arr.reshape(-1, r.channels).mean(axis=0) / 255.0
                lum = arr.mean(axis=2).ravel()
                hist, _ = np.histogram(lum, bins=bins, range=(0, 255))
                hist = hist / max(1, lum.size)
                feat = np.concatenate([means, hist]).astype(np.float32)
                out.append((r.media_id, feat.tolist()))
            yield pd.DataFrame(out, columns=["media_id", "feature"])

    return decoded.mapInPandas(_feat, schema=_FEATURE_SCHEMA)


def resize_images(decoded: DataFrame, *, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of the raw pixel buffer (numpy indexing —
    no external libs). Output keeps _DECODED_SCHEMA with new dims."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                arr = np.frombuffer(r.pixels, dtype=np.uint8).reshape(
                    r.height, r.width, r.channels
                )
                ys = (np.arange(height) * r.height // height).clip(0, r.height - 1)
                xs = (np.arange(width) * r.width // width).clip(0, r.width - 1)
                resized = arr[ys][:, xs]
                out.append(
                    (r.media_id, width, height, r.channels, resized.tobytes())
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return decoded.mapInPandas(_resize, schema=_DECODED_SCHEMA)


def sample_frames(videos: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video rows → one row per sampled frame timestamp.

    Pure Catalyst: ``sequence(0, duration_ms, every_ms)`` + posexplode —
    no UDF, fully pruned/pushed. The frame payload itself stays a
    (video_id, frame_ts) pointer; actual frame extraction is a decode
    op downstream (stubbed like images)."""
    return videos.filter(F.col("kind") == "video").select(
        F.col("media_id"),
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("duration_ms"), F.lit(0)),
                F.lit(int(every_ms)).cast("long"),
            )
        ).alias("frame_index", "frame_ts_ms"),
    )


_AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("window_index", IntegerType(), False),
        StructField("energy", FloatType(), True),
    ]
)


def audio_energy_windows(
    audio: DataFrame, *, window_bytes: int = 1024
) -> DataFrame:
    """Audio payload → per-window RMS energy over fixed-size byte
    windows (treating bytes as unsigned 8-bit samples — deterministic
    stand-in for a real PCM decode, same batch shape)."""

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                buf = np.frombuffer(r.content or b"", dtype=np.uint8).astype(
                    np.float64
                )
                for i in range(0, len(buf), window_bytes):
                    w = buf[i : i + window_bytes]
                    rms = float(np.sqrt(np.mean((w - 128.0) ** 2))) if w.size else 0.0
                    out.append((r.media_id, i // window_bytes, rms))
            yield pd.DataFrame(
                out, columns=["media_id", "window_index", "energy"]
            )

    return audio.filter(F.col("kind") == "audio").mapInPandas(
        _energy, schema=_AUDIO_WINDOW_SCHEMA
    )
