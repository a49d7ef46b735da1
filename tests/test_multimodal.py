"""Multimodal binary-column plumbing: schemas, batch shapes, determinism.

Real codecs are absent in this container (by design — see
operators/multimodal.py); the FakeCodec path proves every piece of
Spark plumbing with deterministic pseudo-pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from assignment3_qachatapplication_vectorembeddings_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FakeCodec,
    RealImageCodec,
    audio_energy_windows,
    decode_images,
    image_features,
    load_binary_dir,
    resize_images,
    sample_frames,
)


def _media_rows():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(6):
        rows.append(
            (
                f"img_{i}.bin",
                "image",
                bytes(rng.randint(0, 256, 400, dtype=np.uint8).tobytes()),
                12 + i,
                10 + i,
                None,
                None,
                "application/octet-stream",
            )
        )
    rows.append(
        ("aud_0.bin", "audio", bytes(rng.randint(0, 256, 3000, dtype=np.uint8)), None, None, 16000, 5000, None)
    )
    rows.append(("vid_0.bin", "video", b"\x00" * 64, None, None, None, 4500, None))
    return rows


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(_media_rows(), MEDIA_SCHEMA).cache()


def test_decode_shape_and_determinism(spark, media):
    imgs = media.filter("kind = 'image'")
    d1 = decode_images(imgs).orderBy("media_id").collect()
    d2 = decode_images(imgs).orderBy("media_id").collect()
    assert len(d1) == 6
    for a, b in zip(d1, d2):
        assert a["media_id"] == b["media_id"]
        assert a["pixels"] == b["pixels"]  # deterministic fake decode
        assert len(a["pixels"]) == a["width"] * a["height"] * a["channels"]


def test_image_features_shape(spark, media):
    feats = image_features(decode_images(media.filter("kind = 'image'")), bins=8)
    rows = feats.collect()
    assert len(rows) == 6
    for r in rows:
        assert len(r["feature"]) == 3 + 8  # channel means + histogram
        assert all(0.0 <= v <= 1.0 for v in r["feature"])


def test_resize_batch_shape(spark, media):
    resized = resize_images(
        decode_images(media.filter("kind = 'image'")), width=8, height=6
    ).collect()
    for r in resized:
        assert (r["width"], r["height"]) == (8, 6)
        assert len(r["pixels"]) == 8 * 6 * r["channels"]


def test_sample_frames_native_explode(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    # duration 4500 ms, step 1000 → ts 0..4000 inclusive = 5 frames
    assert len(frames) == 5
    assert [f["frame_ts_ms"] for f in sorted(frames, key=lambda r: r["frame_index"])] == [
        0,
        1000,
        2000,
        3000,
        4000,
    ]


def test_audio_energy_windows(spark, media):
    wins = audio_energy_windows(media, window_bytes=1024).collect()
    # 3000 bytes → windows 0,1,2 (1024,1024,952)
    assert sorted(w["window_index"] for w in wins) == [0, 1, 2]
    assert all(w["energy"] >= 0.0 for w in wins)


def test_real_codec_is_import_gated():
    with pytest.raises(NotImplementedError, match="PIL not installed"):
        RealImageCodec().decode(b"xx", 4, 4)


def test_load_binary_dir(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"m{i}.bin").write_bytes(bytes([i]) * 32)
    (tmp_path / "skip.txt").write_bytes(b"no")
    df = load_binary_dir(spark, str(tmp_path), "image", glob="*.bin")
    rows = df.collect()
    assert {r["media_id"] for r in rows} == {"m0.bin", "m1.bin", "m2.bin"}
    assert all(r["kind"] == "image" and len(r["content"]) == 32 for r in rows)
