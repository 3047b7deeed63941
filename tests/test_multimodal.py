"""Multimodal plumbing: schema/batch-shape/determinism are real; decode is a
clearly-marked stub (no media libs in this container)."""

from __future__ import annotations

import numpy as np
import pytest

from rlv import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.default_rng(42)
    rows = [
        (f"m{i}", kind, bytes(rng.integers(0, 256, size=int(rng.integers(10, 9000)),
                                           dtype=np.uint8).tobytes()),
         64, 64, 16000)
        for i, kind in enumerate(["image", "audio", "video"] * 10)
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark, media_df):
    out = multimodal.extract_features_pass(media_df).collect()
    assert len(out) == media_df.count()
    by_id = {r["media_id"]: r for r in out}
    src = {r["media_id"]: r for r in media_df.collect()}
    for mid, r in by_id.items():
        assert len(r["features"]) == multimodal.N_FEATURES
        assert all(0.0 <= f <= 1.0 for f in r["features"])
        assert r["n_bytes"] == len(bytes(src[mid]["payload"]))
    # deterministic across re-runs (retry safety)
    out2 = {r["media_id"]: r["features"]
            for r in multimodal.extract_features_pass(media_df).collect()}
    for mid, r in by_id.items():
        assert out2[mid] == r["features"]


def test_real_decode_is_explicitly_unimplemented():
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload("image", b"\x89PNG...", fake=False)
    with pytest.raises(ValueError):
        multimodal._decode_payload("hologram", b"", fake=True)


def test_frame_sample_pass(spark, media_df):
    out = {r["media_id"]: r for r in multimodal.frame_sample_pass(media_df).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media_df.collect()}
    for mid, payload in src.items():
        r = out[mid]
        expect = (len(payload) + 4096 - 1) // 4096
        assert r["n_frames"] == max(expect, 0) == len(r["frames"])
        assert bytes(r["frames"][0]) == payload[:1024]


def _tiny_png(width=8, height=8):
    """Minimal valid 8-bit grayscale PNG built with stdlib only (no Pillow
    needed to GENERATE it): constant-column horizontal gradient."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 32) % 256 for x in range(width))
        for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_image_decode_seam():
    """The NON-stub branch of _decode_payload: with Pillow importable the
    tiny PNG's column means come back as the 8-float feature head (golden
    asserted); without it the seam must raise explicitly, never return
    silently-wrong features."""
    png = _tiny_png()
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        feats = multimodal._decode_payload("image", png, fake=False)
        assert feats.shape == (multimodal.N_FEATURES,)
        assert feats.dtype == np.float32
        # the RECORDED golden (rlv.multimodal.REFERENCE_PNG_FEATURES) pins
        # the real branch's contract; recompute it independently here too
        expected = np.array(
            [(x * 32 % 256) / 255.0 for x in range(8)], dtype=np.float32
        )
        assert np.allclose(
            expected, np.asarray(multimodal.REFERENCE_PNG_FEATURES,
                                 dtype=np.float32)
        )
        assert np.allclose(feats, expected, atol=1e-6)
    else:
        with pytest.raises(NotImplementedError, match="media libraries"):
            multimodal._decode_payload("image", png, fake=False)
    # audio/video decoding has no library either way: must raise explicitly
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload("audio", b"\x00" * 64, fake=False)
