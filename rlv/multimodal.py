"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a ``kind``
tag and per-item metadata, processed with Arrow-batched ``mapInPandas`` — the
same zero-per-row-Python discipline as the token engine.  The actual media
DECODING is stubbed (this container has no image/audio libraries): the
``_decode_payload`` seam raises ``NotImplementedError`` for real decoding and
offers a deterministic fake (feature hash of the bytes) so the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real and
tested end-to-end.

At 100 TB the same pattern holds: payloads never leave the executor, feature
vectors (small) flow on; skew handling is by payload byte size (the LPT split
planner in :mod:`rlv.engine_files` applies unchanged since it balances by
row-group bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int, "
    "sample_rate int"
)

FEATURES_SCHEMA = "media_id string, kind string, n_bytes bigint, features array<float>"

N_FEATURES = 8

SUPPORTED_KINDS = {"image", "audio", "video"}

# Recorded golden for the real image branch (`pip install rlv[media]`): the
# stdlib-built 8x8 grayscale gradient PNG (tests/test_multimodal._tiny_png,
# column x holds pixel value (x*32) % 256) must decode to exactly these
# column means.  Pinned here so the contract survives environments where
# Pillow is absent — the conditional test asserts against THIS vector when
# Pillow exists, and the seam raises explicitly when it does not.
REFERENCE_PNG_FEATURES = tuple((x * 32 % 256) / 255.0 for x in range(8))


def _real_image_features(payload: bytes) -> "np.ndarray | None":
    """Real image decode IF Pillow is importable here (optional dependency —
    absent in this container, present on a real cluster image): grayscale
    8x8 thumbnail block means as the 8-float feature head.  Returns None when
    the library is missing so the caller can fall through to the explicit
    NotImplementedError."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return None
    with Image.open(io.BytesIO(payload)) as im:
        gray = im.convert("L").resize((N_FEATURES, N_FEATURES))
        px = np.asarray(gray, dtype=np.float32) / 255.0
        return px.mean(axis=0)


def _decode_payload(kind: str, payload: bytes, fake: bool) -> np.ndarray:
    """THE DECODE SEAM.  ``fake=True`` derives a deterministic 8-float
    feature vector from a sha256 of the payload (stable across executors /
    retries) — the oracle-checkable stand-in.  ``fake=False`` attempts the
    real decoder: images go through Pillow when it is installed
    (:func:`_real_image_features`); otherwise — and for audio/video, whose
    libraries (librosa/ffmpeg) this container lacks — the missing dependency
    raises explicitly instead of returning silently-wrong features."""
    if kind not in SUPPORTED_KINDS:
        raise ValueError(f"unsupported media kind: {kind}")
    if not fake:
        if kind == "image":
            feats = _real_image_features(payload)
            if feats is not None:
                return feats
        raise NotImplementedError(
            f"real {kind} decoding needs the media libraries (PIL/librosa/"
            "ffmpeg), which are not installed in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest, dtype=np.uint32)[:N_FEATURES]
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def _make_feature_worker(fake: bool):
    def worker(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rlv.util import tune_malloc

        tune_malloc()
        for pdf in it:
            feats = [
                _decode_payload(k, bytes(p), fake)
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype(str),
                    "kind": pdf["kind"].astype(str),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return worker


def extract_features_pass(df: DataFrame, fake: bool = True) -> DataFrame:
    """Media table -> per-item feature vectors (decode stubbed, see above)."""
    return df.select("media_id", "kind", "payload").mapInPandas(
        _make_feature_worker(fake), FEATURES_SCHEMA
    )


def frame_sample_pass(df: DataFrame, every_kth_kb: int = 4) -> DataFrame:
    """Frame/window sampling stub: slice every k-th KiB of the payload as a
    'frame' (a real decoder would seek keyframes).  Exercises the
    binary-in/list-of-binary-out batch shape."""

    def worker(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = [
                [
                    bytes(p)[o:o + 1024]
                    for o in range(0, len(bytes(p)), every_kth_kb * 1024)
                ]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype(str),
                    "n_frames": [len(f) for f in frames],
                    "frames": frames,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        worker, "media_id string, n_frames int, frames array<binary>"
    )
