"""Per-chunk statistics feeding the codec auto-selector and the manifest.

Restates the reference's analysis operators (SURVEY.md §2.8) as vectorized
numpy reductions.  These run once per column chunk inside the encode pass —
the "sampling/stats pass" of the north rule — and are recorded per partition
in the lineage manifest.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from rlv.kernels import rle
from rlv.kernels.bitpack import bits_required


@dataclass(frozen=True)
class ChunkStats:
    """Everything the selector needs, computable in one pass over the chunk."""

    n: int          # token count
    min_val: int    # 0 when n == 0
    max_val: int
    n_runs: int     # count_runs (v:467-481)
    max_count: int  # longest run
    ndv: int        # exact distinct values (len(np.unique))


def chunk_stats(a: np.ndarray) -> ChunkStats:
    a = np.asarray(a)
    if a.size == 0:
        return ChunkStats(0, 0, 0, 0, 0, 0)
    counts, values = rle.rle_encode(a)
    return ChunkStats(
        n=int(a.size),
        min_val=int(a.min()),
        max_val=int(a.max()),
        n_runs=int(counts.size),
        max_count=int(counts.max()),
        ndv=int(np.unique(values).size),
    )


def compression_ratio_space(n: int, n_runs: int) -> tuple[int, int] | None:
    """``compression_ratio_space`` (v:2885-2889): (len l, 2 * #runs) or None for
    the empty list.  Best case (n, 2) at v:2892-2903; worst (n, 2n) at v:2905-2923."""
    if n == 0:
        return None
    return n, 2 * n_runs


def encode_space_usage(n_runs: int, word_size: int = 8) -> int:
    """``encode_space_usage_realistic`` word model (v:2735-2762): 2 words/run."""
    return 2 * n_runs * word_size


def min_encoding_bits(n_runs: int) -> int:
    """``min_encoding_bits`` (v:3051-3053): #runs x bits_required(#runs)."""
    return n_runs * bits_required(n_runs)


def shannon_lower_bound(n_runs: int, total: int) -> int:
    """``shannon_lower_bound`` (v:3198-3202): k * floor(log2 total) in the
    reference's nat-valued model (uniform-run information bound)."""
    if total <= 0:
        return 0
    return n_runs * int(math.floor(math.log2(total)))


def rle_shannon_entropy(counts: np.ndarray) -> float:
    """``rle_shannon_entropy`` (v:3324-3326): Shannon entropy (bits/run) of the
    run-length distribution.  Formula port only — the reference's two entropy
    proofs are Admitted (v:3478-3493, 3725-3780) and are NOT claimed verified
    (SURVEY.md §5.1); this is a selector/manifest metric, never a correctness
    gate, so the float path is acceptable here.
    """
    counts = np.asarray(counts, dtype=np.float64)
    total = counts.sum()
    if total <= 0:
        return 0.0
    p = counts / total
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def run_length_histogram(counts: np.ndarray, n_bins: int = 16) -> list[int]:
    """Run-length histogram (log2 bins) — the ``run_frequency`` statistic
    (v:3032-3033) aggregated for the manifest."""
    counts = np.asarray(counts)
    if counts.size == 0:
        return [0] * n_bins
    bins = np.minimum(np.log2(np.maximum(counts, 1)).astype(np.int64), n_bins - 1)
    return np.bincount(bins, minlength=n_bins).tolist()
