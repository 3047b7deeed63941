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

    n: int             # token count
    min_val: int       # 0 when n == 0
    max_val: int
    n_runs: int        # count_runs (v:467-481)
    max_count: int     # longest run
    ndv: int           # exact distinct values (len(np.unique))
    first_val: int     # first element (DELTA header), 0 when n == 0
    max_zz_delta: int  # max zigzagged successive diff (DELTA bit width)


def chunk_stats(a: np.ndarray) -> ChunkStats:
    a = np.asarray(a)
    if a.size == 0:
        return ChunkStats(0, 0, 0, 0, 0, 0, 0, 0)
    counts, values = rle.rle_encode(a)
    if a.size > 1:
        from rlv.blocks import _zigzag_diffs_u64

        max_zz = int(_zigzag_diffs_u64(a.astype(np.int64)).max())
    else:
        max_zz = 0
    return ChunkStats(
        n=int(a.size),
        min_val=int(a.min()),
        max_val=int(a.max()),
        n_runs=int(counts.size),
        max_count=int(counts.max()),
        ndv=int(np.unique(values).size),
        first_val=int(a[0]),
        max_zz_delta=max_zz,
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


def compression_ratio(n: int, n_runs: int) -> tuple[int, int] | None:
    """``compression_ratio_num/_den`` (v:533-537): (len original, len encoded).
    Uniform n:1 at v:540-548; no-benefit 1:1 at v:582-590."""
    if n == 0:
        return None
    return n, n_runs


def space_overhead(n: int, n_runs: int) -> int:
    """``space_overhead`` (v:2832-2833): encoded words (2/run) minus input length,
    floored at 0 (nat subtraction)."""
    return max(0, 2 * n_runs - n)


def encoding_expands(n: int, n_runs: int) -> bool:
    """``encoding_expands`` (v:2931-2932): RLE output takes more words than the
    input (example ``[1;2;3;4;5]`` expands, v:2962-2968) — the selector's
    raison d'etre (SURVEY §2.8 #41)."""
    return 2 * n_runs > n


def rle_encode_steps(n: int) -> int:
    """``rle_encode_steps`` (v:2536-2550): exactly n + 1 operations
    (``rle_encode_linear_time``, v:2564-2570)."""
    return n + 1


def rle_decode_steps(out_len: int) -> int:
    """``rle_decode_steps`` (v:2600-2604): output length + 1 (v:2616-2623)."""
    return out_len + 1


def auxiliary_space_encode(n: int) -> int:
    """``auxiliary_space_encode`` (v:2970-2993): encode working set = n words."""
    return n


def auxiliary_space_decode(sum_counts: int) -> int:
    """``auxiliary_space_decode`` (v:2996-3003): decode working set = Σ counts."""
    return sum_counts


def count_distinct_runs(a: np.ndarray) -> int:
    """``count_distinct_runs`` / ``run_structure_complexity`` (v:3029-3030,
    3111-3112): aliases of count_runs (Kolmogorov-measure framing,
    v:1869-1897)."""
    return rle.count_runs(a)


def run_length_histogram(counts: np.ndarray, n_bins: int = 16) -> list[int]:
    """Run-length histogram (log2 bins) — the ``run_frequency`` statistic
    (v:3032-3033) aggregated for the manifest."""
    counts = np.asarray(counts)
    if counts.size == 0:
        return [0] * n_bins
    bins = np.minimum(np.log2(np.maximum(counts, 1)).astype(np.int64), n_bins - 1)
    return np.bincount(bins, minlength=n_bins).tolist()
