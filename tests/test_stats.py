"""SURVEY.md §2.8 analysis operators: formulas checked against the reference's
verified closed forms (rl_encoding.v citations in each test)."""

from __future__ import annotations

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from rlv import stats
from rlv.kernels import rle

tokens = st.lists(st.integers(0, 100), max_size=300)


@given(tokens)
def test_ratio_and_space_formulas(xs):
    a = np.asarray(xs, dtype=np.int64)
    r = rle.count_runs(a)
    n = a.size
    if n == 0:
        assert stats.compression_ratio(n, r) is None
        assert stats.compression_ratio_space(n, r) is None
        return
    assert stats.compression_ratio(n, r) == (n, r)
    assert stats.compression_ratio_space(n, r) == (n, 2 * r)  # v:2885-2889
    assert stats.encode_space_usage(r) == 16 * r  # v:2744-2762, word_size=8
    # space bounds (v:2778-2785, 3055-3068): r <= 2r words <= 2n; >= 2 nonempty
    assert r <= 2 * r <= 2 * n
    assert 2 * r >= 2
    assert stats.space_overhead(n, r) == max(0, 2 * r - n)  # v:2832-2833
    assert stats.encoding_expands(n, r) == (2 * r > n)  # v:2931-2932


def test_expansion_example():
    """[1;2;3;4;5] expands (v:2962-2968)."""
    a = np.array([1, 2, 3, 4, 5])
    r = rle.count_runs(a)
    assert stats.encoding_expands(a.size, r)


def test_uniform_best_and_alternating_worst():
    """best case (n,2) v:2892-2903; worst (n,2n) v:2905-2923."""
    uni = np.full(1000, 42)
    assert stats.compression_ratio_space(1000, rle.count_runs(uni)) == (1000, 2)
    alt = np.arange(1000) % 2
    assert stats.compression_ratio_space(1000, rle.count_runs(alt)) == (1000, 2000)


def test_step_models():
    """encode steps = n+1 (v:2564-2570, benchmark 1001 for n=1000 v:5503-5509);
    decode steps = out_len+1 (v:2616-2623)."""
    assert stats.rle_encode_steps(1000) == 1001
    assert stats.rle_decode_steps(5) == 6
    assert stats.auxiliary_space_encode(7) == 7  # v:2987-2993
    assert stats.auxiliary_space_decode(9) == 9  # v:2998-3003


@given(tokens)
def test_entropy_and_info_measures(xs):
    a = np.asarray(xs, dtype=np.int64)
    counts, _ = rle.rle_encode(a)
    h = stats.rle_shannon_entropy(counts)
    assert h >= 0.0  # nonneg proved v:3459-3475
    if counts.size:
        assert h <= np.log2(counts.size) + 1e-9  # <= log2(#runs)
    r = counts.size
    assert stats.min_encoding_bits(r) == r * (1 if r == 0 else max(1, int(r).bit_length()))
    assert stats.count_distinct_runs(a) == r
    hist = stats.run_length_histogram(counts)
    assert sum(hist) == r


def test_shannon_lower_bound():
    """shannon_lower_bound (v:3198-3202): k * floor(log2 total)."""
    assert stats.shannon_lower_bound(3, 8) == 9
    assert stats.shannon_lower_bound(3, 0) == 0
    assert stats.shannon_lower_bound(0, 100) == 0
