"""Per-element reference models + inventory predicates (SURVEY §2.2/2.3/2.7/2.8):
each checked against the exact Coq definitions and against the vectorized path."""

from __future__ import annotations

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from rlv.kernels import rle

runs_strategy = st.lists(st.tuples(st.integers(0, 20), st.integers(0, 5)), max_size=40)
tokens = st.lists(st.integers(0, 6), max_size=200)


def arr(xs):
    return np.asarray(xs, dtype=np.int64)


@given(runs_strategy)
def test_stream_decode_list_equals_batch(runs):
    """stream_decode_complete (v:5200-5211) + streaming_decoder_equivalent
    (v:5214-5222): fuel = Σcounts + #runs suffices and equals batch decode."""
    c = arr([r[0] for r in runs])
    v = arr([r[1] for r in runs])
    fuel = int(c.sum()) + len(runs)
    out = rle.stream_decode_list(fuel, rle.init_decode_state(), list(zip(c.tolist(), v.tolist())))
    np.testing.assert_array_equal(arr(out), rle.rle_decode(c, v))


def test_stream_decode_fixture():
    """FIXTURES.md §3 stream_decode: [(3,1),(2,2),(4,3)]."""
    runs = [(3, 1), (2, 2), (4, 3)]
    out = rle.stream_decode_list(12, rle.init_decode_state(), runs)
    assert out == [1, 1, 1, 2, 2, 3, 3, 3, 3]


def test_stream_pull_skips_zero_count():
    """stream_pull zero-count skipping (v:4960-4976)."""
    vals, state, rest = rle.stream_pull(rle.init_decode_state(), [(0, 9), (2, 4)])
    assert vals == [] and rest == [(2, 4)]
    vals, state, rest = rle.stream_pull(state, rest)
    assert vals == [4] and state.remaining_count == 1


def test_stream_pull_safe_budget():
    """stream_pull_safe (v:5234-5241): refuses when the budget is exhausted."""
    st0 = rle.DecodeStreamState(5, 7)
    out = rle.stream_pull_safe(st0, [], budget=1)
    assert out is not None and out[0] == [7] and out[3] == 0
    assert rle.stream_pull_safe(st0, [], budget=0) is None


@given(tokens)
def test_bounded_and_width_predicates(xs):
    a = arr(xs)
    assert rle.bounded_list(7, a)  # values drawn from [0, 6]
    if a.size:
        assert not rle.bounded_list(int(a.max()), a)  # strict <
    c, v = rle.rle_encode(a)
    assert rle.runs_fit_width(int(c.max()) if c.size else 0, c)
    if c.size:
        assert not rle.runs_fit_width(int(c.max()) - 1, c)


@given(tokens, st.integers(1, 16))
def test_strict_capped_wf_of_maxrun(xs, cap):
    """rle_encode_maxrun output: capped-WF always (v:4413-4424); strictly so
    exactly when no run needed splitting into an at-cap + same-value pair."""
    a = arr(xs)
    c, v = rle.rle_encode_maxrun(cap, a)
    assert rle.is_wf_capped(c, v, cap)
    plain_c, _ = rle.rle_encode(a)
    if plain_c.size == 0 or plain_c.max() <= cap:
        assert rle.is_strictly_wf_capped(c, v, cap)


def test_strict_capped_counterexample():
    """[(cap,7),(1,7)] is capped-WF but not strictly (v:4272-4276)."""
    c, v = arr([3, 1]), arr([7, 7])
    assert rle.is_wf_capped(c, v, 3)
    assert not rle.is_strictly_wf_capped(c, v, 3)


def test_run_frequency():
    """run_frequency (v:3032-3033): multiset count of a given run."""
    c, v = arr([2, 1, 2]), arr([5, 5, 5])
    assert rle.run_frequency(2, 5, c, v) == 2
    assert rle.run_frequency(1, 5, c, v) == 1
    assert rle.run_frequency(9, 9, c, v) == 0


@given(st.integers(0, 200))
def test_serialize_deserialize_nat(n):
    """serialize_deserialize_nat (v:5263-5268)."""
    assert rle.deserialize_nat(rle.serialize_nat(n)) == n


@given(runs_strategy)
def test_serialize_runs_roundtrip(runs):
    """serialize_runs (v:5275-5279) + our decode-direction extension."""
    c = arr([r[0] for r in runs])
    v = arr([r[1] for r in runs])
    bits = rle.serialize_runs(c, v)
    rc, rv = rle.deserialize_runs(bits)
    np.testing.assert_array_equal(rc, c)
    np.testing.assert_array_equal(rv, v)


def test_serialize_run_example():
    """serialize_run layout: unary count ++ [F] ++ unary val ++ [F] (v:5270-5272)."""
    assert rle.serialize_run(2, 1) == [True, True, False, True, False]
