"""Coq-derived property suite for the RLE kernels (SURVEY.md §5.2).

Each test names the reference theorem it restates (rl_encoding.v:<lines>).
Golden vectors mirror the reference's vm_compute checks (v:5511-5754).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rlv.kernels import rle

# token-ish values; includes the u8/u16/u32 edges from FIXTURES.md §2 bounded_width
tokens = st.lists(
    st.one_of(
        st.integers(0, 2**31 - 1),
        st.integers(0, 5),  # force runs to actually occur
        st.sampled_from([0, 255, 256, 65535, 65536, 2**30 - 2, 2**31 - 1]),
    ),
    max_size=400,
)


def arr(xs, dtype=np.int64):
    return np.asarray(xs, dtype=dtype)


# ---------------------------------------------------------------------------
# Roundtrip + well-formedness (the core theorems)
# ---------------------------------------------------------------------------


@given(tokens)
def test_rle_correct_roundtrip(xs):
    """rle_correct (v:133-144): decode(encode l) = l, bit-identical."""
    a = arr(xs)
    c, v = rle.rle_encode(a)
    np.testing.assert_array_equal(rle.rle_decode(c, v), a)


@given(tokens)
def test_encode_well_formed(xs):
    """encode_well_formed_any (v:1477-1485): counts>0, adjacent values differ."""
    c, v = rle.rle_encode(arr(xs))
    assert rle.is_well_formed(c, v)


@given(tokens, tokens)
def test_rle_injective(xs, ys):
    """rle_injective (v:458-463): equal encodings ⇒ equal inputs."""
    a, b = arr(xs), arr(ys)
    ca, va = rle.rle_encode(a)
    cb, vb = rle.rle_encode(b)
    same = (
        ca.shape == cb.shape
        and bool((ca == cb).all())
        and bool((va == vb).all())
    )
    if same:
        np.testing.assert_array_equal(a, b)


@given(tokens)
def test_rle_idempotent_on_decoded(xs):
    """rle_idempotent / encode_decode_bijection (v:1706-1710, 1623-1631):
    re-encoding a decoded block is lossless and canonical."""
    c, v = rle.rle_encode(arr(xs))
    c2, v2 = rle.rle_encode(rle.rle_decode(c, v))
    np.testing.assert_array_equal(c, c2)
    np.testing.assert_array_equal(v, v2)


@given(tokens)
def test_sum_counts_equals_length(xs):
    """decode_length_sum / test_encode_preserves_length_sum (v:630-637, 5645-5648)."""
    a = arr(xs)
    c, _ = rle.rle_encode(a)
    assert rle.compute_decode_size(c) == a.size


@given(tokens)
def test_runs_never_exceed_length(xs):
    """rle_length_le (v:513-519): #runs <= n."""
    a = arr(xs)
    c, _ = rle.rle_encode(a)
    assert c.size <= a.size
    assert rle.count_runs(a) == c.size  # count_runs_correct (v:484-510)


@given(tokens)
def test_determinism_bit_identical(xs):
    """unique_well_formed_encoding (v:1524-1538) ⇒ two executors encoding the
    same chunk produce byte-identical blocks."""
    a = arr(xs)
    c1, v1 = rle.rle_encode(a)
    c2, v2 = rle.rle_encode(a.copy())
    assert c1.tobytes() == c2.tobytes() and v1.tobytes() == v2.tobytes()


# ---------------------------------------------------------------------------
# Normalize / sanitize / repair
# ---------------------------------------------------------------------------

runs_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 5)), max_size=60
)


@given(runs_strategy)
def test_normalize_is_encode_of_decode(runs):
    """encode_is_normalize (v:1594-1620): normalize runs = encode(decode runs)."""
    c = arr([r[0] for r in runs])
    v = arr([r[1] for r in runs])
    nc, nv = rle.normalize(c, v)
    ec, ev = rle.rle_encode(rle.rle_decode(c, v))
    np.testing.assert_array_equal(nc, ec)
    np.testing.assert_array_equal(nv, ev)


@given(runs_strategy)
def test_normalize_correct_and_wf(runs):
    """normalize_correct (v:344-358) + well-formed output (v:276-342) +
    length-nonincreasing (v:394-407)."""
    c = arr([r[0] for r in runs])
    v = arr([r[1] for r in runs])
    nc, nv = rle.normalize(c, v)
    np.testing.assert_array_equal(rle.rle_decode(nc, nv), rle.rle_decode(c, v))
    assert rle.is_well_formed(nc, nv)
    assert nc.size <= c.size


@given(runs_strategy)
def test_sanitize_decode_preserving_idempotent(runs):
    """sanitize/repair decode-preserving (v:1935-1939, 2049-2061), idempotent
    (v:1942-1951, 2042-2046); detect/count corruption sound (v:1979-2003)."""
    c = arr([r[0] for r in runs])
    v = arr([r[1] for r in runs])
    sc, sv = rle.sanitize_runs(c, v)
    np.testing.assert_array_equal(rle.rle_decode(sc, sv), rle.rle_decode(c, v))
    sc2, sv2 = rle.sanitize_runs(sc, sv)
    np.testing.assert_array_equal(sc, sc2)
    assert rle.detect_corruption(c) == (rle.count_corruptions(c) > 0)
    assert rle.count_corruptions(c) == c.size - sc.size  # v:2085-2086


def test_counterexample_uniqueness():
    """counterexample_uniqueness (v:5520-5530): [(3,1),(2,1)] and [(5,1)] decode
    equal; normalize maps the first to the second."""
    c1, v1 = arr([3, 2]), arr([1, 1])
    c2, v2 = arr([5]), arr([1])
    np.testing.assert_array_equal(rle.rle_decode(c1, v1), rle.rle_decode(c2, v2))
    nc, nv = rle.normalize(c1, v1)
    np.testing.assert_array_equal(nc, c2)
    np.testing.assert_array_equal(nv, v2)


def test_zero_count_runs_fixture():
    """FIXTURES.md §3 zero_count_runs: [(0,9),(2,4)] → decode [4,4]."""
    c, v = arr([0, 2]), arr([9, 4])
    np.testing.assert_array_equal(rle.rle_decode(c, v), arr([4, 4]))
    sc, sv = rle.repair_runs(c, v)
    np.testing.assert_array_equal(sc, arr([2]))
    np.testing.assert_array_equal(sv, arr([4]))


# ---------------------------------------------------------------------------
# Validated variants & guards
# ---------------------------------------------------------------------------


@given(tokens)
def test_validated_roundtrip(xs):
    """validated_roundtrip (v:4062-4105) + validated_encode_complete (v:4107-4121)."""
    a = arr(xs)
    out = rle.rle_encode_validated(a)
    if a.size <= rle.MAX_INT_RUNTIME and (a.size == 0 or a.max() < rle.MAX_INT_RUNTIME):
        assert out is not None
        np.testing.assert_array_equal(rle.rle_decode(*out), a)
    else:
        assert out is None


def test_validated_rejects_out_of_domain():
    """extraction_no_overflow domain (v:3958-3965, 3825): values >= 2^30-1 rejected."""
    assert rle.rle_encode_validated(arr([rle.MAX_INT_RUNTIME])) is None
    assert rle.rle_encode_validated(arr([rle.MAX_INT_RUNTIME - 1])) is not None
    assert rle.rle_decode_validated(arr([0]), arr([1])) is None  # zero count
    assert rle.rle_decode_validated(arr([2]), arr([4])) is not None


def test_decode_bomb_guard():
    """FIXTURES.md §3 decode_bomb + safe_decode_protects_memory (v:5059-5069)."""
    assert rle.safe_decode_with_limit(arr([10**9]), arr([1]), budget=4096) is None
    out = rle.safe_decode_with_limit(arr([3]), arr([1]), budget=4096)
    np.testing.assert_array_equal(out, arr([1, 1, 1]))


@given(tokens)
def test_width_gates(xs):
    """u8/u16/u32 encode gates (v:5284-5372)."""
    a = arr(xs)
    for bound, enc in [
        (rle.MAX_INT_8, rle.rle_encode_u8),
        (rle.MAX_INT_16, rle.rle_encode_u16),
        (rle.MAX_INT_32, rle.rle_encode_u32),
    ]:
        out = enc(a)
        if a.size == 0 or a.max() <= bound:
            assert out is not None
            np.testing.assert_array_equal(rle.rle_decode(*out), a)
        else:
            assert out is None


# ---------------------------------------------------------------------------
# Maxrun / capped encoding
# ---------------------------------------------------------------------------


@given(tokens, st.integers(1, 300))
def test_maxrun_roundtrip_bounded_capped_wf(xs, cap):
    """rle_maxrun_correct (v:4254-4264), rle_maxrun_bounded (v:4336-4345),
    positive counts (v:4299-4310), rle_maxrun_wf_capped (v:4413-4424)."""
    a = arr(xs)
    c, v = rle.rle_encode_maxrun(cap, a)
    np.testing.assert_array_equal(rle.rle_decode(c, v), a)
    if c.size:
        assert c.max() <= cap and c.min() > 0
    assert rle.is_wf_capped(c, v, cap)


def test_maxrun_boundary():
    """test_maxrun_boundary (v:5617-5623): 255 sevens @cap255 → 1 run; 256 → 2."""
    c1, _ = rle.rle_encode_byte(arr([7] * 255))
    c2, v2 = rle.rle_encode_byte(arr([7] * 256))
    assert c1.size == 1
    assert c2.size == 2
    np.testing.assert_array_equal(c2, arr([255, 1]))
    np.testing.assert_array_equal(v2, arr([7, 7]))


def test_maxrun_small_example():
    """maxrun 3 on [1]*6 → 2 runs (v:5741-5744)."""
    c, v = rle.rle_encode_maxrun(3, arr([1] * 6))
    np.testing.assert_array_equal(c, arr([3, 3]))
    np.testing.assert_array_equal(v, arr([1, 1]))


def test_u8_safe_block():
    """rle_encode_u8_safe (v:5317-5318): u8 values and u8 counts."""
    out = rle.rle_encode_u8_safe(arr([200] * 300))
    assert out is not None
    c, v = out
    assert c.max() <= 255 and v.max() <= 255
    np.testing.assert_array_equal(rle.rle_decode(c, v), arr([200] * 300))
    assert rle.rle_encode_u8_safe(arr([256])) is None


# ---------------------------------------------------------------------------
# Streaming / chunked encode == batch (the partition-seam contract)
# ---------------------------------------------------------------------------


@given(tokens, st.integers(1, 300), st.data())
def test_chunked_equals_batch(xs, cap, data):
    """stream_eq_batch (v:4695-4715): any chunking of a sequence encodes to the
    same capped run list as the batch encoder."""
    a = arr(xs)
    n_cuts = data.draw(st.integers(0, 5))
    cuts = sorted(data.draw(st.lists(st.integers(0, max(a.size, 1)), min_size=n_cuts, max_size=n_cuts)))
    chunks = np.split(a, cuts)
    cc, cv = rle.stream_complete_encode(cap, chunks)
    bc, bv = rle.rle_encode_maxrun(cap, a)
    np.testing.assert_array_equal(cc, bc)
    np.testing.assert_array_equal(cv, bv)


def test_streaming_state_consistency():
    """test_streaming_state_consistency (v:5626-5636): three incremental chunks
    ≡ batch."""
    chunks = [arr([1, 1]), arr([1, 2]), arr([2, 3])]
    cc, cv = rle.stream_complete_encode(1000, chunks)
    bc, bv = rle.rle_encode(arr([1, 1, 1, 2, 2, 3]))
    np.testing.assert_array_equal(cc, bc)
    np.testing.assert_array_equal(cv, bv)


@given(tokens, tokens)
def test_streaming_safe_append(xs, ys):
    """streaming_safe_append / encode_safe_concat (v:1011-1021, 1093-1103): if the
    boundary values differ, concat of encodings = encoding of concat."""
    a, b = arr(xs), arr(ys)
    if a.size and b.size and a[-1] == b[0]:
        return
    ca, va = rle.rle_encode(a)
    cb, vb = rle.rle_encode(b)
    cc, vc = rle.rle_encode(np.concatenate((a, b)))
    np.testing.assert_array_equal(np.concatenate((ca, cb)), cc)
    np.testing.assert_array_equal(np.concatenate((va, vb)), vc)


@given(tokens, tokens)
def test_parallel_encode_seam_bound(xs, ys):
    """count_runs_app_le / parallel_encode_safe (v:969-1008): runs(l1++l2) is
    runs(l1)+runs(l2) or one less (seam merge)."""
    a, b = arr(xs), arr(ys)
    whole = rle.count_runs(np.concatenate((a, b)))
    parts = rle.count_runs(a) + rle.count_runs(b)
    assert whole in (parts, parts - 1) if (a.size and b.size) else whole == parts


@given(runs_strategy)
def test_stream_decode_equals_batch(runs):
    """streaming_decoder_equivalent (v:5214-5222) + zero-count skipping
    (v:4960-4976)."""
    c = arr([r[0] for r in runs])
    v = arr([r[1] for r in runs])
    np.testing.assert_array_equal(rle.stream_decode(c, v), rle.rle_decode(c, v))


def test_stream_push_reference_model():
    """stream_push/flush per-element model sanity (v:4445-4462) vs chunked path."""
    st_ = rle.init_stream_state(255)
    emitted = []
    for x in [1, 1, 1, 2, 2, 3]:
        out, st_ = rle.stream_push(st_, x)
        if out is not None:
            emitted.append(out)
    tail = rle.stream_flush(st_)
    if tail:
        emitted.append(tail)
    assert emitted == [(3, 1), (2, 2), (1, 3)]


# ---------------------------------------------------------------------------
# Decomposition
# ---------------------------------------------------------------------------


@given(tokens)
def test_decompose_flatten_identity(xs):
    """decompose_flatten (v:946-951): flatten(decompose l) = l; every part is a
    run (is_run, v:860-864)."""
    a = arr(xs)
    parts = rle.decompose_runs(a)
    np.testing.assert_array_equal(rle.flatten_runs(parts) if parts else a[:0], a)
    for p in parts:
        assert rle.is_run(p)


def test_split_run():
    """split_run (v:866-875): peel maximal leading run."""
    head, tail = rle.split_run(arr([7, 7, 7, 2, 7]))
    np.testing.assert_array_equal(head, arr([7, 7, 7]))
    np.testing.assert_array_equal(tail, arr([2, 7]))


# ---------------------------------------------------------------------------
# Golden vectors (v:5704-5754 and the vm_compute benchmark definitions)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "xs,expect",
    [
        ([5] * 8, [(8, 5)]),  # roundtrip_uniform v:5706-5709
        ([1, 2, 1, 2, 1, 2], [(1, 1), (1, 2), (1, 1), (1, 2), (1, 1), (1, 2)]),  # v:5711-5715
        ([1, 1, 1, 2, 2, 3, 3, 3, 3, 4], [(3, 1), (2, 2), (4, 3), (1, 4)]),  # v:5717-5719
        ([], []),  # v:5721-5724
        ([42], [(1, 42)]),  # v:5726-5729
        ([7, 7, 7, 7, 7], [(5, 7)]),  # v:5732-5734
    ],
)
def test_golden_vectors(xs, expect):
    c, v = rle.rle_encode(arr(xs))
    assert list(zip(c.tolist(), v.tolist())) == expect


def test_benchmark_uniform_1000():
    """benchmark_uniform_optimal/ratio (v:5479, 5486-5500): 1 run, 1000:1."""
    c, v = rle.rle_encode(np.full(1000, 42, dtype=np.int64))
    assert c.size == 1 and c[0] == 1000 and v[0] == 42


def test_benchmark_alternating_1000():
    """benchmark_alternating (v:5482-5483) / no_compression_worst (v:562-590)."""
    a = np.arange(1000, dtype=np.int64) % 2
    assert rle.count_runs(a) == 1000


def test_impossible_compression():
    """test_impossible_compression (v:5551-5554): [1..5] → 5 runs (expansion)."""
    c, _ = rle.rle_encode(arr([1, 2, 3, 4, 5]))
    assert c.size == 5


@settings(max_examples=25)
@given(st.integers(0, 2**31 - 1), st.integers(1, 2000))
def test_best_case_uniform(val, n):
    """rle_best_case (v:522-529): uniform list → exactly 1 run."""
    c, v = rle.rle_encode(np.full(n, val, dtype=np.int64))
    assert c.size == 1 and int(c[0]) == n and int(v[0]) == val
