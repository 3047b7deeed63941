"""Block format + codec selector properties (SURVEY.md §7.1 steps 2-3).

Key invariants:
* every codec round-trips bit-identically (the per-row invariant);
* ``codec_sizes`` is EXACT (== len of the produced block) for every codec;
* the auto-selected block is minimal over candidates and never exceeds the
  reference naive-RLE budget 2*count_runs*8 B (rl_encoding.v:2744-2762);
* blocks are deterministic (byte-identical on re-encode).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from rlv import blocks, selector
from rlv.kernels import bitpack, rle
from rlv.stats import chunk_stats

token_arrays = st.one_of(
    # run-heavy: small vocab
    st.lists(st.integers(0, 5), max_size=500),
    # GPT-2-vocab-ish tokens
    st.lists(st.integers(0, 50256), max_size=300),
    # edges incl. negatives (engine is int32-generic even if tokens are >= 0)
    st.lists(
        st.sampled_from([-(2**31), -1, 0, 1, 255, 256, 65535, 2**31 - 1]),
        max_size=50,
    ),
    # int64 territory (PLAIN width-8 path)
    st.lists(st.integers(-(2**62), 2**62), max_size=40),
)


def arr(xs):
    return np.asarray(xs, dtype=np.int64)


@given(token_arrays)
def test_every_codec_roundtrips_exactly(xs):
    a = arr(xs)
    for codec in blocks.INT_CODECS:
        if codec == blocks.BITPACK and a.size and a.min() < 0:
            continue
        block = blocks.encode_with(codec, a)
        out = blocks.decode_block(block, dtype=np.int64)
        np.testing.assert_array_equal(out, a)


@given(token_arrays)
def test_codec_sizes_are_exact(xs):
    """codec_sizes is a cost model with zero error — the 'early size
    computation' idea (v:4013-4014, 467-481) made exact."""
    a = arr(xs)
    s = chunk_stats(a)
    sizes = blocks.codec_sizes(s.n, s.min_val, s.max_val, s.n_runs,
                               s.max_count, s.ndv, s.first_val, s.max_zz_delta)
    for codec, predicted in sizes.items():
        assert predicted == len(blocks.encode_with(codec, a)), blocks.CODEC_NAMES[codec]


@given(token_arrays)
def test_auto_selection_minimal_and_within_budget(xs):
    """Chosen block is argmin over candidates; <= naive-RLE budget
    (north rule / encode_space_usage v:2744-2762)."""
    a = arr(xs)
    codec, block = selector.encode_auto(a)
    s = chunk_stats(a)
    sizes = blocks.codec_sizes(s.n, s.min_val, s.max_val, s.n_runs,
                               s.max_count, s.ndv, s.first_val, s.max_zz_delta)
    if a.size == 0:
        assert block == b""
        return
    assert len(block) == min(sizes.values())
    assert len(block) <= blocks.naive_rle_bytes(s.n_runs)
    np.testing.assert_array_equal(blocks.decode_block(block, np.int64), a)


@given(token_arrays)
def test_blocks_deterministic(xs):
    """Uniqueness law (v:1524-1538) lifted to blocks: re-encode == byte-identical
    (idempotent retries / dedup safety)."""
    a = arr(xs)
    c1, b1 = selector.encode_auto(a)
    c2, b2 = selector.encode_auto(a.copy())
    assert c1 == c2 and b1 == b2


def test_selector_picks_sensible_codecs():
    """FIXTURES.md families drive the expected selector outcomes."""
    # constant column: FOR with 0-bit deltas (5 B) legitimately beats RLE (7 B)
    uniform = np.full(1000, 42, dtype=np.int64)
    codec, block = selector.encode_auto(uniform)
    assert codec == blocks.FOR and len(block) == 5
    # but a long two-value run structure is RLE's home turf
    runs = np.repeat(np.array([3, 9, 3, 9], dtype=np.int64), 1000)
    assert selector.encode_auto(runs)[0] == blocks.RLE

    # strictly increasing: RLE expands, and constant diffs make DELTA the
    # clear winner (1-bit zigzag plane vs a 16-bit FOR plane)
    ramp = np.arange(50257, dtype=np.int64)
    codec, block = selector.encode_auto(ramp)
    assert codec == blocks.DELTA
    assert len(block) < len(blocks.encode_with(blocks.FOR, ramp))
    assert len(block) < len(blocks.encode_with(blocks.RLE, ramp))
    np.testing.assert_array_equal(blocks.decode_block(block, np.int64), ramp)

    # sorted keys with gaps (the table-plane shape): DELTA still wins
    keys = np.cumsum(np.abs(np.random.default_rng(7).integers(1, 30, 4096)))
    codec, _ = selector.encode_auto(keys.astype(np.int64))
    assert codec == blocks.DELTA

    shifted = np.arange(10**6, 10**6 + 4096, dtype=np.int64)
    assert selector.encode_auto(shifted)[0] == blocks.DELTA  # was FOR pre-DELTA

    rng = np.random.default_rng(42)
    low_ndv = rng.choice(np.array([17, 999, 123456, 7]), size=4096).astype(np.int64)
    assert selector.encode_auto(low_ndv)[0] == blocks.DICT

    high_entropy = rng.integers(0, 50257, size=4096).astype(np.int64)
    codec, block = selector.encode_auto(high_entropy)
    assert codec != blocks.RLE  # RLE must NOT win on noise...
    np.testing.assert_array_equal(  # ...but must still round-trip (FIXTURES §2)
        blocks.decode_block(blocks.encode_with(blocks.RLE, high_entropy), np.int64),
        high_entropy,
    )


def test_rle_block_beats_naive_budget_with_headroom():
    """Uniform 1000 (v:5479): naive budget is 16 B; our RLE block is smaller."""
    a = np.full(1000, 42, dtype=np.int64)
    _, block = selector.encode_auto(a)
    assert len(block) <= 16
    # alternating worst case (v:5482-5483): counts all 1 -> count plane is empty
    alt = (np.arange(1000) % 2).astype(np.int64)
    rle_block = blocks.encode_with(blocks.RLE, alt)
    assert len(rle_block) <= blocks.naive_rle_bytes(1000)


# --- bitpack primitives -----------------------------------------------------


@given(st.lists(st.integers(0, 2**63 - 1), max_size=200), st.integers(0, 64))
def test_pack_unpack_roundtrip(xs, bits):
    a = arr(xs)
    if a.size and bits < 64 and (a.max() >> bits if bits else a.max()):
        with pytest.raises(ValueError):
            bitpack.pack_bits(a, bits)
        return
    buf = bitpack.pack_bits(a, bits)
    assert len(buf) == bitpack.packed_nbytes(a.size, bits)
    np.testing.assert_array_equal(bitpack.unpack_bits(buf, a.size, bits), a)


@given(st.integers(0, 2**63 - 1))
def test_uvarint_roundtrip(n):
    out = bytearray()
    bitpack.write_uvarint(out, n)
    assert len(out) == bitpack.uvarint_len(n)
    val, pos = bitpack.read_uvarint(bytes(out), 0)
    assert val == n and pos == len(out)


@given(st.integers(-(2**62), 2**62))
def test_zigzag_roundtrip(n):
    assert bitpack.unzigzag(bitpack.zigzag(n)) == n
    assert bitpack.zigzag(n) >= 0


@given(st.integers(0, 2**40))
def test_bits_required_matches_reference(n):
    """bits_required (v:3038-3039): 1 if 0 else 1+floor(log2 n) == bit_length."""
    expect = 1 if n == 0 else n.bit_length()
    assert bitpack.bits_required(n) == expect


def test_bits_required_table():
    assert [bitpack.bits_required(n) for n in [0, 1, 2, 3, 4, 7, 8, 255, 256]] == [
        1, 1, 2, 2, 3, 3, 4, 8, 9,
    ]


@given(st.lists(token_arrays, max_size=8))
def test_decode_blocks_batch_matches_per_doc(doc_lists):
    """Batched multi-doc decode is byte-identical to per-doc decode_block,
    across codecs, interleaved empties, and mixed widths."""
    blobs, expect = [], []
    for xs in doc_lists:
        a = arr(xs)
        for codec in blocks.INT_CODECS:
            if codec == blocks.BITPACK and a.size and a.min() < 0:
                continue
            blobs.append(blocks.encode_with(codec, a))
            expect.append(a)
    flat, offs = blocks.decode_blocks_batch(blobs, np.int64)
    assert offs[-1] == sum(e.size for e in expect)
    for i, e in enumerate(expect):
        np.testing.assert_array_equal(flat[offs[i]:offs[i + 1]], e)


def test_decode_blocks_batch_rejects_truncation():
    a = np.arange(500, dtype=np.int64)
    good = blocks.encode_with(blocks.FOR, a)
    with pytest.raises(ValueError):
        blocks.decode_blocks_batch([good[:-3]])
    # and a truncated neighbour cannot corrupt other docs' output
    with pytest.raises(ValueError):
        blocks.decode_blocks_batch([good, good[:-3], good])


def test_decode_blocks_batch_rejects_wrapped_dict_index():
    """ibits=64 indices that view to negative int64 are corrupt and must not
    wrap into the wrong dictionary entry via Python negative indexing."""
    from rlv.kernels.bitpack import pack_bits, write_uvarint

    hdr = bytearray([blocks.DICT])
    write_uvarint(hdr, 1)  # n
    write_uvarint(hdr, 1)  # ndv
    write_uvarint(hdr, 0)  # svarint dict_min
    hdr.append(1)          # dbits
    hdr += pack_bits(np.array([0], np.uint64), 1)
    hdr.append(64)         # ibits
    hdr += (2**64 - 1).to_bytes(8, "little")
    with pytest.raises(ValueError):
        blocks.decode_blocks_batch([bytes(hdr)])


def test_decode_blocks_batch_budget_blocks_forged_sizes():
    """safe_decode_with_limit (v:5034-5069): forged headers declaring huge
    sizes raise BEFORE any allocation when an expected budget is given."""
    from rlv.kernels.bitpack import write_uvarint

    # RLE blob with cbits=vbits=0 declaring 10^15 all-length-1 runs
    forged = bytearray([blocks.RLE])
    write_uvarint(forged, 10**15)
    write_uvarint(forged, 0)  # svarint min
    forged += bytes([0, 0])   # cbits, vbits
    with pytest.raises(ValueError):
        blocks.decode_blocks_batch([bytes(forged)], expected=[100])
    # DICT blob with ndv > n rejected unconditionally
    forged2 = bytearray([blocks.DICT])
    write_uvarint(forged2, 1)
    write_uvarint(forged2, 10**12)
    with pytest.raises(ValueError):
        blocks.decode_blocks_batch([bytes(forged2)])
    # size disagreement with the budget
    good = blocks.encode_with(blocks.FOR, np.arange(10, dtype=np.int64))
    with pytest.raises(ValueError):
        blocks.decode_blocks_batch([good], expected=[11])
    flat, offs = blocks.decode_blocks_batch([good], expected=[10])
    assert offs[1] == 10


@given(st.binary(max_size=200), st.integers(0, 300))
def test_decoder_never_crashes_on_garbage(junk, budget):
    """Arbitrary bytes either decode (if they happen to parse) or raise a
    clean ValueError/IndexError — never a crash, hang, or huge allocation
    (the expected budget caps declared sizes)."""
    for blobs in ([junk], [junk, blocks.encode_with(blocks.PLAIN, arr([1, 2]))]):
        try:
            flat, offs = blocks.decode_blocks_batch(
                blobs, np.int64, expected=[budget] + [2] * (len(blobs) - 1)
            )
            assert offs[-1] <= budget + 2
        except (ValueError, IndexError):
            pass


@given(
    bits=st.integers(0, 64),
    lens=st.lists(st.integers(0, 17), min_size=1, max_size=6),
    data=st.data(),
)
def test_pack_bits_multi_equals_per_doc(bits, lens, data):
    """pack_bits_multi's payload slices are byte-identical to per-doc
    pack_bits for every width 0..64 and mixed doc lengths (covers the
    sub-byte bit-matrix path AND the 64-bit fast path directly)."""
    hi = (1 << bits) - 1 if bits else 0
    docs = [
        np.array(
            data.draw(st.lists(st.integers(0, hi), min_size=n, max_size=n)),
            dtype=np.uint64,
        )
        for n in lens
    ]
    flat = np.concatenate(docs)
    payload, offs = bitpack.pack_bits_multi(
        flat, np.array(lens, dtype=np.int64), bits
    )
    for i, d in enumerate(docs):
        assert payload[offs[i]:offs[i + 1]] == bitpack.pack_bits(d, bits)


# ---------------------------------------------------------------------------
# Validity (NULL) plane: the NULLW wrapper around any inner block.
# ---------------------------------------------------------------------------

nullable_docs = st.lists(
    st.tuples(token_arrays, st.randoms(use_true_random=False)), max_size=6
)


def _mask_for(n, rnd):
    return np.array([rnd.random() < 0.3 for _ in range(n)], dtype=bool)


@given(token_arrays, st.randoms(use_true_random=False))
def test_nullw_roundtrip_and_exact_overhead(xs, rnd):
    """wrap_nullable's size is exactly nullable_overhead + inner, and the
    scalar decode restores values AND validity bit-exactly."""
    full = arr(xs)
    valid = _mask_for(full.size, rnd)
    vals = full[valid]
    codec, inner = selector.encode_auto(vals)
    blk = blocks.wrap_nullable(valid, inner)
    assert len(blk) == blocks.nullable_overhead(full.size, vals.size) + len(inner)
    out, v2 = blocks.decode_nullable_block(blk, np.int64)
    np.testing.assert_array_equal(v2, valid)
    np.testing.assert_array_equal(out[v2], vals)
    assert (out[~v2] == 0).all()


@given(st.lists(st.tuples(token_arrays, st.booleans()), max_size=8),
       st.randoms(use_true_random=False))
def test_decode_blocks_batch_nullable_matches_scalar(doc_specs, rnd):
    """Batched nullable decode == per-doc scalar decode, for any mix of
    wrapped and unwrapped blobs (including all-NULL and empty docs)."""
    blobs, expected, want_vals, want_valid = [], [], [], []
    for xs, use_mask in doc_specs:
        full = arr(xs)
        if use_mask and full.size:
            valid = _mask_for(full.size, rnd)
            _, inner = selector.encode_auto(full[valid])
            blobs.append(blocks.wrap_nullable(valid, inner))
        else:
            valid = np.ones(full.size, dtype=bool)
            _, b = selector.encode_auto(full)
            blobs.append(b)
        expected.append(full.size)
        masked = full.copy()
        masked[~valid] = 0
        want_vals.append(masked)
        want_valid.append(valid)
    flat, offs, validity = blocks.decode_blocks_batch_nullable(
        blobs, np.int64, expected=expected
    )
    assert offs[-1] == sum(expected)
    for i in range(len(blobs)):
        np.testing.assert_array_equal(flat[offs[i]:offs[i + 1]], want_vals[i])
        np.testing.assert_array_equal(
            validity[offs[i]:offs[i + 1]], want_valid[i]
        )


def test_nullw_corruption_detected():
    valid = np.array([True, False, True, True], dtype=bool)
    _, inner = selector.encode_auto(np.array([5, 5, 9], dtype=np.int64))
    blk = bytearray(blocks.wrap_nullable(valid, inner))
    # flip a bitmap bit -> popcount no longer matches n_valid
    blk[3] ^= 0x02
    import pytest

    with pytest.raises(ValueError, match="NULLW"):
        blocks.decode_nullable_block(bytes(blk), np.int64)
    # declared rows != expected budget
    good = blocks.wrap_nullable(valid, inner)
    with pytest.raises(ValueError, match="expected"):
        blocks.decode_blocks_batch_nullable([good], np.int64, expected=[9])


sum_edge_arrays = st.one_of(
    token_arrays,
    # magnitudes near the int64 edge: the 32-bit-plane exact-sum path
    st.lists(
        st.sampled_from(
            [-(2**63), -(2**63) + 1, 2**63 - 1, 2**62, -(2**62), 0, 1]
        ),
        max_size=60,
    ),
)


@given(sum_edge_arrays)
def test_agg_block_matches_decoded_aggregates(xs):
    """agg_block == aggregate-after-decode for every codec, with the RLE
    path never expanding runs and sums exact over the full int64 domain."""
    a = arr(xs)
    want_sum = int(sum(int(v) for v in xs))
    for codec in blocks.INT_CODECS:
        if codec == blocks.BITPACK and a.size and a.min() < 0:
            continue
        block = blocks.encode_with(codec, a)
        n_rows, n_valid, s, mn, mx = blocks.agg_block(block)
        assert (n_rows, n_valid) == (a.size, a.size)
        assert s == want_sum
        if a.size:
            assert (mn, mx) == (int(a.min()), int(a.max()))
        else:
            assert (mn, mx) == (None, None)


@given(sum_edge_arrays, st.randoms(use_true_random=False))
def test_agg_block_nullable_skips_nulls(xs, rnd):
    """A NULLW-wrapped block aggregates its VALID values only (SQL
    count/sum/min/max NULL semantics), including the all-NULL block."""
    a = arr(xs)
    validity = np.array([rnd.random() < 0.7 for _ in range(a.size)], bool)
    valid_vals = a[validity]
    inner = selector.encode_auto(valid_vals)[1] if valid_vals.size else b""
    block = blocks.wrap_nullable(validity, inner)
    n_rows, n_valid, s, mn, mx = blocks.agg_block(block)
    assert n_rows == a.size and n_valid == int(validity.sum())
    assert s == int(sum(int(v) for v in valid_vals))
    if valid_vals.size:
        assert (mn, mx) == (int(valid_vals.min()), int(valid_vals.max()))
    else:
        assert (mn, mx) == (None, None)


@given(sum_edge_arrays)
def test_exact_sum_i64_is_exact(xs):
    assert blocks.exact_sum_i64(arr(xs)) == sum(int(v) for v in xs)


@given(sum_edge_arrays)
def test_distinct_block_values_matches_decode(xs):
    """distinct_block_values == np.unique(decode) for every codec (the RLE
    path uniques run values, the DICT path reads only its dictionary
    plane)."""
    a = arr(xs)
    want = np.unique(a.astype(np.int64))
    for codec in blocks.INT_CODECS:
        if codec == blocks.BITPACK and a.size and a.min() < 0:
            continue
        got = blocks.distinct_block_values(blocks.encode_with(codec, a))
        assert got.dtype == np.int64
        assert np.array_equal(got, want)


@given(sum_edge_arrays, st.randoms(use_true_random=False))
def test_distinct_block_values_nullable(xs, rnd):
    """A NULLW-wrapped block's distinct set is over its VALID values only
    (SQL DISTINCT NULL handling lives in the caller via n_nulls metadata)."""
    a = arr(xs)
    validity = np.array([rnd.random() < 0.7 for _ in range(a.size)], bool)
    valid_vals = a[validity]
    inner = selector.encode_auto(valid_vals)[1] if valid_vals.size else b""
    block = blocks.wrap_nullable(validity, inner)
    assert np.array_equal(
        blocks.distinct_block_values(block),
        np.unique(valid_vals.astype(np.int64)),
    )
