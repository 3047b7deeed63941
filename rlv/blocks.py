"""Encoded-block wire format: one self-describing byte blob per column chunk.

This replaces the reference's toy unary serialization (``serialize_runs``,
rl_encoding.v:5246-5279) with a real byte format; decode is exact-integer and
bit-identical by construction (the engine's per-row invariant).  Every codec
here is an *integer* codec over one token array; the string codec (FSST) lives
in :mod:`rlv.kernels.fsst`.

Layout (little-endian, varint = LEB128):

==========  =================================================================
codec id    payload after the 1-byte codec id
==========  =================================================================
PLAIN  (1)  uvarint n | width u8 (4|8) | n fixed-width signed values
RLE    (2)  uvarint n_runs | svarint min_val | cbits u8 | vbits u8
            | pack(counts-1, cbits) | pack(values-min_val, vbits)
BITPACK(3)  uvarint n | bits u8 | pack(values, bits)           (min >= 0 only)
FOR    (4)  uvarint n | svarint min_val | bits u8 | pack(values-min_val, bits)
DICT   (5)  uvarint n | uvarint ndv | svarint dict_min | dbits u8
            | pack(dict-dict_min, dbits) | ibits u8 | pack(indices, ibits)
FSST   (6)  string codec, see rlv/kernels/fsst.py
DELTA  (8)  uvarint n | svarint first | bits u8
            | pack(zigzag(successive diffs), bits)   (n-1 packed values)
==========  =================================================================

The empty array is the empty block ``b""`` so that the reference size budget
``naive_rle_bytes = 2 * count_runs * 8`` (v:2744-2762, word_size=8 at v:2735)
is met with equality at zero.  RLE stores ``counts - 1`` (counts are proven
positive, v:247-255) so the worst case — all runs length 1, ``no_compression_worst``
v:562-590 — packs its count plane in zero bytes.

Size accounting is *exact*: ``codec_sizes`` computes, from cheap stats, the
byte length each encoder would produce, and the selector's choice is the argmin
— so the invariant ``len(encode_auto(a)) <= naive_rle_bytes(a)`` is provable
(RLE is always a candidate; see tests/test_blocks.py).
"""

from __future__ import annotations

import numpy as np

from rlv.kernels import rle
from rlv.kernels.bitpack import (
    add_min_i64,
    deltas_u64,
    pack_bits,
    packed_nbytes,
    read_uvarint,
    unpack_bits,
    unzigzag,
    uvarint_len,
    write_uvarint,
    zigzag,
)

PLAIN = 1
RLE = 2
BITPACK = 3
FOR = 4
DICT = 5
FSST = 6      # raw FSST blob (one byte payload)
STRDICT = 7   # string column: dict indices + FSST-compressed dictionary
DELTA = 8     # svarint first | bits u8 | pack(zigzag(successive diffs))
NULLW = 10    # validity wrapper: uvarint n_rows | uvarint n_valid
#               | bitmap ceil(n_rows/8) bytes (LSB-first, 1 = valid)
#               | inner block over the n_valid non-NULL values

CODEC_NAMES = {0: "empty", PLAIN: "plain", RLE: "rle", BITPACK: "bitpack",
               FOR: "for", DICT: "dict", FSST: "fsst", STRDICT: "strdict",
               DELTA: "delta", NULLW: "nullw"}

# Integer codecs the auto-selector considers for a token array, in
# deterministic tie-break order (lower id wins ties -> identical blocks on
# every executor, the determinism law SURVEY §2.9 #54 requires).
INT_CODECS = (PLAIN, RLE, BITPACK, FOR, DICT, DELTA)


def _storage_bits(max_delta: int) -> int:
    """Bits to store values in [0, max_delta]; 0 encodes the constant column.

    ``bits_required`` (v:3038-3039) maps 0 -> 1 for its information-theoretic
    reading; for storage the constant plane needs no payload at all.
    """
    max_delta = int(max_delta)
    if max_delta < 0:
        raise ValueError("negative delta")
    return max_delta.bit_length()


def naive_rle_bytes(n_runs: int) -> int:
    """The reference naive-RLE size budget: 2 words/run, word_size=8
    (``encode_space_usage``/``run_memory_size``, v:2735-2762)."""
    return 16 * int(n_runs)


def _svarint(out: bytearray, n: int) -> None:
    write_uvarint(out, zigzag(n))


def _read_svarint(buf: bytes, pos: int) -> tuple[int, int]:
    z, pos = read_uvarint(buf, pos)
    return unzigzag(z), pos


# ---------------------------------------------------------------------------
# Encoders (array -> bytes).  All exact-integer; no float paths anywhere.
# ---------------------------------------------------------------------------


def encode_plain(a: np.ndarray) -> bytes:
    a = np.asarray(a)
    if a.size == 0:
        return b""
    width = 8 if (int(a.max()) > 2**31 - 1 or int(a.min()) < -(2**31)) else 4
    out = bytearray([PLAIN])
    write_uvarint(out, a.size)
    out.append(width)
    dt = np.dtype("<i8") if width == 8 else np.dtype("<i4")
    out += a.astype(dt, copy=False).tobytes()
    return bytes(out)


def encode_rle(a: np.ndarray) -> bytes:
    a = np.asarray(a)
    if a.size == 0:
        return b""
    counts, values = rle.rle_encode(a)
    return encode_rle_runs(counts, values)


def encode_rle_runs(counts: np.ndarray, values: np.ndarray) -> bytes:
    """Serialize a well-formed run list (counts > 0)."""
    if counts.size == 0:
        return b""
    min_val = int(values.min())
    cbits = _storage_bits(int(counts.max()) - 1)
    vbits = _storage_bits(int(values.max()) - min_val)
    out = bytearray([RLE])
    write_uvarint(out, counts.size)
    _svarint(out, min_val)
    out.append(cbits)
    out.append(vbits)
    out += pack_bits(counts.astype(np.uint64) - np.uint64(1), cbits)
    out += pack_bits(deltas_u64(values, min_val), vbits)
    return bytes(out)


def encode_bitpack(a: np.ndarray) -> bytes:
    a = np.asarray(a)
    if a.size == 0:
        return b""
    if int(a.min()) < 0:
        raise ValueError("bitpack requires nonnegative values (use FOR)")
    bits = _storage_bits(int(a.max()))
    out = bytearray([BITPACK])
    write_uvarint(out, a.size)
    out.append(bits)
    out += pack_bits(a, bits)
    return bytes(out)


def encode_for(a: np.ndarray) -> bytes:
    """Frame-of-reference: subtract min, bit-pack the deltas (width via the
    reference's ``bits_required`` ceil-log2 model, v:3038-3039)."""
    a = np.asarray(a)
    if a.size == 0:
        return b""
    min_val = int(a.min())
    bits = _storage_bits(int(a.max()) - min_val)
    out = bytearray([FOR])
    write_uvarint(out, a.size)
    _svarint(out, min_val)
    out.append(bits)
    out += pack_bits(deltas_u64(a, min_val), bits)
    return bytes(out)


def encode_dict(a: np.ndarray) -> bytes:
    """Dictionary: sorted-unique dictionary (FOR-packed) + bit-packed indices.

    ``np.unique`` sorts, so the block is deterministic — the uniqueness law
    (v:1524-1538) generalized to the dict codec for idempotent retries.
    """
    a = np.asarray(a)
    if a.size == 0:
        return b""
    uniq, inv = np.unique(a, return_inverse=True)
    return encode_dict_from_unique(a.size, uniq, inv)


def encode_dict_from_unique(n: int, uniq: np.ndarray, inv: np.ndarray) -> bytes:
    """DICT block from a precomputed sorted-unique dictionary + indices
    (the engine's batch stats sweep already produces these as a byproduct)."""
    dict_min = int(uniq.min())
    dbits = _storage_bits(int(uniq.max()) - dict_min)
    ibits = _storage_bits(uniq.size - 1)
    out = bytearray([DICT])
    write_uvarint(out, n)
    write_uvarint(out, uniq.size)
    _svarint(out, dict_min)
    out.append(dbits)
    out += pack_bits(deltas_u64(uniq, dict_min), dbits)
    out.append(ibits)
    out += pack_bits(inv, ibits)
    return bytes(out)


def _zigzag_diffs_u64(a64: np.ndarray) -> np.ndarray:
    """Zigzagged successive differences of an int64 array, as uint64.

    Arithmetic is two's-complement mod 2^64 on purpose: a delta that
    overflows int64 wraps here AND unwraps identically in the decode cumsum,
    so the codec stays exact for the full int64 value domain (the wrapped
    zigzag is just wide, and the size model prices that same wide value).
    """
    d = np.diff(a64)
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def encode_delta(a: np.ndarray) -> bytes:
    """Delta: first value + bit-packed zigzag diffs — the sorted/clustered
    column codec (keys, timestamps); beyond the reference's codec set, priced
    by the same exact-size selector.  Public analog: Parquet's
    DELTA_BINARY_PACKED (ours is single-block with one fixed bit width so
    the size stays exactly computable from chunk stats)."""
    a = np.asarray(a)
    if a.size == 0:
        return b""
    a64 = a.astype(np.int64)
    zz = _zigzag_diffs_u64(a64)
    bits = _storage_bits(int(zz.max())) if zz.size else 0
    out = bytearray([DELTA])
    write_uvarint(out, a.size)
    _svarint(out, int(a64[0]))
    out.append(bits)
    out += pack_bits(zz, bits)
    return bytes(out)


_ENCODERS = {PLAIN: encode_plain, RLE: encode_rle, BITPACK: encode_bitpack,
             FOR: encode_for, DICT: encode_dict, DELTA: encode_delta}


def encode_with(codec: int, a: np.ndarray) -> bytes:
    return _ENCODERS[codec](a)


# ---------------------------------------------------------------------------
# Validity (NULL) plane: a bit-packed wrapper around any inner block.
#
# The reference's codecs are over TOTAL values (the generic-A section,
# rl_encoding.v:2145-2486 has no bottom element); real nullable columns add a
# validity plane orthogonal to value encoding — Arrow's validity-bitmap split,
# applied per block.  A block with zero NULLs is written WITHOUT the wrapper,
# so non-null data stays byte-identical to the unwrapped format (and the
# byte-determinism drills keep their recorded hashes).
# ---------------------------------------------------------------------------


def nullable_overhead(n_rows: int, n_valid: int) -> int:
    """Exact extra bytes the NULLW wrapper adds around an inner block —
    priced into the selector and the SQL oracles the same way codec sizes
    are: ``len(wrap_nullable(m, inner)) == nullable_overhead(...) +
    len(inner)`` for every mask (tested)."""
    return 1 + uvarint_len(n_rows) + uvarint_len(n_valid) + (n_rows + 7) // 8


def wrap_nullable(validity: np.ndarray, inner: bytes) -> bytes:
    """NULLW block from a boolean validity mask (True = valid) and the inner
    block encoding the valid values only.  The caller encodes ``a[validity]``
    with the auto-selected codec; the wrapper stores where they go."""
    validity = np.asarray(validity, dtype=bool)
    n_rows = validity.size
    n_valid = int(validity.sum())
    out = bytearray([NULLW])
    write_uvarint(out, n_rows)
    write_uvarint(out, n_valid)
    out += np.packbits(validity, bitorder="little").tobytes()
    out += inner
    return bytes(out)


def parse_nullable(block: bytes) -> tuple[int, int, np.ndarray, bytes]:
    """Split a NULLW block into (n_rows, n_valid, validity mask, inner block),
    validating the bitmap against the declared counts before any payload is
    touched (corrupt-header discipline of ``decode_blocks_batch``)."""
    if not block or block[0] != NULLW:
        raise ValueError("not a NULLW block")
    pos = 1
    n_rows, pos = read_uvarint(block, pos)
    n_valid, pos = read_uvarint(block, pos)
    nb = (n_rows + 7) // 8
    if len(block) < pos + nb or n_valid > n_rows:
        raise ValueError("corrupt NULLW block: truncated bitmap")
    bitmap = np.frombuffer(block, dtype=np.uint8, count=nb, offset=pos)
    validity = np.unpackbits(bitmap, count=n_rows, bitorder="little").astype(bool)
    if int(validity.sum()) != n_valid:
        raise ValueError("corrupt NULLW block: bitmap popcount != n_valid")
    return n_rows, n_valid, validity, block[pos + nb:]


def decode_nullable_block(block: bytes, dtype=np.int64):
    """Scalar reference decode: (values with 0 at NULL slots, validity mask).
    Plain (unwrapped) blocks decode as all-valid."""
    if len(block) == 0:
        return np.empty(0, dtype=dtype), np.empty(0, dtype=bool)
    if block[0] != NULLW:
        vals = decode_block(block, dtype)
        return vals, np.ones(vals.size, dtype=bool)
    n_rows, n_valid, validity, inner = parse_nullable(block)
    valid_vals = decode_block(inner, dtype)
    if valid_vals.size != n_valid:
        raise ValueError("corrupt NULLW block: inner size != n_valid")
    out = np.zeros(n_rows, dtype=dtype)
    out[validity] = valid_vals
    return out, validity


def decode_blocks_batch_nullable(
    blobs, dtype=np.int64, expected=None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched nullable decode: (values, offsets, validity).

    ``offsets`` is row-based (``expected`` rows per doc, NULL slots
    included); ``values`` holds 0 at NULL slots and ``validity`` marks the
    real ones.  NULLW wrappers are stripped in one cheap parse pass and the
    inner blocks ride the ordinary vectorized ``decode_blocks_batch`` —
    unwrapped blobs pay nothing.
    """
    n_docs = len(blobs)
    expected_arr = (
        None if expected is None else np.asarray(expected, dtype=np.int64)
    )
    inner_blobs = list(blobs)
    inner_expected = (
        None if expected_arr is None else expected_arr.copy()
    )
    masks: dict[int, np.ndarray] = {}
    rows_per = np.zeros(n_docs, dtype=np.int64)
    for i, b in enumerate(blobs):
        if b is not None and len(b) and b[0] == NULLW:
            n_rows, n_valid, validity, inner = parse_nullable(bytes(b))
            if expected_arr is not None and n_rows != int(expected_arr[i]):
                raise ValueError(
                    f"corrupt NULLW block: declared {n_rows} rows, expected "
                    f"{int(expected_arr[i])}"
                )
            masks[i] = validity
            inner_blobs[i] = inner
            rows_per[i] = n_rows
            if inner_expected is not None:
                inner_expected[i] = n_valid
        elif expected_arr is not None:
            rows_per[i] = int(expected_arr[i])
    flat, val_offs = decode_blocks_batch(
        inner_blobs, dtype, expected=inner_expected
    )
    if expected_arr is None:  # row counts only known post-decode
        val_counts = np.diff(val_offs)
        for i, m in masks.items():
            rows_per[i] = m.size
        no_mask = np.ones(n_docs, dtype=bool)
        if masks:
            no_mask[list(masks)] = False
        rows_per[no_mask] = val_counts[no_mask]
    if not masks:
        return flat, val_offs, np.ones(flat.size, dtype=bool)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(rows_per, out=offsets[1:])
    validity = np.ones(offsets[-1], dtype=bool)
    for i, m in masks.items():
        validity[offsets[i]:offsets[i + 1]] = m
    out = np.zeros(offsets[-1], dtype=dtype)
    out[validity] = flat
    return out, offsets, validity


# ---------------------------------------------------------------------------
# Decoder (bytes -> array) — single dispatch point, used by the verify pass.
# ---------------------------------------------------------------------------


def decode_block(block: bytes, dtype=np.int32) -> np.ndarray:
    if len(block) == 0:
        return np.empty(0, dtype=dtype)
    codec = block[0]
    pos = 1
    if codec == PLAIN:
        n, pos = read_uvarint(block, pos)
        width = block[pos]
        pos += 1
        dt = np.dtype("<i8") if width == 8 else np.dtype("<i4")
        return np.frombuffer(block, dtype=dt, count=n, offset=pos).astype(dtype)
    if codec == RLE:
        counts, values = _rle_runs(block)
        return rle.rle_decode(counts, values).astype(dtype)
    if codec == BITPACK:
        n, pos = read_uvarint(block, pos)
        bits = block[pos]
        pos += 1
        return unpack_bits(block[pos:], n, bits).astype(dtype)
    if codec == FOR:
        n, pos = read_uvarint(block, pos)
        min_val, pos = _read_svarint(block, pos)
        bits = block[pos]
        pos += 1
        return add_min_i64(
            unpack_bits(block[pos:], n, bits, dtype=np.uint64), min_val
        ).astype(dtype)
    if codec == DICT:
        n, pos = read_uvarint(block, pos)
        ndv, pos = read_uvarint(block, pos)
        dict_min, pos = _read_svarint(block, pos)
        dbits = block[pos]
        pos += 1
        dbytes = packed_nbytes(ndv, dbits)
        uniq = add_min_i64(
            unpack_bits(block[pos:pos + dbytes], ndv, dbits, dtype=np.uint64),
            dict_min,
        )
        pos += dbytes
        ibits = block[pos]
        pos += 1
        idx = unpack_bits(block[pos:], n, ibits)
        return uniq[idx].astype(dtype)
    if codec == DELTA:
        n, pos = read_uvarint(block, pos)
        first, pos = _read_svarint(block, pos)
        bits = block[pos]
        pos += 1
        zz = unpack_bits(block[pos:], n - 1, bits, dtype=np.uint64)
        d = (zz >> np.uint64(1)) ^ (np.uint64(0) - (zz & np.uint64(1)))
        arr = np.empty(n, dtype=np.uint64)
        arr[0] = np.uint64(first & ((1 << 64) - 1))
        arr[1:] = d
        # mod-2^64 cumsum inverts the (possibly wrapped) zigzag diffs exactly
        return np.cumsum(arr).view(np.int64).astype(dtype)
    raise ValueError(f"unknown codec id {codec}")


def _rle_runs(block: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Parse an RLE block into its run list ``(counts, values)`` WITHOUT
    expanding the rows — the parse half of ``decode_block``'s RLE branch,
    shared with :func:`agg_block` which aggregates the runs directly."""
    pos = 1
    n_runs, pos = read_uvarint(block, pos)
    min_val, pos = _read_svarint(block, pos)
    cbits = block[pos]
    vbits = block[pos + 1]
    pos += 2
    cbytes = packed_nbytes(n_runs, cbits)
    counts = unpack_bits(block[pos:pos + cbytes], n_runs, cbits) + 1
    pos += cbytes
    vbytes = packed_nbytes(n_runs, vbits)
    values = add_min_i64(
        unpack_bits(block[pos:pos + vbytes], n_runs, vbits, dtype=np.uint64),
        min_val,
    )
    return counts, values


def exact_sum_i64(vals: np.ndarray) -> int:
    """Exact Python-int sum of an int64 array over the FULL domain.

    The fast path is a plain int64 ``np.sum``, taken whenever the zone bound
    ``max|value| * n`` keeps every partial sum inside int64.  Near the edge
    the array splits into 32-bit planes whose int64 partial sums cannot wrap
    (low plane < 2^32 so its sum < n*2^32; high plane in [-2^31, 2^31)), so
    the recombined Python int is exact with no object-dtype walk.  Callers
    keep accumulating across blocks in Python ints, where overflow does not
    exist."""
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = vals.size
    if n == 0:
        return 0
    if n >= 2**31:  # plane partial sums could wrap; no real block is this big
        return int(sum(vals.tolist()))
    m = max(abs(int(vals.min())), abs(int(vals.max())))
    if m * n < 2**63:
        return int(vals.sum(dtype=np.int64))
    hi = vals >> np.int64(32)            # arithmetic shift: signed high plane
    lo = vals & np.int64(0xFFFFFFFF)     # nonnegative low plane
    return (int(hi.sum(dtype=np.int64)) << 32) + int(lo.sum(dtype=np.int64))


def _exact_run_dot(counts: np.ndarray, values: np.ndarray) -> int:
    """Exact sum of the rows an RLE run list expands to: dot(counts, values)
    without materializing the expansion.  Every partial sum is bounded by
    n_rows * max|value|, so the int64 dot is safe under the same zone bound
    ``exact_sum_i64`` uses; otherwise the (short) run list walks in Python
    ints."""
    n_rows = int(counts.sum())
    m = max(abs(int(values.min())), abs(int(values.max())))
    if m * n_rows < 2**63:
        return int(np.dot(counts.astype(np.int64), values))
    return sum(int(c) * int(v) for c, v in zip(counts.tolist(), values.tolist()))


def agg_block(block: bytes) -> tuple[int, int, int, int | None, int | None]:
    """Exact ``(n_rows, n_valid, sum, min, max)`` of one int block's VALID
    values — aggregation pushed INTO the compressed format.

    An RLE block aggregates its run list directly (``sum = dot(counts,
    values)``, min/max over the run values) so the expanded rows never
    materialize — the compute-over-compressed identity an RLE engine exists
    for (the run list is the sufficient statistic; cf. the reference's
    run-frequency/space analyses over runs, rl_encoding.v:2735-2762, which
    never expand either).  A NULLW wrapper contributes its counts and defers
    to the inner block, whose values are exactly the valid ones.  Other
    codecs decode (vectorized) and aggregate; sums are exact over the full
    int64 domain via :func:`exact_sum_i64`."""
    if len(block) == 0:
        return 0, 0, 0, None, None
    codec = block[0]
    if codec == NULLW:
        n_rows, n_valid, _, inner = parse_nullable(block)
        in_rows, _, s, mn, mx = agg_block(inner)
        if in_rows != n_valid:
            raise ValueError("corrupt NULLW block: inner size != n_valid")
        return n_rows, n_valid, s, mn, mx
    if codec == RLE:
        counts, values = _rle_runs(block)
        n = int(counts.sum())
        return (n, n, _exact_run_dot(counts, values),
                int(values.min()), int(values.max()))
    vals = decode_block(block, np.int64)
    if vals.size == 0:
        return 0, 0, 0, None, None
    return (vals.size, vals.size, exact_sum_i64(vals),
            int(vals.min()), int(vals.max()))


def distinct_block_values(block: bytes) -> np.ndarray:
    """Sorted distinct VALID int64 values of one block — DISTINCT pushed
    INTO the codec, sibling of :func:`agg_block`.

    An RLE block uniques its run-value plane directly (the run list is the
    sufficient statistic; the expanded rows never materialize — the same
    compute-over-compressed identity the reference's run analyses rest on,
    rl_encoding.v:2735-2762).  A DICT block's dictionary plane IS its sorted
    distinct set by construction (``np.unique`` output; every entry is
    referenced), so only the dictionary bits unpack and the index plane is
    never read.  A NULLW wrapper defers to its inner block, whose values
    are exactly the valid ones.  The remaining codecs (PLAIN/BITPACK/FOR/
    DELTA) decode vectorized and unique."""
    if len(block) == 0:
        return np.empty(0, np.int64)
    codec = block[0]
    if codec == NULLW:
        _, _, _, inner = parse_nullable(block)
        return distinct_block_values(inner)
    if codec == RLE:
        _, values = _rle_runs(block)
        return np.unique(values.astype(np.int64))
    if codec == DICT:
        pos = 1
        _, pos = read_uvarint(block, pos)
        ndv, pos = read_uvarint(block, pos)
        dict_min, pos = _read_svarint(block, pos)
        dbits = block[pos]
        pos += 1
        dbytes = packed_nbytes(ndv, dbits)
        return add_min_i64(
            unpack_bits(block[pos:pos + dbytes], ndv, dbits,
                        dtype=np.uint64),
            dict_min,
        ).astype(np.int64)
    return np.unique(decode_block(block, np.int64))


# ---------------------------------------------------------------------------
# Batched decode: many blocks -> one flat array + offsets.  Same wire format,
# vectorized across documents: per-doc work drops to header parsing; all bit
# unpacking, min-adds, dict gathers and run expansion happen in whole-group
# numpy ops.  Byte-identical to per-doc decode_block (tested).
# ---------------------------------------------------------------------------

_U64_63 = np.uint64(63)
_U64_6 = np.uint64(6)


def _unpack_multi(buf: bytes, byte_offs: np.ndarray, ns: np.ndarray, bits: int) -> np.ndarray:
    """Unpack concatenated per-doc bit-packed planes of one bit width.

    ``buf`` is the concatenation of each doc's (byte-padded) payload;
    ``byte_offs[i]`` is doc i's payload start, ``ns[i]`` its value count.
    Returns all values doc-major as uint64.
    """
    total = int(ns.sum())
    if total == 0 or bits == 0:
        return np.zeros(total, dtype=np.uint64)
    if bits in (8, 16, 32, 64):
        # byte widths pad to exactly n*bits/8, so the concat is gap-free
        return np.frombuffer(buf, dtype=f"<u{bits // 8}", count=total).astype(np.uint64)
    padded = buf + b"\x00" * 16
    words = np.frombuffer(padded, dtype="<u8", count=len(padded) // 8)
    local_off = np.cumsum(ns) - ns
    within = (
        np.arange(total, dtype=np.int64) - np.repeat(local_off, ns)
    ).astype(np.uint64)
    bitpos = (
        np.repeat(byte_offs.astype(np.uint64) << np.uint64(3), ns)
        + within * np.uint64(bits)
    )
    w = (bitpos >> _U64_6).astype(np.int64)
    off = bitpos & _U64_63
    lo = words[w] >> off
    # only values straddling a word boundary (off + bits > 64) need the next
    # word — a minority for narrow widths, so gather it for just those
    # instead of materializing a full second gather + where()
    need_hi = off > np.uint64(64 - bits)
    if need_hi.any():
        idx = np.flatnonzero(need_hi)
        off_hi = off[idx]
        lo[idx] |= words[w[idx] + 1] << ((np.uint64(64) - off_hi) & _U64_63)
    return lo & np.uint64((1 << bits) - 1)


def _plane_groups(items):
    """Group (bits, payload, n, min) plane records by bit width and unpack
    each group in one call; yields per-record uint64 arrays, doc-major."""
    by_bits: dict[int, list[int]] = {}
    for i, it in enumerate(items):
        by_bits.setdefault(it[0], []).append(i)
    out: list[np.ndarray | None] = [None] * len(items)
    for bits, idxs in by_bits.items():
        ns = np.array([items[i][2] for i in idxs], dtype=np.int64)
        payloads = [items[i][1] for i in idxs]
        sizes = np.array([len(p) for p in payloads], dtype=np.int64)
        byte_offs = np.cumsum(sizes) - sizes
        vals = _unpack_multi(b"".join(payloads), byte_offs, ns, bits)
        local = np.cumsum(ns) - ns
        for k, i in enumerate(idxs):
            out[i] = vals[local[k]:local[k] + ns[k]]
    return out


def _add_min_multi(vals_u64: np.ndarray, mins: list[int], ns: np.ndarray) -> np.ndarray:
    m = np.array([int(v) & ((1 << 64) - 1) for v in mins], dtype=np.uint64)
    return (vals_u64 + np.repeat(m, ns)).view(np.int64)


def decode_blocks_batch(
    blobs, dtype=np.int32, expected=None
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a sequence of blocks into (flat_values, offsets).

    ``offsets`` has len(blobs)+1 entries; doc i decodes to
    ``flat[offsets[i]:offsets[i+1]]``.  Every blob's length is validated
    against its header BEFORE any payload is touched, so a truncated block
    raises instead of misaligning its neighbours in the batch.

    ``expected`` (optional per-doc decoded sizes) is the decode-memory budget
    of ``safe_decode_with_limit`` (rl_encoding.v:5034-5069): declared sizes
    are checked against it BEFORE any output is allocated, so a forged header
    claiming 10^15 values raises instead of attempting the allocation.
    """
    n_docs = len(blobs)
    if expected is not None:
        expected = np.asarray(expected, dtype=np.int64)
        if expected.size != n_docs:
            raise ValueError("expected sizes must match the number of blobs")

    def check_n(i: int, n: int) -> None:
        if expected is not None and n != int(expected[i]):
            raise ValueError(
                f"corrupt block: declared {n} values, expected {int(expected[i])}"
            )
    # parse pass: (codec, n, fields...) per doc + per-doc payload slices
    parsed: list[tuple] = []
    n_per = np.zeros(n_docs, dtype=np.int64)
    for i in range(n_docs):
        b = blobs[i]
        if b is None or len(b) == 0:
            check_n(i, 0)
            parsed.append((0,))
            continue
        codec = b[0]
        pos = 1
        if codec == PLAIN:
            n, pos = read_uvarint(b, pos)
            check_n(i, n)
            width = b[pos]
            pos += 1
            end = pos + width * n
            if width not in (4, 8) or len(b) != end:
                raise ValueError("corrupt PLAIN block")
            parsed.append((PLAIN, n, width, b[pos:end]))
        elif codec == RLE:
            n_runs, pos = read_uvarint(b, pos)
            if expected is not None and n_runs > int(expected[i]):
                # counts are >= 1 each, so more runs than the expected size
                # is corrupt — and this bound is what caps the allocation
                raise ValueError(
                    f"corrupt RLE block: {n_runs} runs > expected size"
                )
            min_val, pos = _read_svarint(b, pos)
            cbits, vbits = b[pos], b[pos + 1]
            pos += 2
            cb = packed_nbytes(n_runs, cbits)
            vb = packed_nbytes(n_runs, vbits)
            if cbits > 64 or vbits > 64 or len(b) != pos + cb + vb:
                raise ValueError("corrupt RLE block")
            parsed.append(
                (RLE, n_runs, min_val, cbits, vbits,
                 b[pos:pos + cb], b[pos + cb:pos + cb + vb])
            )
            n = -1  # filled after counts are unpacked
        elif codec == BITPACK:
            n, pos = read_uvarint(b, pos)
            check_n(i, n)
            bits = b[pos]
            pos += 1
            if bits > 64 or len(b) != pos + packed_nbytes(n, bits):
                raise ValueError("corrupt BITPACK block")
            parsed.append((BITPACK, n, bits, b[pos:]))
        elif codec == FOR:
            n, pos = read_uvarint(b, pos)
            check_n(i, n)
            min_val, pos = _read_svarint(b, pos)
            bits = b[pos]
            pos += 1
            if bits > 64 or len(b) != pos + packed_nbytes(n, bits):
                raise ValueError("corrupt FOR block")
            parsed.append((FOR, n, min_val, bits, b[pos:]))
        elif codec == DICT:
            n, pos = read_uvarint(b, pos)
            check_n(i, n)
            ndv, pos = read_uvarint(b, pos)
            if ndv > n:  # more dictionary entries than values is corrupt,
                # and (with dbits=0) would otherwise drive a huge allocation
                raise ValueError("corrupt DICT block: ndv > n")
            dict_min, pos = _read_svarint(b, pos)
            dbits = b[pos]
            pos += 1
            db = packed_nbytes(ndv, dbits)
            ibits = b[pos + db]
            ib = packed_nbytes(n, ibits)
            if dbits > 64 or ibits > 64 or len(b) != pos + db + 1 + ib:
                raise ValueError("corrupt DICT block")
            parsed.append(
                (DICT, n, ndv, dict_min, dbits, ibits,
                 b[pos:pos + db], b[pos + db + 1:])
            )
        elif codec == DELTA:
            n, pos = read_uvarint(b, pos)
            check_n(i, n)
            if n == 0:
                raise ValueError("corrupt DELTA block: zero values")
            first, pos = _read_svarint(b, pos)
            bits = b[pos]
            pos += 1
            if bits > 64 or len(b) != pos + packed_nbytes(n - 1, bits):
                raise ValueError("corrupt DELTA block")
            parsed.append((DELTA, n, first, bits, b[pos:]))
        else:
            raise ValueError(f"unknown codec id {codec}")
        if codec != RLE:
            n_per[i] = n
    # RLE needs counts before n is known: unpack the count planes first
    rle_docs = [i for i in range(n_docs) if parsed[i][0] == RLE]
    rle_counts: dict[int, np.ndarray] = {}
    if rle_docs:
        planes = [(parsed[i][3], parsed[i][5], parsed[i][1], 0) for i in rle_docs]
        for i, cvals in zip(rle_docs, _plane_groups(planes)):
            counts = cvals.view(np.int64) + 1
            rle_counts[i] = counts
            n_per[i] = int(counts.sum())
            check_n(i, int(n_per[i]))
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_per, out=offsets[1:])
    # decode straight into the caller's dtype: int32 halves every scatter's
    # write traffic and kills the final whole-array cast (values fit by
    # encode construction; corrupt data wraps identically either way)
    out = np.empty(offsets[-1], dtype=dtype)

    def scatter(docs: list[int], flat: np.ndarray) -> None:
        ns = n_per[docs]
        local = np.cumsum(ns) - ns
        # one fused repeat of the per-doc shift instead of two full-size ones
        tgt = np.arange(flat.size, dtype=np.int64) + np.repeat(
            offsets[docs] - local, ns
        )
        out[tgt] = flat

    by_codec: dict[int, list[int]] = {}
    for i in range(n_docs):
        c = parsed[i][0]
        if c and n_per[i]:
            by_codec.setdefault(c, []).append(i)

    for codec, docs in by_codec.items():
        ns = n_per[docs]
        if codec == PLAIN:
            flats = []
            for i in docs:
                _, n, width, pay = parsed[i]
                dt = np.dtype("<i8") if width == 8 else np.dtype("<i4")
                flats.append(np.frombuffer(pay, dtype=dt, count=n).astype(np.int64))
            scatter(docs, np.concatenate(flats))
        elif codec == RLE:
            vplanes = [(parsed[i][4], parsed[i][6], parsed[i][1], 0) for i in docs]
            vals_u64 = np.concatenate(_plane_groups(vplanes))
            runs_per = np.array([parsed[i][1] for i in docs], dtype=np.int64)
            values = _add_min_multi(
                vals_u64, [parsed[i][2] for i in docs], runs_per
            )
            counts = np.concatenate([rle_counts[i] for i in docs])
            # cast at RUN granularity, before the token-granular expansion
            values = values.astype(out.dtype, copy=False)
            scatter(docs, np.repeat(values, counts))
        elif codec == BITPACK:
            planes = [(parsed[i][2], parsed[i][3], parsed[i][1], 0) for i in docs]
            flat = np.concatenate(_plane_groups(planes)).view(np.int64)
            scatter(docs, flat)
        elif codec == FOR:
            planes = [(parsed[i][3], parsed[i][4], parsed[i][1], 0) for i in docs]
            flat_u64 = np.concatenate(_plane_groups(planes))
            scatter(docs, _add_min_multi(flat_u64, [parsed[i][2] for i in docs], ns))
        elif codec == DICT:
            dplanes = [(parsed[i][4], parsed[i][6], parsed[i][2], 0) for i in docs]
            ndvs = np.array([parsed[i][2] for i in docs], dtype=np.int64)
            uniq = _add_min_multi(
                np.concatenate(_plane_groups(dplanes)),
                [parsed[i][3] for i in docs],
                ndvs,
            )
            iplanes = [(parsed[i][5], parsed[i][7], parsed[i][1], 0) for i in docs]
            idx = np.concatenate(_plane_groups(iplanes)).view(np.int64)
            if idx.size:
                limit = np.repeat(ndvs, ns)
                # ibits=64 indices can view to NEGATIVE int64 — those are just
                # as corrupt as too-large ones and must not wrap via Python
                # negative indexing into the wrong dictionary entry
                if ((idx < 0) | (idx >= limit)).any():
                    raise ValueError("corrupt DICT block: index out of range")
            dict_off = np.cumsum(ndvs) - ndvs
            # cast at DICTIONARY granularity, before the per-token gather
            uniq = uniq.astype(out.dtype, copy=False)
            scatter(docs, uniq[idx + np.repeat(dict_off, ns)])
        elif codec == DELTA:
            # unpack all diff planes, interleave each doc's first value at
            # its segment start, then ONE mod-2^64 cumsum with the
            # cumsum-at-segment-start subtraction — wraparound cancels, so
            # the whole-group reconstruction is exact for any int64 values
            planes = [(parsed[i][3], parsed[i][4], parsed[i][1] - 1, 0)
                      for i in docs]
            zz = np.concatenate(_plane_groups(planes))
            d = (zz >> np.uint64(1)) ^ (np.uint64(0) - (zz & np.uint64(1)))
            total = int(ns.sum())
            arr = np.empty(total, dtype=np.uint64)
            starts = np.cumsum(ns) - ns
            firsts = np.array(
                [parsed[i][2] & ((1 << 64) - 1) for i in docs],
                dtype=np.uint64,
            )
            nonstart = np.ones(total, dtype=bool)
            nonstart[starts] = False
            arr[starts] = firsts
            arr[nonstart] = d
            g = np.cumsum(arr)
            seg_base = g[starts] - arr[starts]
            vals = (g - np.repeat(seg_base, ns)).view(np.int64)
            scatter(docs, vals.astype(out.dtype, copy=False))
        else:  # pragma: no cover
            raise ValueError(f"unknown codec id {codec}")
    return out, offsets


# ---------------------------------------------------------------------------
# String columns: dictionary indices + FSST-compressed dictionary payload.
# The classic composition (dict first, FSST only over the ndv unique strings)
# keeps the per-byte symbol matching off the hot path — it touches the
# dictionary, never the n rows.
# ---------------------------------------------------------------------------


def encode_strings(values, symbols: list[bytes] | None = None) -> bytes:
    """Encode a string/bytes column chunk: STRDICT block.

    Layout: STRDICT | uvarint n | uvarint ndv | ibits u8 | pack(indices)
            | lbits u8 | pack(dict string lengths) | uvarint blob_len
            | FSST blob of the concatenated dictionary payload.

    ``values`` may be a Python sequence (strings/bytes) or a pyarrow
    binary/string Array/ChunkedArray — the Arrow path is the data plane's:
    dictionary-encode, dictionary sort, and code remap all run as Arrow C++
    kernels, no per-row Python.  The dictionary is the SORTED unique values
    (bytewise-lexicographic, exactly ``np.unique``'s order), so blocks stay
    byte-identical across code paths and versions.

    With ``symbols`` (a corpus-trained FSST table, e.g. from
    :func:`rlv.engine_files.sample_pass`), the blob references the shared
    table instead of training on and embedding a per-chunk one: chunk blocks
    shrink by the table bytes, encode skips the per-chunk training pass, and
    equal payloads encode identically in every chunk.  Decode then needs the
    same table (:func:`decode_strings` ``symbols=``) — corpus metadata, kept
    in the dataset manifest.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from rlv.kernels import fsst

    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(
            [
                v.encode("utf-8") if isinstance(v, str) else bytes(v)
                for v in values
            ],
            pa.binary(),
        )
    if len(arr) == 0:
        return b""
    if arr.null_count:
        raise ValueError(
            "STRDICT stores values, not validity: filter or fill NULLs "
            "before encoding"
        )
    if not pa.types.is_binary(arr.type):
        arr = arr.cast(pa.binary())
    denc = arr.dictionary_encode()
    dic = denc.dictionary
    sort_idx = pc.sort_indices(dic).to_numpy().astype(np.int64)
    rank = np.empty(sort_idx.size, dtype=np.int64)
    rank[sort_idx] = np.arange(sort_idx.size, dtype=np.int64)
    inv = rank[denc.indices.to_numpy().astype(np.int64)]
    uniq = dic.take(pa.array(sort_idx))
    ndv = len(uniq)
    u_offs = np.frombuffer(uniq.buffers()[1], dtype=np.int32, count=ndv + 1,
                           offset=4 * uniq.offset)
    lengths = np.diff(u_offs.astype(np.int64))
    payload = uniq.buffers()[2].to_pybytes()[u_offs[0]:u_offs[-1]]
    ibits = _storage_bits(ndv - 1)
    lbits = _storage_bits(int(lengths.max()) if lengths.size else 0)
    blob = (
        fsst.compress(payload)
        if symbols is None
        else fsst.compress(payload, symbols, embed_table=False)
    )
    out = bytearray([STRDICT])
    write_uvarint(out, len(arr))
    write_uvarint(out, ndv)
    out.append(ibits)
    out += pack_bits(inv, ibits)
    out.append(lbits)
    out += pack_bits(lengths, lbits)
    write_uvarint(out, len(blob))
    out += blob
    return bytes(out)


def decode_strings_arrow(block: bytes, symbols: list[bytes] | None = None):
    """Decode a STRDICT block to a pyarrow binary Array — the dictionary is
    materialized zero-copy from (payload buffer, offsets) and the per-row
    gather is Arrow ``take``, so no Python object is built per value (the
    vectorization the verify/decode hot paths run on)."""
    import pyarrow as pa

    from rlv.kernels import fsst

    if len(block) == 0:
        return pa.array([], pa.binary())
    if block[0] != STRDICT:
        raise ValueError(f"not a STRDICT block (codec {block[0]})")
    pos = 1
    n, pos = read_uvarint(block, pos)
    ndv, pos = read_uvarint(block, pos)
    ibits = block[pos]
    pos += 1
    nb = packed_nbytes(n, ibits)
    idx = unpack_bits(block[pos:pos + nb], n, ibits)
    pos += nb
    lbits = block[pos]
    pos += 1
    nb = packed_nbytes(ndv, lbits)
    lengths = unpack_bits(block[pos:pos + nb], ndv, lbits)
    pos += nb
    blob_len, pos = read_uvarint(block, pos)
    payload = fsst.decompress(block[pos:pos + blob_len], symbols)
    offs = np.zeros(ndv + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    if int(offs[-1]) != len(payload):
        raise ValueError("corrupt STRDICT block: length plane != payload")
    if idx.size and int(idx.max()) >= ndv:
        raise ValueError("corrupt STRDICT block: index out of range")
    # the GATHERED output (n rows, duplicates included) can overflow int32
    # offsets even when the dictionary payload is small — size it exactly
    # and promote to large_binary past the 2 GiB line
    out_bytes = int(lengths[idx].sum()) if idx.size else 0
    if int(offs[-1]) < _INT32_MAX and out_bytes < _INT32_MAX:
        dictionary = pa.Array.from_buffers(
            pa.binary(),
            ndv,
            [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
             pa.py_buffer(payload)],
        )
    else:
        dictionary = pa.Array.from_buffers(
            pa.large_binary(),
            ndv,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(payload)],
        )
    return dictionary.take(pa.array(idx.astype(np.int64)))


_INT32_MAX = 2**31 - 1


def decode_strings(block: bytes, symbols: list[bytes] | None = None) -> list[bytes]:
    return decode_strings_arrow(block, symbols).to_pylist()


# ---------------------------------------------------------------------------
# Exact size accounting (the selector's cost model).
# ---------------------------------------------------------------------------


def codec_sizes(
    n: int,
    min_val: int,
    max_val: int,
    n_runs: int,
    max_count: int,
    ndv: int,
    first_val: int,
    max_zz_delta: int,
) -> dict[int, int]:
    """Exact encoded byte length per codec, from chunk statistics alone.

    This is the reference's "early size computation" idea (``count_runs`` before
    encode, v:467-481; ``encode_space_usage`` cost model, v:2744-2762) made
    exact for our wire format: ``codec_sizes(...)[c] == len(encode_with(c, a))``
    for every codec — a tested invariant, not an estimate.

    ``first_val`` is the chunk's first element and ``max_zz_delta`` the max
    zigzagged successive difference (mod-2^64, matching
    :func:`_zigzag_diffs_u64`; 0 when n <= 1) — the two stats the DELTA
    candidate needs.
    """
    if n == 0:
        return {c: 0 for c in INT_CODECS}
    sizes: dict[int, int] = {}
    width = 8 if (max_val > 2**31 - 1 or min_val < -(2**31)) else 4
    sizes[PLAIN] = 1 + uvarint_len(n) + 1 + width * n
    cbits = _storage_bits(max_count - 1)
    vbits = _storage_bits(max_val - min_val)
    sizes[RLE] = (
        1 + uvarint_len(n_runs) + uvarint_len(zigzag(min_val)) + 2
        + packed_nbytes(n_runs, cbits) + packed_nbytes(n_runs, vbits)
    )
    if min_val >= 0:
        sizes[BITPACK] = (
            1 + uvarint_len(n) + 1 + packed_nbytes(n, _storage_bits(max_val))
        )
    sizes[FOR] = (
        1 + uvarint_len(n) + uvarint_len(zigzag(min_val)) + 1
        + packed_nbytes(n, vbits)
    )
    sizes[DICT] = (
        1 + uvarint_len(n) + uvarint_len(ndv) + uvarint_len(zigzag(min_val)) + 1
        + packed_nbytes(ndv, vbits) + 1 + packed_nbytes(n, _storage_bits(ndv - 1))
    )
    sizes[DELTA] = (
        1 + uvarint_len(n) + uvarint_len(zigzag(first_val)) + 1
        + packed_nbytes(n - 1, _storage_bits(max_zz_delta))
    )
    return sizes
