"""FSST-style string compression: tiny static symbol table, byte-exact.

Simplified variant of "FSST: Fast Random Access String Compression"
(Boncz, Neumann, Leis — VLDB 2020, public paper; see PAPERS.md): up to 254
symbols of 1-8 bytes learned from a sample by iterative greedy refinement,
encoding is greedy longest-match, code 0xFF escapes a literal byte.  Exactness
(decode(encode(s)) == s for arbitrary bytes) is the only hard requirement here
(SURVEY.md §7.2 — FSST is the one codec with no reference semantics, so it is
selector-optional and exactness-tested); the implementation favors clarity
over the paper's SIMD tricks.

The engine composes it as the real systems do: string columns are first
dictionary-encoded (unique strings + bit-packed indices), and FSST compresses
only the dictionary payload — so the per-byte Python encode loop touches ndv
strings, not n rows.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 0xFF
MAX_SYMBOLS = 254  # codes 0..253; 0xFE unused/reserved; 0xFF = escape
MAX_SYMBOL_LEN = 8


def train_symbols(sample: bytes, rounds: int = 4, max_sample: int = 1 << 16) -> list[bytes]:
    """Learn a symbol table from a byte sample by iterative pair-merging.

    Round 0 seeds with frequent single bytes; each later round re-encodes the
    sample with the current table and counts concatenations of adjacent
    matches, keeping the most valuable (frequency x saved bytes) symbols.
    Deterministic: ties break lexicographically.
    """
    sample = sample[:max_sample]
    if not sample:
        return []
    counts: dict[bytes, int] = {}
    arr = np.frombuffer(sample, dtype=np.uint8)
    vals, freq = np.unique(arr, return_counts=True)
    order = sorted(zip(freq.tolist(), vals.tolist()), key=lambda t: (-t[0], t[1]))
    symbols = [bytes([v]) for _, v in order[:MAX_SYMBOLS]]
    for _ in range(rounds):
        table = {s: i for i, s in enumerate(symbols)}
        # greedy parse of the sample with the current table
        parsed: list[bytes] = []
        i = 0
        n = len(sample)
        while i < n:
            match = None
            for ln in range(min(MAX_SYMBOL_LEN, n - i), 0, -1):
                cand = sample[i:i + ln]
                if cand in table:
                    match = cand
                    break
            if match is None:
                match = sample[i:i + 1]
            parsed.append(match)
            i += len(match)
        counts.clear()
        for s in parsed:
            counts[s] = counts.get(s, 0) + 1
        for a, b in zip(parsed, parsed[1:]):
            merged = a + b
            if len(merged) <= MAX_SYMBOL_LEN:
                counts[merged] = counts.get(merged, 0) + 1
        gain = sorted(
            counts.items(),
            key=lambda kv: (-(kv[1] * (len(kv[0]) - 1)), kv[0]),
        )
        keep = [s for s, c in gain if c > 1 and len(s) >= 2][: MAX_SYMBOLS - 64]
        # always keep the 64 most frequent single bytes as fallbacks
        singles = [s for s, _ in sorted(
            ((bytes([v]), c) for v, c in zip(vals.tolist(), freq.tolist())),
            key=lambda kv: (-kv[1], kv[0]),
        )][:64]
        symbols = sorted(set(keep) | set(singles))[:MAX_SYMBOLS]
    return symbols


class SymbolTable:
    """Greedy longest-match encoder over a fixed symbol list."""

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = list(symbols)
        self.by_prefix: dict[int, list[tuple[bytes, int]]] = {}
        for code, sym in enumerate(self.symbols):
            if not 1 <= len(sym) <= MAX_SYMBOL_LEN:
                raise ValueError("symbol length out of range")
            # longest-first candidate list per leading byte
            self.by_prefix.setdefault(sym[0], []).append((sym, code))
        for cands in self.by_prefix.values():
            cands.sort(key=lambda t: -len(t[0]))

    def encode(self, data: bytes) -> bytes:
        out = bytearray()
        i = 0
        n = len(data)
        view = bytes(data)
        while i < n:
            for sym, code in self.by_prefix.get(view[i], ()):
                if view.startswith(sym, i):
                    out.append(code)
                    i += len(sym)
                    break
            else:
                out.append(ESCAPE)
                out.append(view[i])
                i += 1
        return bytes(out)

    def decode(self, data: bytes) -> bytes:
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            c = data[i]
            if c == ESCAPE:
                out.append(data[i + 1])
                i += 2
            else:
                out += self.symbols[c]
                i += 1
        return bytes(out)


def serialize_table(symbols: list[bytes]) -> bytes:
    out = bytearray([len(symbols)])
    for s in symbols:
        out.append(len(s))
        out += s
    return bytes(out)


def deserialize_table(buf: bytes, pos: int = 0) -> tuple[SymbolTable, int]:
    n = buf[pos]
    pos += 1
    symbols = []
    for _ in range(n):
        ln = buf[pos]
        pos += 1
        symbols.append(bytes(buf[pos:pos + ln]))
        pos += ln
    return SymbolTable(symbols), pos


# Two-byte marker for an external-table blob.  Unambiguous vs the embedded
# layout: there blob[0] is the symbol count (0..254) and blob[1] a symbol
# LENGTH (1..8), so 0xFE at blob[1] can never occur; vs raw, blob[0]=0xFF.
EXTERNAL_MARKER = bytes([0xFE, 0xFE])


def compress(
    data: bytes, symbols: list[bytes] | None = None, embed_table: bool = True
) -> bytes:
    """Compress ``data``; self-contained blob by default.

    With ``symbols`` given and ``embed_table=False``, the blob carries only
    the encoded payload behind :data:`EXTERNAL_MARKER` — the caller owns the
    table (corpus metadata, e.g. trained once by a sampling pass and recorded
    in the dataset manifest).  That amortizes the per-blob table bytes across
    every chunk of the corpus and makes equal payloads encode to equal bytes
    regardless of which chunk they land in.  Incompressible data falls back
    to the raw marker either way (still self-contained).
    """
    if symbols is None:
        symbols = train_symbols(data)
    st = SymbolTable(symbols)
    enc = st.encode(data)
    prefix = EXTERNAL_MARKER if not embed_table else serialize_table(symbols)
    if len(enc) + len(prefix) >= len(data) + 1:  # raw, marker 0xFF
        return bytes([ESCAPE]) + data
    return prefix + enc


def decompress(blob: bytes, symbols: list[bytes] | None = None) -> bytes:
    if not blob:
        return b""
    if blob[0] == ESCAPE:
        return bytes(blob[1:])
    if blob[:2] == EXTERNAL_MARKER:
        if symbols is None:
            raise ValueError(
                "external-table FSST blob: pass the corpus symbol table"
            )
        return SymbolTable(symbols).decode(blob[2:])
    st, pos = deserialize_table(blob)
    return st.decode(blob[pos:])
