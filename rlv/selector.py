"""Codec auto-selection: argmin of *exact* encoded size over the candidate set.

The reference motivates the selector: RLE can expand (``encoding_expands``,
rl_encoding.v:2931-2968 — ``[1;2;3;4;5]`` is its own counterexample), so a real
engine must fall back to other codecs; its cost model for RLE is
``2 * count_runs`` words (v:2744-2762), which is exactly :func:`rlv.blocks
.naive_rle_bytes`.  We strengthen "estimated" to "exact": ``codec_sizes``
computes the true byte length of every candidate block from chunk stats, so

* the chosen block is minimal over the candidate set, and
* chosen bytes <= actual RLE bytes <= naive-RLE budget for every nonempty chunk
  (RLE is always a candidate; header <= 15 bytes < 16 = one naive run),

giving the north rule's "total compressed size <= reference naive-RLE size" by
summation.  Deterministic tie-break (lowest codec id) keeps blocks
byte-identical across executors/retries (uniqueness law, v:1524-1538).
"""

from __future__ import annotations

import numpy as np

from rlv import blocks
from rlv.stats import ChunkStats, chunk_stats


def choose_codec(stats: ChunkStats) -> tuple[int, int]:
    """Return ``(codec_id, exact_encoded_bytes)`` for a chunk's statistics."""
    if stats.n == 0:
        return blocks.PLAIN, 0
    sizes = blocks.codec_sizes(
        stats.n, stats.min_val, stats.max_val, stats.n_runs, stats.max_count,
        stats.ndv, stats.first_val, stats.max_zz_delta,
    )
    codec = min(sizes, key=lambda c: (sizes[c], c))
    return codec, sizes[codec]


def encode_auto(a: np.ndarray) -> tuple[int, bytes]:
    """Stats -> selector -> encode with the winning codec.

    Exactness invariant (tested): ``len(block) == choose_codec(stats)[1]``.
    """
    a = np.asarray(a)
    if a.size == 0:
        return blocks.PLAIN, b""
    stats = chunk_stats(a)
    codec, _ = choose_codec(stats)
    return codec, blocks.encode_with(codec, a)
