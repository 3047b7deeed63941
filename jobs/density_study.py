"""Density headroom study: is a richer codec set worth a wire change?

Round-3 VERDICT task #6 proposed pricing DELTA as a sub-codec for RLE's two
planes (and, by extension, other plane-hybrid codecs) to push density below
0.58 B/token.  This script MEASURES that hypothesis on the actual bench
token distribution before any wire surgery: for every document it computes
the current auto-selected size and the size each candidate extension would
achieve, plus the order-0 entropy floors of both representations.

Result on the round-3/4 bench table (recorded in BASELINE.md): every
plane-hybrid candidate gains ~0.0% —

* RLE planes delta-coded (zigzag diffs, implicit 0 prefix): 0.00%
* DICT dictionary plane delta-coded:                        0.00%
* DICT index plane RLE-coded:                               0.00%
* patched FOR (FastPFOR-style exception list):              0.04%

and the current density (0.598 B/token) is already BELOW the per-doc
order-0 entropy of the token stream (0.717) and of the RLE representation
(0.627) — the remaining gap to the entropy floor is negative, so only a
higher-order entropy coder (a different codec class that would break the
exact-size-from-stats invariant and the SQL oracles) could move the number.
Conclusion: the codec set is at its frontier for this data; the wire change
would add hot-path cost for nothing at 100 TB.

Usage: python jobs/density_study.py [--input DIR] [--files N]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _zzmax_pfx0(x: np.ndarray) -> int:
    """Max zigzagged successive diff with an implicit 0 prefix (so the plane
    keeps exactly len(x) packed values of one width)."""
    d = np.diff(np.concatenate([[0], x]).astype(np.int64))
    zz = ((d << 1) ^ (d >> 63)).astype(np.uint64)
    return int(zz.max()) if zz.size else 0


def study(files: list[str]) -> dict:
    import pyarrow.parquet as pq

    from rlv.kernels import rle
    from rlv.kernels.bitpack import packed_nbytes, uvarint_len, zigzag
    from rlv.selector import choose_codec
    from rlv.stats import chunk_stats

    tot_cur = ntok = 0
    tots = {k: 0 for k in ("rle_planes_delta", "dict_dict_delta",
                           "dict_idx_rle", "patched_for", "all")}
    h_tok = h_rle = 0.0
    for f in files:
        t = pq.read_table(f, columns=["tokens"])
        for chunk in t.column("tokens").chunks:
            offs = chunk.offsets.to_numpy().astype(np.int64)
            vals = chunk.values.to_numpy(zero_copy_only=False)
            for i in range(len(offs) - 1):
                a = vals[offs[i]:offs[i + 1]]
                if a.size == 0:
                    continue
                st = chunk_stats(a)
                _, size = choose_codec(st)
                tot_cur += size
                ntok += a.size
                n = a.size
                # entropy floors (bytes)
                _, c = np.unique(a, return_counts=True)
                p = c / n
                h_tok += float(-(p * np.log2(p)).sum()) * n / 8
                counts, values = rle.rle_encode(a)
                for arr in (counts, values):
                    _, c2 = np.unique(arr, return_counts=True)
                    p2 = c2 / arr.size
                    h_rle += float(-(p2 * np.log2(p2)).sum()) * arr.size / 8
                # (1) RLE planes delta-coded
                minv = int(values.min())
                nr = counts.size
                cb = (int(counts.max()) - 1).bit_length()
                vb = (int(values.max()) - minv).bit_length()
                cb_d = _zzmax_pfx0(counts - 1).bit_length()
                vb_d = _zzmax_pfx0(values - minv).bit_length()
                s_rle2 = (
                    1 + uvarint_len(nr) + uvarint_len(zigzag(minv)) + 2
                    + min(packed_nbytes(nr, cb), packed_nbytes(nr, cb_d))
                    + min(packed_nbytes(nr, vb), packed_nbytes(nr, vb_d))
                )
                # (2)/(3) DICT hybrids
                uniq, inv = np.unique(a, return_inverse=True)
                ndv = uniq.size
                dmin = int(uniq.min())
                dbits = (int(uniq.max()) - dmin).bit_length()
                ibits = (ndv - 1).bit_length()
                db_d = _zzmax_pfx0(uniq - dmin).bit_length()
                hdr = (1 + uvarint_len(n) + uvarint_len(ndv)
                       + uvarint_len(zigzag(dmin)) + 1)
                s_dd = hdr + packed_nbytes(ndv, db_d) + 1 + packed_nbytes(n, ibits)
                ci, vi = rle.rle_encode(inv)
                s_irle = (
                    hdr + packed_nbytes(ndv, dbits) + 2 + uvarint_len(ci.size)
                    + packed_nbytes(ci.size, (int(ci.max()) - 1).bit_length())
                    + packed_nbytes(ci.size, int(vi.max()).bit_length())
                )
                # (4) patched FOR: main plane at b bits + exception list
                d = a.astype(np.int64) - st.min_val
                vbits = int(d.max()).bit_length()
                bw = np.zeros(n, dtype=np.int64)
                nz = d > 0
                if nz.any():
                    bw[nz] = np.floor(
                        np.log2(d[nz].astype(np.float64))
                    ).astype(np.int64) + 1
                cnt = np.bincount(bw, minlength=vbits + 2)
                above = np.cumsum(cnt[::-1])[::-1]
                posb = max((n - 1).bit_length(), 1)
                s_pf = min(
                    3 + uvarint_len(n) + uvarint_len(zigzag(st.min_val))
                    + uvarint_len(int(above[b + 1]) if b + 1 <= vbits else 0)
                    + packed_nbytes(n, b)
                    + packed_nbytes(
                        int(above[b + 1]) if b + 1 <= vbits else 0, posb
                    )
                    + packed_nbytes(
                        int(above[b + 1]) if b + 1 <= vbits else 0, vbits - b
                    )
                    for b in range(vbits + 1)
                )
                tots["rle_planes_delta"] += min(size, s_rle2)
                tots["dict_dict_delta"] += min(size, s_dd)
                tots["dict_idx_rle"] += min(size, s_irle)
                tots["patched_for"] += min(size, s_pf)
                tots["all"] += min(size, s_rle2, s_dd, s_irle, s_pf)
    out = {
        "tokens": ntok,
        "current_bytes_per_token": round(tot_cur / ntok, 6),
        "entropy_order0_tokens": round(h_tok / ntok, 6),
        "entropy_order0_rle_rep": round(h_rle / ntok, 6),
    }
    for k, v in tots.items():
        out[f"gain_pct_{k}"] = round(100 * (1 - v / tot_cur), 4)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/rlv_bench/tokens_r480000_s42")
    ap.add_argument("--files", type=int, default=12,
                    help="number of parquet files to sample")
    args = ap.parse_args()
    files = sorted(glob.glob(f"{args.input}/*.parquet"))[:args.files]
    if not files:
        raise SystemExit(f"no parquet files under {args.input} — run bench.py "
                         "once to materialize the bench table")
    print(json.dumps(study(files)))


if __name__ == "__main__":
    main()
