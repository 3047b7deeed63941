"""Regressions for the float plane's Python hop and SQL key semantics.

1. A nullable double batch reaches a pandas UDF as float64 (lossy above
   2^53) — the restore must still be BIT-IDENTICAL (the key now rides as
   two exact 32-bit halves).
2. GROUP BY / DISTINCT on a float column must merge -0.0 with 0.0 and
   pool every NaN payload into one group, SQL-style.
3. date64[ms] restores timezone-free (a non-UTC session must not shift
   dates).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rlv import table_files


def _write_src(tmp_path, cols: dict) -> str:
    d = str(tmp_path / "src")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table(cols), f"{d}/p.parquet")
    return f"{d}/p.parquet"


def test_nullable_double_restore_is_bit_identical(spark, tmp_path):
    """Scan/DISTINCT restore of a nullable double column whose batches
    contain NULLs: every restored value bit-identical to the source.
    Before the hi/lo key split, fillna(0).astype(int64) on the float64
    Series PySpark hands over lost low mantissa bits (keys > 2^53):
    2.718281828459045 came back 2.718281828459112."""
    n = 4000
    rng = np.random.default_rng(11)
    v = rng.normal(scale=10.0, size=n)
    v[0] = 2.718281828459045
    v[1] = -3.141592653589793
    v[2] = 1e-300          # subnormal-adjacent: tiny key magnitude
    v[3] = 1.7976931348623157e308
    mask = np.zeros(n, bool)
    mask[::7] = True       # NULLs interleaved in EVERY batch
    f = _write_src(tmp_path, {
        "k": pa.array(range(n), pa.int64()),
        "x": pa.array(v, pa.float64(), mask=mask),
    })
    out = str(tmp_path / "enc")
    table_files.encode_table_files(
        spark, [f], out, order_col="k", int_cols=["k", "x"],
        rows_per_block=512, num_tasks=2,
    )
    rows = table_files.scan_table_files_where(
        spark, out, [("between", "k", 0, n)], columns=["k", "x"]
    ).collect()
    assert len(rows) == n
    got = np.empty(n)
    gmask = np.zeros(n, bool)
    for r in rows:
        if r["x"] is None:
            gmask[r["k"]] = True
            got[r["k"]] = 0.0
        else:
            got[r["k"]] = r["x"]
    assert np.array_equal(gmask, mask)
    want = np.where(mask, 0.0, v)
    assert np.array_equal(got.view(np.int64), want.view(np.int64)), \
        "nullable double restore lost mantissa bits"


def test_float_group_and_distinct_merge_zero_and_nan(spark, tmp_path):
    """SQL grouping semantics on the key plane: -0.0 and +0.0 one group,
    all NaN bit patterns one group; NULL keys one pooled group."""
    # two DIFFERENT NaN payloads (distinct total-order keys)
    nan_a = np.uint64(0x7FF8000000000000).view(np.float64)  # canonical
    nan_b = np.uint64(0x7FF8000000000001).view(np.float64)
    nan_c = np.uint64(0xFFF8000000000002).view(np.float64)  # negative NaN
    g = np.array([0.0, -0.0, 0.0, -0.0, nan_a, nan_b, nan_c,
                  1.5, 1.5, 0.0, nan_a, -0.0], dtype=np.float64)
    n = g.size
    mask = np.zeros(n, bool)
    mask[9] = True  # one NULL group key
    f = _write_src(tmp_path, {
        "k": pa.array(range(n), pa.int64()),
        "g": pa.array(g, pa.float64(), mask=mask),
        "v": pa.array(range(100, 100 + n), pa.int64()),
    })
    out = str(tmp_path / "enc")
    table_files.encode_table_files(
        spark, [f], out, order_col="k", int_cols=["k", "g", "v"],
        rows_per_block=4, num_tasks=2,  # zeros/NaNs split across blocks
    )
    rows = table_files.agg_table_files_by(spark, out, "v", "g").collect()
    by_key = {}
    for r in rows:
        key = ("nan" if r["g"] is not None and np.isnan(r["g"])
               else r["g"])
        assert key not in by_key, f"duplicate group for {key!r}"
        by_key[key] = r
    assert set(by_key) == {0.0, 1.5, "nan", None}
    zr = by_key[0.0]
    assert zr["n_rows"] == 5 and str(zr["g"]) == "0.0"  # +0.0, not -0.0
    assert by_key["nan"]["n_rows"] == 4
    assert by_key[None]["n_rows"] == 1
    assert by_key[1.5]["n_rows"] == 2
    # sums stay exact through the merge
    assert int(zr["sum_val"]) == 100 + 101 + 102 + 103 + 111
    # DISTINCT merges the same way
    dv = table_files.distinct_table_files(spark, out, "g").collect()
    keys = [("nan" if r["g"] is not None and np.isnan(r["g"]) else r["g"])
            for r in dv]
    assert sorted(keys, key=lambda x: (x is None, str(x))) == \
        [0.0, 1.5, "nan", None]
    # and the kept zero is +0.0
    z = [r["g"] for r in dv if r["g"] == 0.0]
    assert len(z) == 1 and not np.signbit(z[0])
    # NDV counts the merged set
    [nd] = table_files.ndv_table_files(spark, out, "g").collect()
    assert nd["ndv"] == 3 and bool(nd["null_seen"])
    # multi-key GROUP BY normalizes each float key column too
    rows2 = table_files.agg_table_files_by(
        spark, out, "v", ["g", "k"]
    ).collect()
    zeros = [r for r in rows2 if r["g"] == 0.0]
    assert len(zeros) == 5 and all(not np.signbit(r["g"]) for r in zeros)


def test_date64_restore_is_timezone_free(spark, tmp_path):
    """date64[ms] columns restore via date_from_unix_date — a session in
    a non-UTC zone must not shift any date (timestamp_millis(...)
    .cast('date') did, by up to a day)."""
    import datetime as dt

    days = [dt.date(1969, 12, 31), dt.date(1970, 1, 1),
            dt.date(2020, 2, 29), dt.date(1999, 12, 31)] * 8
    n = len(days)
    f = _write_src(tmp_path, {
        "k": pa.array(range(n), pa.int64()),
        "d": pa.array(days, pa.date64()),
    })
    out = str(tmp_path / "enc")
    table_files.encode_table_files(
        spark, [f], out, order_col="k", int_cols=["k", "d"],
        rows_per_block=8, num_tasks=1,
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/Los_Angeles")
        rows = table_files.scan_table_files_where(
            spark, out, [("between", "k", 0, n)], columns=["k", "d"]
        ).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    got = {r["k"]: r["d"] for r in rows}
    assert got == {i: d for i, d in enumerate(days)}
