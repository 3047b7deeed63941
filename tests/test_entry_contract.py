"""Mimics the driver's correctness gate: run every queries()[k] on Spark at
sf0.01 AND the matching oracle_sql()[k] on DuckDB, compare row counts and
order-insensitive values with matching column names."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) if not math.isnan(v) else "nan"
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"no oracle for {name}"
    sdf = q(spark, SF_DIR)
    # driver-hash stability: the driver's value hasher normalizes Python
    # Decimal differently per engine (the r4 red rows) — no contract
    # output may carry a DecimalType column
    from pyspark.sql.types import DecimalType

    dec_cols = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    assert not dec_cols, f"{name}: Decimal output column(s) {dec_cols}"
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    a = _rows_to_multiset(spark_cols, spark_rows)
    b = _rows_to_multiset(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        pytest.fail(f"{name}: value mismatch, first diffs {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["mismatches"] == 0 for r in rows)
    assert all(r["enc_bytes"] <= r["naive_rle_bytes"] for r in rows)


def test_hour_bucket_floor_semantics_pre_epoch(spark):
    """The rollup's hour bucket must FLOOR (DuckDB `//` semantics), not
    truncate toward zero, for pre-1970 timestamps."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("1969-12-31 23:30:00",), ("1970-01-01 00:30:00",),
         ("1969-12-31 23:59:59.999999",), ("1968-01-01 00:00:00",)],
        "ts string",
    )
    out = [
        r.hb
        for r in df.select(
            F.expr(entrymod._HOUR_BUCKET_SQL).alias("hb")
        ).collect()
    ]
    import math

    expect = [
        math.floor(us / 3_600_000_000)
        for us in (-1_800_000_000, 1_800_000_000, -1, -63_158_400_000_000)
    ]
    assert out == expect
