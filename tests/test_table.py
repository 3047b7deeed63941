"""Multi-column table encode (rlv.table): per-column codec selection and a
full decode roundtrip, dictionary columns included."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rlv import blocks, table


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = [
        # (k, status, city, qty): status is low-cardinality (dict/RLE bait),
        # qty has runs, city is a string dictionary column
        (i, "OPEN" if i % 7 else "CLOSED", f"city{i % 5}", (i // 50) * 3)
        for i in range(400)
    ]
    return (
        spark.createDataFrame(rows, ["k", "status", "city", "qty"])
        .withColumn("chunk", F.expr("CAST(k % 4 AS INT)"))
    )


def test_encode_table_columns_roundtrip(spark, mixed_df):
    enc = table.encode_table_columns(
        mixed_df, chunk_col="chunk", order_col="k",
        int_cols=["qty"], str_cols=["status", "city"],
    ).collect()
    dicts = table.encode_table_dicts(
        mixed_df, chunk_col="chunk", str_cols=["status", "city"]
    ).collect()
    src = mixed_df.orderBy("k").collect()
    by_chunk: dict[int, list] = {}
    for r in src:
        by_chunk.setdefault(r["chunk"], []).append(r)

    # int column decodes back to the chunk's ordered values
    qty_rows = [r for r in enc if r["col_name"] == "qty"]
    decoded = table.decode_table_column(qty_rows)
    for cid, vals in decoded.items():
        assert vals == [r["qty"] for r in by_chunk[cid]]

    # string columns decode through the chunk dictionaries
    for col in ("status", "city"):
        col_rows = [r for r in enc if r["col_name"] == col]
        dict_rows = [r for r in dicts if r["col_name"] == col]
        decoded = table.decode_table_column(col_rows, dict_rows)
        for cid, vals in decoded.items():
            assert vals == [r[col] for r in by_chunk[cid]]


def test_encode_table_sizes_exact_and_selected(spark, mixed_df):
    enc = table.encode_table_columns(
        mixed_df, chunk_col="chunk", order_col="k",
        int_cols=["qty"], str_cols=["status"],
    ).collect()
    assert len(enc) == 4 * 2  # 4 chunks x 2 columns
    for r in enc:
        assert r["enc_bytes"] == len(bytes(r["block"]))
        assert r["n_values"] == 100
        # every block must also beat PLAIN storage for these compressible cols
        assert r["enc_bytes"] < 4 * r["n_values"]


def test_encode_table_blocks_deterministic(spark, mixed_df):
    a = {
        (r["chunk_id"], r["col_name"]): bytes(r["block"])
        for r in table.encode_table_columns(
            mixed_df, chunk_col="chunk", order_col="k",
            int_cols=["qty"], str_cols=["city"],
        ).collect()
    }
    b = {
        (r["chunk_id"], r["col_name"]): bytes(r["block"])
        for r in table.encode_table_columns(
            mixed_df.repartition(13), chunk_col="chunk", order_col="k",
            int_cols=["qty"], str_cols=["city"],
        ).collect()
    }
    assert a == b  # independent of physical partitioning


def test_rows_per_block_bounds_units_and_roundtrips(spark, mixed_df):
    """Sub-chunk blocks: no encoding unit exceeds rows_per_block (the bound
    that keeps billion-row chunks off a single executor row), blocks of a
    chunk concatenate back to the exact column, and the bounded encoding
    still beats PLAIN on these columns."""
    enc = table.encode_table_columns(
        mixed_df, chunk_col="chunk", order_col="k",
        int_cols=["qty"], str_cols=["city"], rows_per_block=30,
    ).collect()
    assert all(r["n_values"] <= 30 for r in enc)
    # 4 chunks x 100 rows -> ceil(100/30)=4 blocks per (chunk, column)
    assert len(enc) == 4 * 4 * 2
    dicts = table.encode_table_dicts(
        mixed_df, chunk_col="chunk", str_cols=["city"]
    ).collect()
    src = mixed_df.orderBy("k").collect()
    by_chunk: dict[int, list] = {}
    for r in src:
        by_chunk.setdefault(r["chunk"], []).append(r)
    qty = table.decode_table_column([r for r in enc if r["col_name"] == "qty"])
    for cid, vals in qty.items():
        assert vals == [r["qty"] for r in by_chunk[cid]]
    city = table.decode_table_column(
        [r for r in enc if r["col_name"] == "city"],
        [r for r in dicts if r["col_name"] == "city"],
    )
    for cid, vals in city.items():
        assert vals == [r["city"] for r in by_chunk[cid]]


def test_int64_overflow_fails_loudly(spark):
    rows = [(0, i, 2**40 + i) for i in range(4)]
    df = spark.createDataFrame(rows, ["chunk", "k", "big"])
    with pytest.raises(Exception, match="int32"):
        table.encode_table_columns(
            df, chunk_col="chunk", order_col="k", int_cols=["big"]
        ).collect()


def test_table_encode_nullable_roundtrip(spark):
    """The JVM plane's validity plane: NULL ints and strings round-trip
    exactly (None restored at NULL slots), null-free blocks stay unwrapped,
    and the budget invariant holds with the wrapper priced in."""
    rows = [
        (0, i,
         None if i % 7 == 0 else i // 10,
         None if i % 5 == 3 else f"s{i % 4}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "chunk int, k long, v long, s string")
    enc = table.encode_table_columns(
        df, chunk_col="chunk", order_col="k", int_cols=["k", "v"],
        str_cols=["s"],
    ).collect()
    dicts = table.encode_table_dicts(
        df, chunk_col="chunk", str_cols=["s"]
    ).collect()
    src = sorted(rows)
    for r in enc:
        assert r["enc_bytes"] <= r["naive_bytes"], r
        wrapped = len(r["block"]) and bytes(r["block"])[0] == blocks.NULLW
        assert wrapped == (r["n_nulls"] > 0), r
    v_rows = [r for r in enc if r["col_name"] == "v"]
    decoded = table.decode_table_column(v_rows)
    assert decoded[0] == [r[2] for r in src]
    s_rows = [r for r in enc if r["col_name"] == "s"]
    decoded_s = table.decode_table_column(s_rows, dicts)
    assert decoded_s[0] == [r[3] for r in src]
    # NULL order key still fails loudly
    bad = spark.createDataFrame(
        [(0, None, 1)], "chunk int, k long, v long"
    )
    with pytest.raises(Exception, match="order column"):
        table.encode_table_columns(
            bad, chunk_col="chunk", order_col="k", int_cols=["v"]
        ).collect()
