"""Files-plane per-column table encode: roundtrip, budget, resume, guards."""

from __future__ import annotations

import glob

import numpy as np
import pytest
from pyspark.sql import functions as F

from rlv import engine_files, table_files

INT_COLS = ["o_orderkey", "o_custkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]


@pytest.fixture(scope="module")
def orders_dir(spark, tmp_path_factory):
    """orders split across 4 parquet files (multi-split planning)."""
    d = str(tmp_path_factory.mktemp("orders") / "orders")
    (
        spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .select(*INT_COLS, *STR_COLS)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _encode(spark, orders_dir, out, **kw):
    files = sorted(glob.glob(f"{orders_dir}/*.parquet"))
    return table_files.encode_table_files(
        spark,
        files,
        out,
        order_col="o_orderkey",
        int_cols=INT_COLS,
        str_cols=STR_COLS,
        rows_per_block=2048,
        num_tasks=4,
        **kw,
    )


def test_table_files_roundtrip_bit_identical(spark, orders_dir, tmp_path):
    out = str(tmp_path / "enc")
    res = _encode(spark, orders_dir, out)
    assert res["splits_encoded"] >= 2
    src = spark.read.parquet(orders_dir)
    n = src.count()
    assert res["splits_encoded"] > 0
    # budget: chosen bytes <= naive-RLE budget, summed over the manifest
    pdf = engine_files._read_manifest_pdf(out)
    assert (pdf["bytes_out"] <= pdf["naive_rle_bytes"]).all()
    restored = str(tmp_path / "restored")
    dec = table_files.decode_table_files(spark, out, restored)
    assert dec["rows"] == n
    res_df = spark.read.parquet(restored)
    # every column reconstructs bit-identically (join on the unique order key)
    joined = (
        src.alias("s")
        .join(res_df.alias("r"), F.col("s.o_orderkey") == F.col("r.o_orderkey"))
    )
    bad = joined.filter(
        (F.col("s.o_custkey") != F.col("r.o_custkey"))
        | (F.col("s.o_orderstatus") != F.col("r.o_orderstatus"))
        | (F.col("s.o_orderpriority") != F.col("r.o_orderpriority"))
    ).count()
    assert bad == 0
    assert res_df.count() == n


def test_table_files_resume_and_schema_guard(spark, orders_dir, tmp_path):
    out = str(tmp_path / "enc")
    first = _encode(spark, orders_dir, out)
    assert first["splits_encoded"] > 0
    second = _encode(spark, orders_dir, out)
    assert second["splits_encoded"] == 0
    assert second["splits_skipped"] == first["splits_encoded"]
    # changing the recorded schema on resume must fail loudly
    files = sorted(glob.glob(f"{orders_dir}/*.parquet"))
    with pytest.raises(ValueError, match="different table schema"):
        table_files.encode_table_files(
            spark, files, out,
            order_col="o_orderkey", int_cols=INT_COLS, str_cols=[],
            rows_per_block=2048, num_tasks=4,
        )


def test_table_files_matches_jvm_table_plane(spark, orders_dir, tmp_path):
    """Both per-column planes agree on the selector outcome for the INT
    columns: same codec and exact block size for the same value sequence
    (single chunk == single split, same block boundaries).  String columns
    are excluded: the JVM plane dense-ranks per CHUNK, the files plane per
    BLOCK — deliberately different dictionary granularity."""
    from rlv import table as T

    out = str(tmp_path / "enc")
    files = sorted(glob.glob(f"{orders_dir}/*.parquet"))
    table_files.encode_table_files(
        spark, files, out,
        order_col="o_orderkey", int_cols=INT_COLS, str_cols=STR_COLS,
        rows_per_block=4096, num_tasks=1,
    )
    fp = (
        spark.read.parquet(f"{out}/blocks")
        .filter(F.col("col_name").isin(INT_COLS))
        .select("col_name", "block_idx", "n_values", "codec_id", "enc_bytes")
    )
    src = (
        spark.read.parquet(orders_dir)
        .withColumn("chunk", F.lit(0))
    )
    jvm = T.encode_table_columns(
        src, chunk_col="chunk", order_col="o_orderkey",
        int_cols=INT_COLS, str_cols=STR_COLS, rows_per_block=4096,
    ).select(
        "col_name",
        F.col("block_idx"),
        "n_values",
        F.col("codec_id").alias("jvm_codec"),
        F.col("enc_bytes").alias("jvm_bytes"),
    )
    joined = fp.join(jvm, ["col_name", "block_idx"]).collect()
    assert joined, "planes produced disjoint blocks"
    for r in joined:
        assert r["codec_id"] == r["jvm_codec"], r
        assert r["enc_bytes"] == r["jvm_bytes"], r


def test_table_files_null_guard(spark, tmp_path):
    d = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (2, None)], "k bigint, s string"
    ).coalesce(1).write.parquet(d)
    files = sorted(glob.glob(f"{d}/*.parquet"))
    with pytest.raises(Exception, match="NULL"):
        table_files.encode_table_files(
            spark, files, str(tmp_path / "enc"),
            order_col="k", int_cols=["k"], str_cols=["s"], num_tasks=1,
        )


def test_verify_table_files(spark, orders_dir, tmp_path):
    """Lineage verify on the table plane: all splits pass and get promoted
    to 'verified'; a corrupted block is detected and counted."""
    out = str(tmp_path / "enc")
    _encode(spark, orders_dir, out)
    res = table_files.verify_table_files(spark, out)
    n = spark.read.parquet(orders_dir).count()
    assert res["mismatches"] == 0 and res["rows"] == n
    pdf = engine_files._read_manifest_pdf(out)
    assert (pdf["status"] == "verified").all()

    # corrupt one block payload byte -> mismatches reported, not crash
    import pyarrow as pa
    import pyarrow.parquet as pq

    victim = sorted(glob.glob(f"{out}/blocks/*.parquet"))[0]
    tbl = pq.read_table(victim)
    blocks_col = tbl.column("block").to_pylist()
    idx = next(i for i, b in enumerate(blocks_col) if len(b) > 8)
    b = bytearray(blocks_col[idx])
    b[-1] ^= 0xFF
    blocks_col[idx] = bytes(b)
    tbl = tbl.set_column(
        tbl.column_names.index("block"), "block",
        pa.array(blocks_col, pa.binary()),
    )
    pq.write_table(tbl, victim, compression="zstd")
    res2 = table_files.verify_table_files(spark, out)
    assert res2["mismatches"] >= 1


def test_compact_refuses_table_plane_dataset(spark, orders_dir, tmp_path):
    """compact_blocks must refuse table-plane datasets: a naive merge would
    interleave (col_name, block_idx) keys and silently mis-order decode."""
    out = str(tmp_path / "enc")
    _encode(spark, orders_dir, out)
    with pytest.raises(ValueError, match="table-plane"):
        engine_files.compact_blocks(spark, out, target_bytes=1 << 30)
