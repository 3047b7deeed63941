"""Multi-column table encode: the north rule's *per-column* engine surface.

``encode_table_columns`` encodes EVERY requested column of an arbitrary table
through the existing chunk machinery: each (chunk, column) value sequence
becomes one logical document for :func:`rlv.engine.encode_pass`, so the whole
stats sweep / exact-size selector / vectorized serializer stack
(rl_encoding.v's selector statistics story, v:3032-3053, applied per column)
is reused unchanged.  String columns are dictionary-coded first — the code
stream (dense rank of the value within its chunk) goes through the int
codecs, and the chunk dictionary itself is a STRDICT block
(:func:`encode_table_dicts`) — the classic columnar split of values vs
dictionary.

Scale shape: one shuffle to co-locate each chunk's rows (inherent — a chunk
must be encoded contiguously), everything after is per-(chunk, column) local.
Chunks are the caller's partition unit (e.g. an Iceberg partition or a
row-group-sized bucket); at 10^12 rows the chunk column IS the table's
physical partitioning, so the "shuffle" is a no-op read of already-bucketed
data.  The dense-rank window for string codes partitions by chunk as well —
same co-location, no extra exchange after AQE coalesces.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rlv import engine


def _long_relation(
    df: DataFrame,
    chunk_col: str,
    order_col: str,
    int_cols: list[str],
    str_cols: list[str],
) -> DataFrame:
    """(chunk_id, col_name, ord, value): every column's values as one long
    relation, strings replaced by their within-chunk dense-rank codes.

    NULL data values stay NULL here and become the block's validity plane
    downstream (``wrap_nullable``).  String codes dense-rank the VALID
    values only (``asc_nulls_last`` keeps NULL rows out of ranks 0..ndv-1 —
    Spark's default nulls-first would silently shift every code), and a NULL
    string yields a NULL code.  A NULL ORDER key has no position in the
    sequence at all and fails loudly."""

    def _order_guard() -> F.Column:
        return F.expr(
            f"CASE WHEN assert_true({order_col} IS NOT NULL, "
            f"'table_encode: NULL in order column {order_col}; the row "
            f"order would be undefined') IS NULL "
            f"THEN CAST({order_col} AS LONG) END"
        ).alias("ord")

    parts = [
        df.select(
            F.col(chunk_col).cast("int").alias("chunk_id"),
            F.lit(c).alias("col_name"),
            _order_guard(),
            F.col(c).cast("long").alias("value"),
        )
        for c in int_cols
    ]
    for c in str_cols:
        w = Window.partitionBy(F.col(chunk_col)).orderBy(
            F.col(c).asc_nulls_last()
        )
        parts.append(
            df.select(
                F.col(chunk_col).cast("int").alias("chunk_id"),
                F.lit(c).alias("col_name"),
                _order_guard(),
                F.when(
                    F.col(c).isNull(), F.lit(None).cast("long")
                ).otherwise(
                    (F.dense_rank().over(w) - 1).cast("long")
                ).alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def encode_table_columns(
    df: DataFrame,
    chunk_col: str,
    order_col: str,
    int_cols: list[str],
    str_cols: list[str] = (),
    rows_per_block: int | None = None,
) -> DataFrame:
    """Encode each column chunk-by-chunk with the auto-selector.

    Returns one row per (chunk, block, column): ``(chunk_id, block_idx,
    col_name, n_values, n_runs, codec_id, enc_bytes, block)``.  ``order_col``
    must be a total order within each chunk (it defines the value sequence,
    hence the run structure — both engines sort by it, so blocks are
    deterministic).  String columns contribute their dense-rank code stream
    (dictionary per CHUNK — pair with :func:`encode_table_dicts`), values
    encoded per block — parquet's dictionary-page/data-page split.

    ``rows_per_block`` bounds the encoding unit: without it one chunk is one
    block, so a billion-row chunk would materialize a billion-element array
    row on one executor; with it each (chunk, column) is cut into
    ``rows_per_block``-row blocks (runs do not span blocks, exactly like
    parquet row-group boundaries), keeping the per-row state bounded no
    matter how large chunks grow.
    """
    long_rel = _long_relation(df, chunk_col, order_col, list(int_cols),
                              list(str_cols))
    if rows_per_block is not None:
        w = Window.partitionBy("chunk_id", "col_name").orderBy("ord")
        long_rel = long_rel.withColumn(
            "block_idx",
            ((F.row_number().over(w) - 1) / rows_per_block).cast("int"),
        )
    else:
        long_rel = long_rel.withColumn("block_idx", F.lit(0))
    grouped = (
        long_rel.groupBy("chunk_id", "block_idx", "col_name")
        .agg(F.array_sort(F.collect_list(F.struct("ord", "value"))).alias("sv"))
        .select(
            "chunk_id",
            "block_idx",
            "col_name",
            # VALID values only — NULL slots live in the validity plane; the
            # int codecs are int32-valued, so a bigint outside the range must
            # FAIL (non-ANSI CAST would silently wrap and corrupt blocks)
            F.expr(
                "transform(filter(sv, x -> x.value IS NOT NULL), "
                "x -> CASE WHEN assert_true("
                "x.value BETWEEN -2147483648 AND 2147483647, "
                "'table_encode: value outside int32 range') IS NULL "
                "THEN CAST(x.value AS INT) END)"
            ).alias("tokens"),
            F.expr("transform(sv, x -> x.value IS NOT NULL)").alias("valid"),
        )
    )
    doc = grouped.select(
        F.concat_ws(
            "#", F.col("chunk_id"), F.col("block_idx"), F.col("col_name")
        ).alias("doc_id"),
        F.col("col_name").alias("source"),
        F.lit(0).alias("group_id"),
        "tokens",
        F.size("tokens").alias("n_tok"),
        "valid",
    )
    # validity rides the encode batch as a passthrough column — a rejoin on
    # doc_id would re-run the whole long-relation aggregation a second time
    enc = engine.encode_pass(doc, passthrough=("valid",))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _wrap_nullable(block: pd.Series, valid: pd.Series) -> pd.Series:
        # block-level rows (one per rows_per_block values), Arrow-batched;
        # null-free blocks pass through byte-identical
        import numpy as np

        from rlv import blocks as B

        out = []
        for b, v in zip(block, valid):
            m = np.asarray(v, dtype=bool)
            out.append(
                bytes(b) if m.all() else B.wrap_nullable(m, bytes(b))
            )
        return pd.Series(out)

    wrapped = enc.select(
        F.split("doc_id", "#")[0].cast("int").alias("chunk_id"),
        F.split("doc_id", "#")[1].cast("int").alias("block_idx"),
        F.col("source").alias("col_name"),
        F.size("valid").cast("bigint").alias("n_values"),
        F.expr("size(filter(valid, x -> NOT x))").cast("bigint").alias(
            "n_nulls"
        ),
        "n_runs",
        "codec_id",
        F.col("enc_bytes").alias("_inner_bytes"),
        F.col("naive_bytes").alias("_inner_naive"),
        _wrap_nullable(F.col("block"), F.col("valid")).alias("block"),
    )
    # the NULLW wrapper's exact overhead rides both the size and the budget
    # (CLAUDE.md invariant 3, extended — same accounting as the files plane)
    return wrapped.select(
        "chunk_id",
        "block_idx",
        "col_name",
        "n_values",
        "n_nulls",
        "n_runs",
        "codec_id",
        F.octet_length("block").cast("bigint").alias("enc_bytes"),
        (
            F.col("_inner_naive")
            + (F.octet_length("block") - F.col("_inner_bytes"))
        ).alias("naive_bytes"),
        "block",
    )


def encode_table_dicts(
    df: DataFrame, chunk_col: str, str_cols: list[str]
) -> DataFrame:
    """Per-(chunk, string column) dictionary blocks: ``(chunk_id, col_name,
    ndv, dict_block)``.

    The dictionary lists the chunk's distinct values in sort order — exactly
    the order :func:`encode_table_columns`' dense-rank codes index into — as
    one STRDICT block (dict-of-uniques + FSST payload).  Decode = STRDICT
    block -> sorted uniques, then ``uniques[code]`` per row.
    """
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("chunk_id", IntegerType()),
        StructField("col_name", StringType()),
        StructField("ndv", LongType()),
        StructField("dict_block", BinaryType()),
    ])

    def per_chunk(key, pdf):
        import pandas as pd

        from rlv import blocks as B
        from rlv.util import tune_malloc

        tune_malloc()
        chunk_id, col_name = key
        # NULLs carry no dictionary entry: codes index the VALID values and
        # NULL rows live in the code block's validity plane
        uniq = sorted(set(pdf["value"].dropna()))
        block = B.encode_strings(uniq)
        return pd.DataFrame(
            {
                "chunk_id": [int(chunk_id)],
                "col_name": [col_name],
                "ndv": [len(uniq)],
                "dict_block": [block],
            }
        )

    parts = [
        df.select(
            F.col(chunk_col).cast("int").alias("chunk_id"),
            F.lit(c).alias("col_name"),
            F.col(c).cast("string").alias("value"),
        )
        for c in str_cols
    ]
    rel = parts[0]
    for p in parts[1:]:
        rel = rel.unionByName(p)
    # distinct first: the grouped-map then ships ndv rows per chunk, not n
    return (
        rel.distinct()
        .groupBy("chunk_id", "col_name")
        .applyInPandas(per_chunk, out_schema)
    )


def decode_table_column(enc_rows, dict_rows=None) -> dict[int, list]:
    """Driver-side decode helper (tests / spot checks, not a data path):
    {chunk_id: values} for ONE column's rows from
    :func:`encode_table_columns` (+ matching :func:`encode_table_dicts` rows
    to map string codes back through the dictionary).  NULLW-wrapped blocks
    decode with their validity restored (``None`` at NULL slots)."""
    import numpy as np

    from rlv import blocks as B

    dicts = {}
    if dict_rows is not None:
        for r in dict_rows:
            dicts[int(r["chunk_id"])] = [
                b.decode("utf-8") for b in B.decode_strings(bytes(r["dict_block"]))
            ]
    out: dict[int, list] = {}
    ordered = sorted(
        enc_rows, key=lambda r: (int(r["chunk_id"]), int(r["block_idx"]))
    )
    for r in ordered:  # blocks of one chunk concatenate in block order
        vals, valid = B.decode_nullable_block(bytes(r["block"]), np.int64)
        cid = int(r["chunk_id"])
        if cid in dicts:
            uniq = dicts[cid]
            out.setdefault(cid, []).extend(
                uniq[int(v)] if ok else None
                for v, ok in zip(vals, valid)
            )
        else:
            out.setdefault(cid, []).extend(
                int(v) if ok else None for v, ok in zip(vals, valid)
            )
    return out
