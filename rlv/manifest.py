"""Checkpoint/lineage manifest: per-group metrics + resume bookkeeping.

The manifest is the engine's answer to the reference's determinism laws
(rl_encoding.v:1524-1538 — canonical encodings make retries idempotent): a
small parquet table, one row per completed ``group_id``, that

* gates resume (``done_groups`` -> anti-join in ``encode_dataset``),
* records per-partition lineage + metrics the north rule asks for
  (compressed bytes, codec histogram, throughput), and
* carries the naive-RLE budget column so the global size constraint
  ``sum(bytes_out) <= sum(naive_rle_bytes)`` is auditable with one SQL query.

The manifest itself is tiny (n_groups rows), so updates materialize on the
driver and rewrite the parquet atomically-enough (write to temp dir + rename
would be the production move; plain overwrite is fine in the sandbox).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

MANIFEST_SCHEMA = (
    "group_id int, status string, n_docs bigint, n_tokens bigint, "
    "n_runs bigint, bytes_in bigint, bytes_out bigint, naive_rle_bytes bigint, "
    "codec_hist string, encode_cpu_ns bigint, tokens_per_cpu_sec double, "
    "attempt int, finished_at double"
)


def manifest_path(out_dir: str) -> str:
    return f"{out_dir}/manifest"


def read_manifest(spark: SparkSession, out_dir: str):
    try:
        return spark.read.parquet(manifest_path(out_dir))
    except AnalysisException:
        return None


def done_groups(spark: SparkSession, out_dir: str) -> set[int]:
    mf = read_manifest(spark, out_dir)
    if mf is None:
        return set()
    return {
        int(r["group_id"])
        for r in mf.filter(F.col("status") == "done").select("group_id").collect()
    }


def update_manifest(
    spark: SparkSession,
    out_dir: str,
    new_groups: list[int],
    wall_sec: float,
    skipped: int,
) -> dict:
    """Aggregate metrics for the freshly encoded groups and merge into the
    manifest.  The blocks scan is partition-pruned to ``new_groups`` and
    column-pruned to the metric columns (never reads the block blobs)."""
    blocks_path = f"{out_dir}/blocks"
    enc = spark.read.parquet(blocks_path).filter(F.col("group_id").isin(new_groups))
    agg_rows = (
        enc.groupBy("group_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_runs").alias("n_runs"),
            F.sum("enc_bytes").alias("bytes_out"),
            F.sum("naive_bytes").alias("naive_rle_bytes"),
            F.sum("encode_ns").alias("encode_cpu_ns"),
        )
        .collect()
    )
    hist_rows = (
        enc.groupBy("group_id", "codec_id").count().collect()
    )
    hists: dict[int, dict[str, int]] = {}
    for r in hist_rows:
        hists.setdefault(int(r["group_id"]), {})[str(r["codec_id"])] = int(r["count"])

    mf = read_manifest(spark, out_dir)
    old_rows: dict[int, Row] = {}
    attempts: dict[int, int] = {}
    if mf is not None:
        for r in mf.collect():
            old_rows[int(r["group_id"])] = r
            attempts[int(r["group_id"])] = int(r["attempt"])

    now = time.time()
    merged: dict[int, tuple] = {g: tuple(r) for g, r in old_rows.items()}
    summary = {
        "groups_encoded": len(agg_rows),
        "groups_skipped": skipped,
        "tokens": 0,
        "bytes_out": 0,
        "naive_rle_bytes": 0,
        "wall_sec": wall_sec,
    }
    for r in agg_rows:
        g = int(r["group_id"])
        cpu_ns = int(r["encode_cpu_ns"] or 0)
        n_tokens = int(r["n_tokens"] or 0)
        merged[g] = (
            g,
            "done",
            int(r["n_docs"]),
            n_tokens,
            int(r["n_runs"] or 0),
            4 * n_tokens,  # raw int32 bytes in
            int(r["bytes_out"] or 0),
            int(r["naive_rle_bytes"] or 0),
            json.dumps(hists.get(g, {}), sort_keys=True),
            cpu_ns,
            (n_tokens / (cpu_ns / 1e9)) if cpu_ns else 0.0,
            attempts.get(g, 0) + 1,
            now,
        )
        summary["tokens"] += n_tokens
        summary["bytes_out"] += int(r["bytes_out"] or 0)
        summary["naive_rle_bytes"] += int(r["naive_rle_bytes"] or 0)
    out = spark.createDataFrame(
        [tuple(v) for v in merged.values()], schema=MANIFEST_SCHEMA
    )
    out.coalesce(1).write.mode("overwrite").parquet(manifest_path(out_dir))
    if wall_sec > 0:
        summary["tokens_per_sec_wall"] = summary["tokens"] / wall_sec
    return summary
