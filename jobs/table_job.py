"""spark-submit entry point for the files-plane per-column TABLE encode.

Cluster:
    spark-submit --py-files rlv.zip jobs/table_job.py encode \
        --input s3://bucket/orders --output s3://bucket/enc \
        --order-col o_orderkey --int-cols o_orderkey,o_custkey \
        --str-cols o_orderstatus,o_orderpriority [--rows-per-block 4096] \
        [--tasks N] [--no-resume] [--verify] [--compact-target BYTES]
    spark-submit ... jobs/table_job.py decode --input s3://bucket/enc \
        --output s3://bucket/restored

Sandbox: python jobs/table_job.py encode --input <parquet dir or file> ...
         --cpus 32

Encode plans row-group splits, sorts each split by --order-col, and runs the
exact-size codec selector per (column, block); --verify replays every
split's lineage and bit-compares all columns in-task (zero shuffle).  Decode
reconstructs the table; rows come back ordered by --order-col within each
split (the order column is part of the data, so any global order is one sort
away).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)


def _input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("action", choices=["encode", "decode"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--order-col")
    ap.add_argument("--int-cols", default="",
                    help="comma-separated integer columns (must include "
                         "--order-col)")
    ap.add_argument("--str-cols", default="",
                    help="comma-separated string columns")
    ap.add_argument("--decimal-cols", default="",
                    help="comma-separated col:scale pairs declaring float "
                         "columns decimal (exact scaled-int plane, e.g. "
                         "l_extendedprice:2,l_tax:2)")
    ap.add_argument("--index-cols", default="",
                    help="comma-separated int columns to carry a per-block "
                         "membership index (point lookups on unclustered "
                         "keys prune to blocks holding the key)")
    ap.add_argument("--rows-per-block", type=int, default=4096)
    ap.add_argument("--tasks", type=int, default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--compact-target", type=int, default=None,
                    help="after encode (+verify), bin-pack blocks files up "
                         "to this many bytes and merge each bin as one "
                         "Spark task (split_seq provenance keeps every "
                         "absorbed split addressable)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.cpus:
        from rlv.session import make_session

        spark = make_session(args.cpus, app="rlv-table")
    else:
        spark = SparkSession.builder.appName("rlv-table").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")

    from rlv import table_files

    if args.action == "encode":
        if not args.order_col:
            ap.error("encode requires --order-col")
        int_cols = [c for c in args.int_cols.split(",") if c]
        str_cols = [c for c in args.str_cols.split(",") if c]
        decimal_cols = dict(
            (pair.split(":")[0], int(pair.split(":")[1]))
            for pair in args.decimal_cols.split(",") if pair
        ) or None
        summary = table_files.encode_table_files(
            spark,
            _input_files(args.input),
            args.output,
            order_col=args.order_col,
            int_cols=int_cols,
            str_cols=str_cols,
            decimal_cols=decimal_cols,
            index_cols=[c for c in args.index_cols.split(",") if c] or None,
            rows_per_block=args.rows_per_block,
            num_tasks=args.tasks,
            resume=not args.no_resume,
        )
        if args.verify:
            res = table_files.verify_table_files(spark, args.output)
            summary["verify_rows"] = res["rows"]
            summary["verify_mismatches"] = res["mismatches"]
        if args.compact_target and not summary.get("verify_mismatches"):
            from rlv import engine_files

            c = engine_files.compact_blocks(
                spark, args.output, target_bytes=args.compact_target
            )
            summary["compact_bins"] = c["bins_written"]
            summary["compact_absorbed"] = c["files_absorbed"]
    else:
        summary = table_files.decode_table_files(
            spark, args.input, args.output
        )

    print(json.dumps(summary))
    spark.stop()
    return 1 if summary.get("verify_mismatches") else 0


if __name__ == "__main__":
    sys.exit(main())
