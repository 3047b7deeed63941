"""spark-submit entry point for the decode/export job (the read direction).

Cluster:
    spark-submit --py-files rlv.zip jobs/decode_job.py \
        --input s3://bucket/encoded --output s3://bucket/tokens_restored

Sandbox:
    python jobs/decode_job.py --input /tmp/enc --output /tmp/tokens_out --cpus 32

Reads every blocks file under ``<input>/blocks`` and writes the reconstructed
token table (doc_id, tokens, n_tok, source) — one task per blocks file, zero
shuffle, bit-identical to the original source by the roundtrip law
(rl_encoding.v:133-144).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="encoded dir (blocks + manifest)")
    ap.add_argument("--output", required=True, help="token table output dir")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] when no cluster master is configured")
    ap.add_argument("--no-resume", action="store_true",
                    help="re-export files whose output already exists")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.cpus:
        from rlv.session import make_session

        spark = make_session(args.cpus, app="rlv-decode")
    else:
        spark = SparkSession.builder.appName("rlv-decode").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")

    from rlv import engine_files

    summary = engine_files.decode_files_dataset(
        spark, args.input, args.output, resume=not args.no_resume
    )
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
