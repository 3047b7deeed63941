"""Structured Streaming ingest: encode token files as they arrive.

The reference's "streaming" is an incremental *chunk* API (SURVEY.md §2.6-2.7,
implemented in ``rlv.kernels.rle.stream_*`` and
``rlv.engine.encode_chunked_sequences``); nothing in the spec is event-timed.
This module adds the orthogonal production concern: a landing directory where
token parquet files keep arriving, encoded continuously with exactly-once
accounting.

Design: ``readStream`` file source discovers new files; ``foreachBatch``
routes each micro-batch back into the python-native data plane — the batch's
*file list* (from ``input_file_name``) is re-planned into row-group splits and
encoded by :func:`rlv.engine_files.encode_splits`.  Idempotency is layered:

* Spark's streaming checkpoint makes file->batch assignment exactly-once;
* the split manifest skips already-done splits on reprocessing;
* blocks are byte-deterministic (rl_encoding.v:1524-1538), so even a replayed
  split rewrites identical bytes — at-least-once execution yields
  exactly-once output.

At 10^12-sequence scale this is the continuous-ingest mode: the micro-batch
plan is metadata-only (footers of the new files), and the encode itself stays
zero-shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rlv import engine_files


def _local_path(uri: str) -> str:
    """file: URI (as produced by input_file_name(), percent-encoded) -> path."""
    from urllib.parse import unquote, urlparse

    if uri.startswith("file:"):
        return unquote(urlparse(uri).path)
    return unquote(uri) if "%" in uri else uri


def encode_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    num_tasks: int | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    schema=None,
):
    """Start (and, with ``available_now``, run to completion) the streaming
    encode of ``input_dir`` into ``out_dir``.

    ``schema`` (a StructType or DDL string) lets a continuous service start
    on an EMPTY landing directory — the normal deployment order for ingest;
    without it the schema is inferred from files already present, which
    raises if there are none yet.

    Returns the StreamingQuery (already awaited when ``available_now``).
    """
    if checkpoint_dir is None:
        checkpoint_dir = f"{out_dir}/_stream_checkpoint"
    if num_tasks is None:
        num_tasks = 4 * spark.sparkContext.defaultParallelism
    if schema is None:
        try:
            schema = spark.read.parquet(input_dir).schema
        except Exception as e:
            raise ValueError(
                f"cannot infer the stream schema from {input_dir!r} (empty or "
                "unreadable landing directory); pass schema= to start the "
                "stream before the first file arrives"
            ) from e

    def process_batch(batch_df, batch_id: int) -> None:
        files = [
            _local_path(r[0])
            for r in batch_df.select(F.input_file_name()).distinct().collect()
        ]
        files = [f for f in files if f]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            # the checkpoint is about to mark these consumed; skipping them
            # silently would be permanent data loss, so fail the batch
            raise FileNotFoundError(
                f"streaming batch {batch_id}: source files missing: {missing[:3]}"
            )
        if not files:
            return
        splits = engine_files.plan_splits_for_files(files, num_tasks)
        engine_files.encode_splits(spark, splits, out_dir, resume=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return q
