"""End-to-end Spark engine tests (SURVEY.md §5.2): encode the synthetic token
table, decode every block, assert bit-identical tokens per doc_id, total
compressed bytes <= naive-RLE budget, and resumability from the manifest."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from rlv import blocks as B
from rlv import engine, manifest, tokens


@pytest.fixture(scope="module")
def token_df(spark):
    df = tokens.synth_tokens(spark, n_rows=400, seed=42)
    df.persist()
    df.count()
    return df


def test_encode_verify_roundtrip(spark, token_df, tmp_path):
    out = str(tmp_path / "enc")
    summary = engine.encode_dataset(spark, token_df, out, n_groups=16)
    assert summary["groups_encoded"] == 16
    assert summary["tokens"] == token_df.agg(F.sum("n_tok")).collect()[0][0]
    # the north-rule size constraint, per-group and in total
    assert summary["bytes_out"] <= summary["naive_rle_bytes"]

    encoded = spark.read.parquet(f"{out}/blocks")
    assert encoded.count() == token_df.count()
    res = engine.verify_roundtrip(token_df, encoded)
    assert res["rows"] == token_df.count()
    assert res["mismatches"] == 0


def test_per_group_budget_and_manifest(spark, token_df, tmp_path):
    out = str(tmp_path / "enc")
    engine.encode_dataset(spark, token_df, out, n_groups=8)
    mf = manifest.read_manifest(spark, out)
    rows = mf.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["status"] == "done"
        assert r["bytes_out"] <= r["naive_rle_bytes"]
        assert r["attempt"] == 1
        hist = json.loads(r["codec_hist"])
        assert sum(hist.values()) == r["n_docs"]
        assert r["tokens_per_cpu_sec"] > 0


def test_resume_skips_done_groups(spark, token_df, tmp_path):
    out = str(tmp_path / "enc")
    first = engine.encode_dataset(spark, token_df, out, n_groups=8)
    assert first["groups_encoded"] == 8
    second = engine.encode_dataset(spark, token_df, out, n_groups=8)
    assert second["groups_encoded"] == 0
    assert second["groups_skipped"] == 8
    # blocks still verify after the no-op resume
    encoded = spark.read.parquet(f"{out}/blocks")
    assert engine.verify_roundtrip(token_df, encoded)["mismatches"] == 0


def test_partial_manifest_resume(spark, token_df, tmp_path):
    """Simulate a crash: manifest knows only half the groups -> resume encodes
    exactly the missing half, and re-encoded blocks are byte-identical
    (determinism law, rl_encoding.v:1524-1538)."""
    out = str(tmp_path / "enc")
    engine.encode_dataset(spark, token_df, out, n_groups=8)
    full = {
        r["doc_id"]: bytes(r["block"])
        for r in spark.read.parquet(f"{out}/blocks").select("doc_id", "block").collect()
    }
    mf = manifest.read_manifest(spark, out)
    kept = mf.filter(F.col("group_id") < 4)
    kept_rows = kept.collect()
    spark.createDataFrame(kept_rows, schema=manifest.MANIFEST_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(manifest.manifest_path(out))
    second = engine.encode_dataset(spark, token_df, out, n_groups=8)
    assert second["groups_encoded"] == 4
    assert second["groups_skipped"] == 4
    redone = {
        r["doc_id"]: bytes(r["block"])
        for r in spark.read.parquet(f"{out}/blocks").select("doc_id", "block").collect()
    }
    assert redone == full


def test_encoded_blocks_match_local_kernels(spark, token_df, tmp_path):
    """The distributed encode agrees byte-for-byte with the local selector —
    i.e. Spark adds distribution, never changes semantics."""
    from rlv.selector import encode_auto

    out = str(tmp_path / "enc")
    engine.encode_dataset(spark, token_df, out, n_groups=4)
    got = {
        r["doc_id"]: (r["codec_id"], bytes(r["block"]))
        for r in spark.read.parquet(f"{out}/blocks")
        .select("doc_id", "codec_id", "block")
        .collect()
    }
    for r in token_df.collect():
        a = np.asarray(r["tokens"], dtype=np.int32)
        codec, block = encode_auto(a)
        exp_codec = 0 if a.size == 0 else codec
        assert got[r["doc_id"]] == (exp_codec, block if a.size else b""), r["doc_id"]


def test_tokens_from_documents(spark):
    df = tokens.tokens_from_documents(spark, "/root/testdata/sf0.001")
    row = df.first()
    assert row["n_tok"] == len(row["tokens"])
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    text = docs.filter(F.col("doc_id") == row["doc_id"]).first()["text"]
    assert [ord(c) for c in text] == list(row["tokens"])


def test_plan_balanced_spreads_skew(spark):
    """Zipf-skewed n_tok: LPT keeps the max bucket near the mean (north rule)."""
    df = tokens.synth_tokens(spark, 300, seed=7, families=("zipf_skew",))
    df = engine.with_group_id(df, 64)
    planned = engine.plan_balanced(df, 4)
    sizes = (
        planned.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("n_tok").alias("toks"))
        .collect()
    )
    loads = [int(r["toks"]) for r in sizes]
    total = sum(loads)
    # no bucket holds more than 60% of the mass unless one group dominates
    per_group = df.groupBy("group_id").agg(F.sum("n_tok").alias("l")).collect()
    biggest_group = max(int(r["l"]) for r in per_group)
    assert max(loads) <= max(int(0.6 * total), biggest_group)


def test_encode_chunked_sequences_equals_batch(spark):
    """stream_eq_batch (rl_encoding.v:4695-4715) distributed: sequences split
    into arbitrary row-chunks encode to the same blocks as whole arrays,
    including seams where equal values straddle chunk boundaries."""
    import numpy as np
    from rlv import blocks as B
    from rlv.kernels import rle

    rng = np.random.default_rng(7)
    docs = {}
    rows = []
    for i in range(40):
        n = int(rng.integers(0, 400))
        a = np.repeat(rng.integers(0, 5, size=max(n // 7, 1)),
                      rng.integers(1, 9, size=max(n // 7, 1)))[:n].astype(np.int64)
        docs[f"d{i}"] = a
        cuts = sorted(rng.integers(0, max(a.size, 1), size=int(rng.integers(0, 4))))
        for j, chunk in enumerate(np.split(a, cuts)):
            rows.append((f"d{i}", j, [int(x) for x in chunk]))
    df = spark.createDataFrame(rows, schema="doc_id string, chunk_idx int, tokens array<long>")
    out = {r["doc_id"]: r for r in engine.encode_chunked_sequences(df).collect()}
    assert set(out) == set(docs)
    for did, a in docs.items():
        r = out[did]
        assert r["n_tok"] == a.size
        if a.size:
            c, v = rle.rle_encode(a)
            assert bytes(r["block"]) == B.encode_rle_runs(c, v)
            np.testing.assert_array_equal(
                B.decode_block(bytes(r["block"]), np.int64), a
            )
        else:
            assert bytes(r["block"]) == b""


def test_decode_size_guard_catches_corruption(spark, token_df, tmp_path):
    """safe_decode_with_limit semantics (rl_encoding.v:5034-5069) in the read
    path: a block whose decoded size disagrees with n_tok fails loudly."""
    out = str(tmp_path / "enc")
    engine.encode_dataset(spark, token_df, out, n_groups=4)
    encoded = spark.read.parquet(f"{out}/blocks")
    corrupted = encoded.withColumn(
        "n_tok", F.when(F.col("n_tok") > 0, F.col("n_tok") + 1).otherwise(0)
    )
    with pytest.raises(Exception, match="corrupt block|declared n_tok"):
        engine.decode_pass(corrupted).collect()
    # and the honest table still decodes
    assert engine.decode_pass(encoded).count() == encoded.count()


def test_batch_stats_with_trailing_empty_docs():
    """Segmented per-doc reductions must not truncate the last nonempty
    doc's segment when a batch ends with empty docs (review r3: the clamped
    reduceat dropped the final run/diff, mis-sizing blocks and crashing the
    bit packer).  Batch results must equal the scalar path exactly."""
    import numpy as np
    import pyarrow as pa

    from rlv import blocks as B
    from rlv import selector
    from rlv.engine import _batch_doc_stats, _encode_arrow_batches
    from rlv.stats import chunk_stats

    cases = [
        [[1, 1, 2, 2, 9], []],                      # max in the final run
        [[0, 1, 2, 3, 4, 5, 6, 7, 1000000], []],    # max delta at the end
        [[], [5, 5, 5], [], []],
        [[3], [], [7, 100000], []],
    ]
    for docs in cases:
        offs = np.zeros(len(docs) + 1, np.int64)
        np.cumsum([len(d) for d in docs], out=offs[1:])
        a = (
            np.concatenate([np.asarray(d, np.int32) for d in docs])
            if any(len(d) for d in docs)
            else np.empty(0, np.int32)
        )
        r = _batch_doc_stats(a, offs)
        minv, maxv, max_zz = r[4], r[5], r[12]
        for i, d in enumerate(docs):
            s = chunk_stats(np.asarray(d, np.int64))
            assert (minv[i], maxv[i], max_zz[i]) == (
                s.min_val, s.max_val, s.max_zz_delta
            ), (docs, i)
        tb = pa.table(
            {
                "doc_id": [str(i) for i in range(len(docs))],
                "source": ["s"] * len(docs),
                "group_id": pa.array(np.zeros(len(docs), np.int32)),
                "tokens": pa.array(docs, pa.list_(pa.int32())),
                "n_tok": pa.array([len(d) for d in docs], pa.int32()),
            }
        )
        out = []
        for b in tb.to_batches():
            out.extend(_encode_arrow_batches(iter([b])))
        blobs = pa.Table.from_batches(out).column("block").to_pylist()
        for i, d in enumerate(docs):
            assert blobs[i] == selector.encode_auto(np.asarray(d, np.int64))[1]
