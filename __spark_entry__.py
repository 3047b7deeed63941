"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship encode+verify on sf0.001.  ``queries``/``oracle_sql``
expose the SQL-checkable facets of the engine (SURVEY.md §5.2): run counting and
run decomposition (rl_encoding.v:467-481, 877-890), maxrun splitting (v:4137-4154),
compression-ratio aggregates (v:2744-2762), and the codec auto-selector itself —
the DuckDB oracle re-implements the exact block-size formulas in SQL, so the
whole selection pipeline is independently checked.

The token table is derived deterministically from ``documents.parquet``:
``tokens[i] = Unicode code point of text[i]`` (ASCII corpus; FIXTURES.md §1), so
oracles need only ``string_split``/``ascii`` + ANSI window functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlv import engine, tokens

# Shared CTE: explode documents into (doc_id, pos, tok) and derive per-doc runs
# with window functions — the oracle-side equivalent of rlv.kernels.rle.
_TOKS_CTE = """
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         unnest(string_split(text, '')) AS ch,
         generate_subscripts(string_split(text, ''), 1) AS pos
  FROM documents
),
tok2 AS (
  SELECT doc_id, source, pos, ascii(ch) AS tok FROM toks
),
flagged AS (
  SELECT doc_id, source, pos, tok,
         CASE WHEN tok IS DISTINCT FROM
                   lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
              THEN 1 ELSE 0 END AS f
  FROM tok2
),
grp AS (
  SELECT doc_id, source, pos, tok,
         sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM flagged
),
runs AS (
  SELECT doc_id, source, g, tok,
         CAST(count(*) AS BIGINT) AS cnt, min(pos) AS start_pos
  FROM grp GROUP BY doc_id, source, g, tok
)
"""


def _token_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens.tokens_from_documents(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: encode every document's token array with the
    auto-selected codec, decode it back, and report per-source totals with a
    mismatch count that must be zero (the per-row invariant)."""
    df = engine.with_group_id(_token_df(spark, "/root/testdata/sf0.001"), 16)
    encoded = engine.encode_pass(df)
    decoded = engine.decode_pass(encoded)
    joined = (
        df.select("doc_id", "source", "tokens")
        .join(decoded, "doc_id")
        .join(encoded.select("doc_id", "n_runs", "enc_bytes", "naive_bytes"), "doc_id")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("tokens")).alias("n_tokens"),
            F.sum("n_runs").alias("n_runs"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("naive_bytes").alias("naive_rle_bytes"),
            F.sum(
                F.when(F.col("tokens") != F.col("decoded"), 1).otherwise(0)
            ).alias("mismatches"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# queries() — each runs the engine's kernels; oracle_sql() recomputes the same
# result independently in DuckDB SQL.  Column names/types match exactly.
# ---------------------------------------------------------------------------


def _q_count_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_runs (v:467-481) per document, via the mapInArrow runs kernel."""
    runs = engine.runs_pass(_token_df(spark, sf_dir))
    return runs.groupBy("doc_id").agg(F.count("*").alias("n_runs"))


def _q_run_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decompose_runs (v:877-890) as rows: (doc_id, run_idx, count, value)."""
    return engine.runs_pass(_token_df(spark, sf_dir))


def _q_maxrun_byte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rle_encode_byte (v:4159): runs split at cap=255 (PackBits preset)."""
    return engine.runs_pass(_token_df(spark, sf_dir), cap=255)


def _q_compression_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compression stats: Σ tokens, Σ runs, naive-RLE byte budget
    (encode_space_usage, v:2744-2762)."""
    df = _token_df(spark, sf_dir)
    runs = engine.runs_pass(df).groupBy("doc_id").agg(F.count("*").alias("runs"))
    return (
        df.join(runs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("runs").alias("n_runs"),
            (F.sum("runs") * 16).alias("naive_rle_bytes"),
        )
    )


def _q_codec_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The auto-selector (SURVEY §2.10): chosen codec + exact encoded bytes per
    doc.  The oracle recomputes every candidate size in SQL and argmins."""
    df = engine.with_group_id(_token_df(spark, sf_dir), 16)
    enc = engine.encode_pass(df)
    return enc.select("doc_id", "codec_id", "enc_bytes")


def _q_roundtrip_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end roundtrip: count of docs whose decode(encode(tokens)) is
    bit-identical, per source.  Equals plain count(*) iff rle_correct
    (v:133-144) holds for every block — that IS the oracle."""
    df = engine.with_group_id(_token_df(spark, sf_dir), 16)
    encoded = engine.encode_pass(df)
    decoded = engine.decode_pass(encoded)
    ok = (
        df.select("doc_id", "source", "tokens")
        .join(decoded, "doc_id")
        .filter(F.col("tokens") == F.col("decoded"))
    )
    return ok.groupBy("source").agg(F.count("*").alias("n_verified"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on documents (training-data pipeline op): hash-groupBy,
    keep the lexicographically-smallest doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"),
                    F.col("doc_id").cast("string").alias("doc_id"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "count_runs": _q_count_runs,
        "run_decompose": _q_run_decompose,
        "maxrun_byte": _q_maxrun_byte,
        "compression_summary": _q_compression_summary,
        "codec_selection": _q_codec_selection,
        "roundtrip_verify": _q_roundtrip_verify,
        "dedup_exact": _q_dedup_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "count_runs": f"""
WITH {_TOKS_CTE}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY doc_id
""",
        "run_decompose": f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) - 1 AS INT)
         AS run_idx,
       cnt AS run_count,
       CAST(tok AS INT) AS run_value
FROM runs
""",
        "maxrun_byte": f"""
WITH {_TOKS_CTE},
pieces AS (
  SELECT doc_id, start_pos, tok, cnt,
         unnest(generate_series(1, CAST(ceil(cnt / 255.0) AS INT))) AS k
  FROM runs
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos, k) - 1 AS INT)
         AS run_idx,
       CAST(CASE WHEN k * 255 <= cnt THEN 255 ELSE cnt - (k - 1) * 255 END AS BIGINT)
         AS run_count,
       CAST(tok AS INT) AS run_value
FROM pieces
""",
        "compression_summary": f"""
WITH {_TOKS_CTE},
per_doc AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS runs, CAST(sum(cnt) AS BIGINT) AS toks
  FROM runs GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       CAST(sum(runs) AS BIGINT) AS n_runs,
       CAST(sum(runs) * 16 AS BIGINT) AS naive_rle_bytes
FROM per_doc GROUP BY source
""",
        # Full SQL re-implementation of the exact codec-size model
        # (rlv/blocks.py codec_sizes): bit lengths via printf('%b'), uvarint
        # lengths, byte-padded bit-packing, argmin with lowest-id tie-break.
        "codec_selection": f"""
WITH {_TOKS_CTE},
doc_runs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs, max(cnt) AS max_count
  FROM runs GROUP BY doc_id
),
doc_stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n, min(tok) AS minv, max(tok) AS maxv,
         CAST(count(DISTINCT tok) AS BIGINT) AS ndv
  FROM tok2 GROUP BY doc_id
),
s AS (
  SELECT d.doc_id, d.n, d.minv, d.maxv, d.ndv, r.n_runs, r.max_count
  FROM doc_stats d JOIN doc_runs r USING (doc_id)
),
bits AS (
  SELECT *,
    CASE WHEN maxv - minv = 0 THEN 0 ELSE length(printf('%b', maxv - minv)) END AS vbits,
    CASE WHEN max_count - 1 = 0 THEN 0 ELSE length(printf('%b', max_count - 1)) END AS cbits,
    CASE WHEN ndv - 1 = 0 THEN 0 ELSE length(printf('%b', ndv - 1)) END AS ibits,
    CASE WHEN maxv = 0 THEN 0 ELSE length(printf('%b', maxv)) END AS pbits,
    2 * minv AS zzmin
  FROM s
),
lens AS (
  SELECT *,
    (length(printf('%b', n)) + 6) // 7 AS ul_n,
    (length(printf('%b', n_runs)) + 6) // 7 AS ul_r,
    CASE WHEN zzmin = 0 THEN 1 ELSE (length(printf('%b', zzmin)) + 6) // 7 END AS ul_zz,
    (length(printf('%b', ndv)) + 6) // 7 AS ul_ndv
  FROM bits
),
sz AS (
  SELECT doc_id,
    1 + ul_n + 1 + 4 * n AS s_plain,
    1 + ul_r + ul_zz + 2
      + CASE WHEN cbits = 0 THEN 0 ELSE (n_runs * cbits + 7) // 8 END
      + CASE WHEN vbits = 0 THEN 0 ELSE (n_runs * vbits + 7) // 8 END AS s_rle,
    1 + ul_n + 1
      + CASE WHEN pbits = 0 THEN 0 ELSE (n * pbits + 7) // 8 END AS s_bitpack,
    1 + ul_n + ul_zz + 1
      + CASE WHEN vbits = 0 THEN 0 ELSE (n * vbits + 7) // 8 END AS s_for,
    1 + ul_n + ul_ndv + ul_zz + 1
      + CASE WHEN vbits = 0 THEN 0 ELSE (ndv * vbits + 7) // 8 END
      + 1 + CASE WHEN ibits = 0 THEN 0 ELSE (n * ibits + 7) // 8 END AS s_dict
  FROM lens
)
SELECT doc_id,
  CAST(CASE
    WHEN s_plain <= least(s_rle, s_bitpack, s_for, s_dict) THEN 1
    WHEN s_rle <= least(s_bitpack, s_for, s_dict) THEN 2
    WHEN s_bitpack <= least(s_for, s_dict) THEN 3
    WHEN s_for <= s_dict THEN 4
    ELSE 5 END AS INT) AS codec_id,
  CAST(least(s_plain, s_rle, s_bitpack, s_for, s_dict) AS BIGINT) AS enc_bytes
FROM sz
""",
        "roundtrip_verify": """
SELECT source, CAST(count(*) AS BIGINT) AS n_verified
FROM documents GROUP BY source
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(CAST(doc_id AS VARCHAR)) AS keeper
FROM documents GROUP BY md5(text)
""",
    }
