"""Training-data pipeline text/embedding operators (SURVEY.md §2.10 additions).

Every op here is a pure DataFrame composition over built-in expressions — no
Python UDFs — so Catalyst keeps whole-stage codegen and partial aggregation,
and every output is exact-integer (or IEEE-exact double derived from exact
integers), which lets an independent DuckDB oracle reproduce it bit-for-bit.

Scale notes (each op at 10^12 docs):
* fingerprint/simhash/lang-id are map + one groupBy(doc) — map-side partial
  aggregation, no cross-doc shuffle beyond the doc key.
* the shingle self-join (n-gram Jaccard) is the classic near-dup join; the
  ``df_cap`` parameter drops stop-shingles (document frequency above a cap)
  before the join, which is what bounds the hot-key blowup at corpus scale.
* embedding near-dup is all-pairs only as the small-scale baseline; the scale
  path is to pre-bucket with :func:`ann` LSH buckets (see __spark_entry__'s
  ``ann_lsh_buckets``) or IVF cells (:func:`ivf_cells`) and join per bucket.
* ops that consume an internal relation more than once (shingles, bands,
  probes) STAGE it to scratch parquet (:func:`_stage`) instead of persisting:
  the upstream pipeline still runs exactly once, but no cached RDD outlives
  the call — a service session batching many corpora accumulates nothing,
  and at 100 TB this is the standard checkpoint-to-scratch-table pattern
  (columnar, spillable, shareable across stages without executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_DEFAULT_STAGE_DIRS: list[str] = []


def _stage(df: DataFrame, stage_dir: str | None, name: str) -> DataFrame:
    """Materialize ``df`` to scratch parquet and read it back.

    The parquet round-trip replaces ``persist(MEMORY_AND_DISK)``: every
    downstream consumer scans a compact columnar file instead of re-running
    the upstream pipeline, and the session holds no cached RDDs afterwards
    (asserted in tests).

    ``stage_dir=None`` creates a fresh driver-local temp dir, removed at
    interpreter exit — valid ONLY under a local master, where driver and
    executors share the filesystem; on a cluster master this raises, because
    each executor would write to its own local disk and the read-back would
    see nothing.  Cluster callers pass ``stage_dir`` on job-scoped shared
    storage and own its lifecycle."""
    import os
    import tempfile

    if stage_dir is None:
        master = df.sparkSession.conf.get("spark.master", "")
        if not master.startswith("local"):
            raise ValueError(
                "stage_dir is required on a non-local master: the default "
                "temp dir is driver-local, not a shared filesystem — pass a "
                "job-scoped scratch path (e.g. on the cluster's object "
                "store) instead"
            )
        base = tempfile.mkdtemp(prefix="rlv_stage_")
        if not _DEFAULT_STAGE_DIRS:
            import atexit
            import shutil

            atexit.register(
                lambda: [
                    shutil.rmtree(d, ignore_errors=True)
                    for d in _DEFAULT_STAGE_DIRS
                ]
            )
        _DEFAULT_STAGE_DIRS.append(base)
    else:
        base = stage_dir
    path = os.path.join(base, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def cleanup_stages() -> int:
    """Remove every default-staged scratch dir created so far.

    ``_stage(stage_dir=None)`` leaves each staged relation on local disk
    until interpreter exit (the Spark cache stays empty, but the disk does
    not) — a long-lived service session batching many corpora should call
    this after consuming each op's result.  Returns the number of dirs
    removed.  Only safe once the results built from the staged relations
    are fully materialized (collected or written): the staged parquet IS
    the lazy DataFrame's source."""
    import shutil

    n = len(_DEFAULT_STAGE_DIRS)
    for d in _DEFAULT_STAGE_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _DEFAULT_STAGE_DIRS.clear()
    return n

POLY_MOD = 4_294_967_296  # 2^32: poly-31 rolling hash stays exact in int64

# Rolling polynomial hash over the characters of a string column:
#   h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) mod 2^32)
# Exact integer arithmetic — identical in Spark and ANSI SQL.
def _rolling_hash(col: str) -> F.Column:
    return F.expr(
        f"aggregate(transform(split({col}, ''), c -> CAST(ascii(c) AS BIGINT)), "
        f"0L, (acc, x) -> (acc * 31 + x) % {POLY_MOD})"
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Whole-document rolling-hash fingerprint: (doc_id, fp).

    The content-address for exact dedup / resumability when md5 of the raw
    bytes is unavailable (e.g. the column is already tokenized): the same
    poly-31 chain extends to any sequence of ints.
    """
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _rolling_hash("text").alias("fp"),
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash fingerprints over whitespace words: (doc_id, simhash).

    Per word w: h(w) = rolling poly-31 hash; bit j of the fingerprint is set
    iff sum over words of (+1 if bit j of h(w) else -1) >= 0.  Near-dup pairs
    are then fingerprints at small Hamming distance; at scale, candidates come
    from grouping on fingerprint bands (same LSH idea as MinHash banding).
    One explode + one groupBy(doc_id) with 2*bits integer aggregates — all
    map-side combinable.
    """
    words = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    hashed = words.select("doc_id", _rolling_hash("w").alias("h"))
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("h").bitwiseAND(F.lit(1 << j))) != 0, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


def _simhash_banded(docs: DataFrame, bits: int, bands: int) -> DataFrame:
    """(doc_id, simhash, band_idx, band_val): the byte-band LSH relation."""
    band_width = bits // bands
    mask = (1 << band_width) - 1
    sig = simhash(docs, bits)
    return sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.expr(f"(simhash >> {band_width * j}) & {mask}").alias(
                            "band_val"
                        ),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_idx", "b.band_val")


def simhash_bucket_stats(
    docs: DataFrame, bits: int = 32, bands: int = 4, max_bucket: int | None = 64
) -> DataFrame:
    """Per-LSH-bucket sizes with the cap verdict: (band_idx, band_val, n_docs,
    dropped).  ``dropped = 1`` marks buckets over ``max_bucket`` — the
    degenerate-content monitor that pairs with :func:`simhash_neardup_pairs`
    (every dropped bucket is mass-duplicated boilerplate, the signal a corpus
    pipeline alerts on rather than pair-expanding)."""
    banded = _simhash_banded(docs, bits, bands)
    sizes = banded.groupBy("band_idx", "band_val").agg(
        F.count("*").alias("n_docs")
    )
    cap = F.lit(max_bucket if max_bucket is not None else (1 << 62))
    return sizes.select(
        "band_idx",
        "band_val",
        "n_docs",
        F.when(F.col("n_docs") > cap, 1).otherwise(0).cast("int").alias("dropped"),
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    stage_dir: str | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: (doc_id_a, doc_id_b, hamming).

    Byte-band LSH over the fingerprints: candidates share at least one of
    ``bands`` equal bit-bands (a near-dup at Hamming distance <= bands-1 is
    guaranteed to share one by pigeonhole); the Hamming filter then runs only
    inside buckets.  Pairs are generated within buckets with the signatures
    carried along, so the fingerprint pipeline runs exactly once.

    ``max_bucket`` bounds the per-bucket doc array: buckets larger than the cap
    (mass-duplicated boilerplate at corpus scale) are dropped BEFORE the
    ``collect_set`` materializes them, so no executor ever holds an unbounded
    bucket row — :func:`simhash_bucket_stats` reports what was dropped.
    The cap is applied on a pre-aggregated count (map-side combinable), not on
    the collected array.  The DEFAULT is uncapped (full recall); capping is
    an explicit opt-in because it changes which pairs are returned — corpus
    pipelines should pass a cap AND monitor :func:`simhash_bucket_stats`.
    """
    banded = _simhash_banded(docs, bits, bands)
    if max_bucket is None:
        # the recall/cost tradeoff must be visible: an uncapped run pair-
        # expands O(bucket^2) on a hot band bucket (mass-duplicated
        # boilerplate).  Detecting the hot bucket up front would cost an
        # extra corpus pass, so warn at call time instead.
        import warnings

        warnings.warn(
            "simhash_neardup_pairs: max_bucket=None runs an UNCAPPED bucket "
            "self-join — a hot band bucket expands O(bucket^2) pairs at "
            "corpus scale; pass max_bucket and monitor simhash_bucket_stats",
            stacklevel=2,
        )
    if max_bucket is not None:
        # the banded relation feeds both the size count and the join side:
        # stage it (4 small rows per doc) so the simhash agg runs once and
        # no cached RDD outlives the call
        banded = _stage(banded, stage_dir, "simhash_banded")
        sizes = banded.groupBy("band_idx", "band_val").agg(
            F.count("*").alias("_bn")
        )
        banded = banded.join(
            F.broadcast(
                sizes.filter(F.col("_bn") > max_bucket).select(
                    "band_idx", "band_val"
                )
            ),
            ["band_idx", "band_val"],
            "left_anti",
        )
    buckets = (
        banded.groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "simhash"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds)), y -> "
                "struct(x.doc_id AS a, x.simhash AS sa, "
                "y.doc_id AS b, y.simhash AS sb))))"
            )
        ).alias("p")
    ).select("p.a", "p.sa", "p.b", "p.sb").distinct()
    return (
        pairs.select(
            F.col("a").alias("doc_id_a"),
            F.col("b").alias("doc_id_b"),
            F.expr("CAST(bit_count(sa ^ sb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def word_trigrams(docs: DataFrame) -> DataFrame:
    """Distinct word 3-gram shingles per doc: (doc_id, g)."""
    ws = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split("text", " ").alias("ws"),
    ).filter(F.size("ws") >= 3)
    return ws.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 2), i -> "
                "concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', "
                "element_at(ws, i + 2)))"
            )
        ).alias("g"),
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    min_jaccard_e6: int = 100_000,
    df_cap: int | None = None,
    stage_dir: str | None = None,
) -> DataFrame:
    """Near-dup candidate pairs by exact word-trigram Jaccard.

    Returns (doc_id_a, doc_id_b, inter, n_union, jaccard_e6) for pairs with
    jaccard >= min_jaccard_e6/1e6.  jaccard_e6 = inter*1_000_000 div union is
    pure integer arithmetic (oracle-exact).  ``df_cap`` drops shingles whose
    document frequency exceeds the cap before the self-join — the standard
    stop-shingle guard that keeps the hot-key groups bounded at corpus scale.

    The shingle relation is computed ONCE and staged to scratch parquet: it
    feeds the df-cap count, the per-doc sizes, and both self-join sides, so
    ``documents`` is scanned a single time and the session holds no cached
    RDDs afterwards (see :func:`_stage`).
    """
    # stage the RAW shingle relation: every downstream use (df-cap counts,
    # sizes, both join sides) scans the staged file, never documents again
    tg = _stage(word_trigrams(docs), stage_dir, "trigrams")
    if df_cap is not None:
        freq = tg.groupBy("g").agg(F.count("*").alias("df"))
        tg = tg.join(
            F.broadcast(freq.filter(F.col("df") > df_cap).select("g")),
            "g",
            "left_anti",
        )
    sizes = tg.groupBy("doc_id").agg(F.count("*").alias("ng"))
    a = tg.select(F.col("doc_id").alias("doc_id_a"), "g")
    b = tg.select(F.col("doc_id").alias("doc_id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_id_a")
                   .withColumnRenamed("ng", "na"), "doc_id_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_id_b")
              .withColumnRenamed("ng", "nb"), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("n_union"),
            F.expr("inter * 1000000L div (na + nb - inter)").alias("jaccard_e6"),
        )
        .filter(F.col("jaccard_e6") >= min_jaccard_e6)
    )


# Deterministic per-language function-word profiles (public knowledge, not
# data-derived).  Real deployments swap in bigger profiles; the pipeline
# shape is identical.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "en": ("the", "a", "of", "and", "in", "to", "is", "for"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "de", "et", "est", "un"),
}

EN_STOPWORDS = LANG_PROFILES["en"]


def lang_id(docs: DataFrame, min_ratio_e6: int = 30_000) -> DataFrame:
    """Stopword-profile language ID + quality ratios.

    (doc_id, n_words, de_hits, en_hits, es_hits, fr_hits, en_ratio_e6,
    is_english, lang): per-language function-word hit counts, the English
    quality ratio as an exact integer (hits*1e6 div words), and
    lang = argmax hits with alphabetical tie-break ('und' when every profile
    scores zero).  One explode + one conditional agg — map-side combinable.
    """
    words = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    hit_aggs = [
        F.sum(
            F.expr(
                "CASE WHEN w IN ({}) THEN 1 ELSE 0 END".format(
                    ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
                )
            )
        ).alias(f"{lang}_hits")
        for lang in sorted(LANG_PROFILES)
    ]
    agg = words.groupBy("doc_id").agg(F.count("*").alias("n_words"), *hit_aggs)
    best = None
    for lang in sorted(LANG_PROFILES):  # alphabetical = deterministic tie-break
        cond = " AND ".join(
            # must strictly beat alphabetically-earlier languages (they win
            # ties), only equal-or-beat later ones
            f"{lang}_hits > {o}_hits" if o < lang else f"{lang}_hits >= {o}_hits"
            for o in sorted(LANG_PROFILES)
            if o != lang
        )
        pick = F.expr(f"CASE WHEN {cond} THEN '{lang}' END")
        best = pick if best is None else F.coalesce(best, pick)
    lang_col = F.when(
        sum(F.col(f"{lang}_hits") for lang in LANG_PROFILES) == 0, F.lit("und")
    ).otherwise(best)
    return agg.select(
        "doc_id",
        "n_words",
        *[f"{lang}_hits" for lang in sorted(LANG_PROFILES)],
        F.expr("en_hits * 1000000L div n_words").alias("en_ratio_e6"),
        F.expr(
            f"CAST(CASE WHEN en_hits * 1000000L div n_words >= {min_ratio_e6} "
            "THEN 1 ELSE 0 END AS INT)"
        ).alias("is_english"),
        lang_col.alias("lang"),
    )


def _quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q, n2): embeddings quantized to exact ints (round(x*1000))
    with exact integer squared norms, so cosines are IEEE-exact doubles that
    compare identically on any engine."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))").alias("q"),
    ).select(
        "vec_id",
        "q",
        F.expr(
            "aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
        ).alias("n2"),
    )


def embedding_neardup_pairs(emb: DataFrame, min_cos_e6: int = 400_000) -> DataFrame:
    """Embedding-cosine near-dup pairs: (vec_id_a, vec_id_b, cos_e6) with
    cosine >= min_cos_e6/1e6, vec_id_a < vec_id_b.

    All-pairs is the correctness baseline; at scale, bucket first (LSH/IVF)
    and run this join per bucket.  cos_e6 = floor(dot/sqrt(n2a*n2b) * 1e6) on
    exact-int dot/norms is engine-portable.
    """
    q = _quantized(emb)
    a = q.select(
        F.col("vec_id").alias("vec_id_a"), F.col("q").alias("qa"),
        F.col("n2").alias("n2a"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_id_b"), F.col("q").alias("qb"),
        F.col("n2").alias("n2b"),
    )
    pairs = a.crossJoin(b).filter(F.col("vec_id_a") < F.col("vec_id_b"))
    return (
        pairs.select(
            "vec_id_a",
            "vec_id_b",
            F.floor(
                F.expr(
                    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, "
                    "(acc, x) -> acc + x)"
                )
                / F.sqrt((F.col("n2a") * F.col("n2b")).cast("double"))
                * 1_000_000
            ).alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= min_cos_e6)
    )


def embedding_neardup_bucketed(
    emb: DataFrame,
    min_cos_e6: int = 400_000,
    k_cells: int = 8,
    nprobe: int = 2,
    stage_dir: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucketed — the DEFAULT scale path.

    Candidates are pairs sharing at least one of their ``nprobe`` best IVF
    cells (multi-probe assignment catches boundary pairs a single-cell
    assignment splits); the exact cosine then runs only on candidates.  The
    cell equi-join replaces :func:`embedding_neardup_pairs`'s all-pairs
    crossJoin: at corpus scale the compare volume is sum of squared bucket
    sizes, not n^2, and only the k_cells centroids are ever broadcast.
    Output matches the all-pairs scorer restricted to bucket-sharing pairs:
    (vec_id_a, vec_id_b, cos_e6).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell").asc())
    # staged: the probe relation (nprobe small rows per vector) feeds both
    # sides of the candidate self-join — score against centroids once, and
    # leave no cached RDD behind
    probes = _stage(
        _cell_scores(emb, k_cells)
        .withColumn("crk", F.row_number().over(w))
        .filter(F.col("crk") <= nprobe)
        .select("vec_id", "cell"),
        stage_dir,
        "ivf_probes",
    )
    cand = (
        probes.select(F.col("vec_id").alias("vec_id_a"), "cell")
        .join(probes.select(F.col("vec_id").alias("vec_id_b"), "cell"), "cell")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    q = _quantized(emb)
    a = q.select(
        F.col("vec_id").alias("vec_id_a"), F.col("q").alias("qa"),
        F.col("n2").alias("n2a"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_id_b"), F.col("q").alias("qb"),
        F.col("n2").alias("n2b"),
    )
    return (
        cand.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            F.floor(
                F.expr(
                    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, "
                    "(acc, x) -> acc + x)"
                )
                / F.sqrt((F.col("n2a") * F.col("n2b")).cast("double"))
                * 1_000_000
            ).alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= min_cos_e6)
    )


def _cell_scores(emb: DataFrame, k: int) -> DataFrame:
    """(vec_id, cell, cos) for every vector x centroid pair; centroids are
    the k lowest vec_ids (deterministic k-means stand-in)."""
    q = _quantized(emb)
    cents = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"),
        F.col("q").alias("cq"),
        F.col("n2").alias("cn2"),
    )
    return q.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        (
            F.expr(
                "aggregate(zip_with(q, cq, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            )
            / F.sqrt((F.col("n2") * F.col("cn2")).cast("double"))
        ).alias("cos"),
    )


def ivf_topk(
    emb: DataFrame,
    k_centroids: int = 8,
    nprobe: int = 2,
    topk: int = 5,
    n_queries: int = 10,
) -> DataFrame:
    """IVF-probed ANN search: (query_id, rk, neighbor_id).

    Each query probes its ``nprobe`` max-cosine cells and ranks only the
    vectors assigned there — the cell equi-join replaces the O(n^2) compare;
    recall vs the brute-force baseline (`ann_topk`) is governed by nprobe.
    All cosines are IEEE-exact doubles over quantized ints; ties break to the
    lower neighbor/cell id, so the result is engine-portable.
    """
    from pyspark.sql import Window as W

    scores = _cell_scores(emb, k_centroids)
    w_cell = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell").asc())
    ranked = scores.withColumn("crk", F.row_number().over(w_cell))
    cells = ranked.filter(F.col("crk") == 1).select("vec_id", "cell")
    probes = (
        ranked.filter((F.col("crk") <= nprobe) & (F.col("vec_id") < n_queries))
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    cand = (
        probes.join(cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = _quantized(emb)
    a = q.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("qa"),
        F.col("n2").alias("n2a"),
    )
    # only the query vectors broadcast — the full corpus relation must not
    b = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qb"),
        F.col("n2").alias("n2b"),
    )
    scored = cand.join(a, "neighbor_id").join(F.broadcast(b), "query_id").select(
        "query_id",
        "neighbor_id",
        (
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            )
            / F.sqrt((F.col("n2a") * F.col("n2b")).cast("double"))
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", F.col("rk").cast("int").alias("rk"), "neighbor_id")
    )


def _cell_scores_from(emb: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(vec_id, cell, cos) against EXPLICIT integer centroids (broadcast)."""
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [(i, [int(x) for x in c]) for i, c in enumerate(centroids)],
        schema="cell int, cq array<bigint>",
    ).selectExpr(
        "cell", "cq",
        "aggregate(zip_with(cq, cq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
        " AS cn2",
    )
    q = _quantized(emb)
    return q.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        (
            F.expr(
                "aggregate(zip_with(q, cq, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            )
            / F.sqrt((F.col("n2") * F.col("cn2")).cast("double"))
        ).alias("cos"),
    )


def ivf_train(emb: DataFrame, k: int = 8, iters: int = 2) -> list[list[int]]:
    """Deterministic Lloyd refinement of the IVF coarse quantizer.

    Seeds with the k lowest vec_ids (the :func:`ivf_cells` stand-in), then
    ``iters`` rounds of (assign every vector to its max-cos centroid,
    recompute each centroid as the exact-integer floor-mean of its members).
    All arithmetic is integer/IEEE-exact, ties break to the lowest cell, so
    training is reproducible on any cluster.  Returns the k centroid vectors
    — broadcast-sized corpus metadata, persisted alongside the dataset like
    the FSST table.  Each round is one assignment join + one (cell, dim)
    partial+final aggregate: 2 scans per iteration, nothing driver-sized but
    the k*dims centroid matrix itself.
    """
    from pyspark.sql import Window as W

    q = _quantized(emb)
    seed = (
        q.filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select("q")
        .collect()
    )
    centroids = [[int(x) for x in r["q"]] for r in seed]
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell").asc())
    for _ in range(iters):
        assign = (
            _cell_scores_from(emb, centroids)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "cell")
        )
        sums = (
            assign.join(q, "vec_id")
            .select("cell", F.posexplode("q").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = (
                int(r["s"]), int(r["n"]),
            )
        new = []
        for c in range(len(centroids)):
            dims = by_cell.get(c)
            if not dims:  # empty cell keeps its centroid (deterministic)
                new.append(centroids[c])
                continue
            new.append(
                [dims[p][0] // dims[p][1] for p in sorted(dims)]
            )
        centroids = new
    return centroids


def ivf_cells_trained(emb: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """IVF cell assignment against trained centroids: (vec_id, cell),
    max-cosine with lowest-cell tie-break — :func:`ivf_cells` with the
    :func:`ivf_train` output instead of the seed stand-in."""
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell").asc())
    return (
        _cell_scores_from(emb, centroids)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("cell").cast("int").alias("cell"))
    )


def ivf_cells(emb: DataFrame, k: int = 8) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its max-cosine centroid.

    Centroids = the k lowest vec_ids (a deterministic stand-in for k-means —
    the assignment plumbing, the broadcast of the small centroid set, and the
    per-cell search pattern are what carry to scale).  Returns (vec_id, cell);
    ties break to the lowest centroid id.  ANN search then probes only the
    query's cell(s): the bucket-equi-join replaces the O(n^2) compare.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell").asc())
    return (
        _cell_scores(emb, k).withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("cell").cast("int").alias("cell"))
    )


def neardup_components(
    docs: DataFrame,
    pairs: DataFrame,
    stage_dir: str | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """Near-dup CLUSTERS from candidate pairs: connected components with the
    min doc_id as the cluster representative — the operator a dedup pipeline
    actually acts on (keep one doc per component, drop the rest).

    ``pairs`` is any near-dup pair relation (``minhash_neardup_pairs``,
    ``simhash_neardup_pairs``, ...) with columns (doc_id_a, doc_id_b);
    ``docs`` supplies the full id universe so singletons cluster as
    themselves.  Returns (doc_id, cluster_id, is_keeper) for EVERY doc.

    Algorithm: iterative min-label propagation to FIXPOINT — each round
    every node takes the min label among itself and its neighbors; staged
    to scratch parquet per round (bounded lineage, no cached RDDs).  Rounds
    needed = graph diameter; near-dup graphs are short-diameter (cliques of
    boilerplate + small chains), and the bucket caps upstream bound the
    component sizes.  At 10^12 docs the same loop runs with the edges
    bucketed by label (alternating large-star/small-star halves the
    diameter per round); the fixpoint semantics — and the DuckDB
    recursive-CTE oracle — are unchanged.
    """
    ids = docs.select(F.col("doc_id").cast("string").alias("doc_id")).distinct()
    half = pairs.select(
        F.col("doc_id_a").cast("string").alias("a"),
        F.col("doc_id_b").cast("string").alias("b"),
    )
    edges = _stage(
        half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct(),
        stage_dir,
        "cc_edges",
    )
    labels = _stage(
        ids.withColumn("label", F.col("doc_id")), stage_dir, "cc_labels"
    )
    for it in range(max_iters):
        nbr = edges.join(
            labels.select(F.col("doc_id").alias("b"), "label"), "b"
        ).select(F.col("a").alias("doc_id"), "label")
        new = (
            labels.select("doc_id", "label")
            .union(nbr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        new = _stage(new, stage_dir, f"cc_labels_{it}")
        changed = (
            new.join(
                labels.select("doc_id", F.col("label").alias("old")),
                "doc_id",
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"neardup_components did not converge in {max_iters} rounds — "
            "the pair graph has a longer path than any near-dup structure "
            "should; check the upstream bucket caps"
        )
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        F.when(F.col("doc_id") == F.col("label"), 1).otherwise(0)
        .cast("int")
        .alias("is_keeper"),
    )


def stratified_sample(
    docs: DataFrame, per_stratum: int = 50, stratum_col: str = "source"
) -> DataFrame:
    """Deterministic stratified sampling: the ``per_stratum`` docs with the
    LOWEST md5(doc_id) per stratum — the reproducible eval-split / debugging
    sample every training pipeline needs.  Hash-rank, not random: the same
    corpus always yields the same sample on any engine (the oracle recomputes
    it bit-for-bit), and resuming/retrying cannot change membership.

    Scale shape: one partial+final rank per stratum over hash keys — the
    window cardinality is docs-per-stratum; no data-dependent skew (md5 is
    uniform)."""
    from pyspark.sql import Window as W

    return (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .withColumn("rk", F.row_number().over(
            W.partitionBy("stratum").orderBy("h", "doc_id")
        ))
        .filter(F.col("rk") <= per_stratum)
        .select("doc_id", "stratum", F.col("rk").cast("int").alias("rk"))
    )
