"""Benchmark harness: headline encode/decode throughput + N-vs-4N scaling.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...extra metrics...}

Input: a deterministic synthetic token table (FIXTURES.md families, seed 42)
sized from the documents table of ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) — cached as parquet under /tmp so repeated runs measure
the engine, not the generator.

The headline job is the python-native-scan encode (rlv.engine_files): plan
splits from parquet footers -> Spark-scheduled tasks -> pyarrow read -> numpy
encode -> direct parquet write + manifest.  Timings are best-of-N after one
untimed warmup pass per session (steady state: Python workers booted, JIT and
page cache warm) — matching how a long-running 100 TB job actually behaves.

Scaling evidence for the north rule (>=0.8 efficiency from N to 4N executors):
the same job at local[CPUS/4] and local[CPUS] on the same input; efficiency =
(throughput_4N / throughput_N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42
ROWS_PER_DOC = 96  # bench table rows = 96 x documents-table rows (~240M tokens at sf0.1)
REPEATS = 3


def _sf_label(sf_dir: str) -> str:
    tail = os.path.basename(os.path.normpath(sf_dir))
    return tail.replace("sf", "") if tail.startswith("sf") else tail


def _ensure_bench_table(spark, n_rows: int) -> str:
    path = f"/tmp/rlv_bench/tokens_r{n_rows}_s{SEED}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from rlv import tokens

        pdf = tokens.synth_token_pdf(n_rows, seed=SEED)
        # many small files -> fine-grained splits: ~4 tasks/core at full width
        # so one slow task can't set the wall clock (straggler packing)
        spark.createDataFrame(pdf, schema=tokens.TOKEN_SCHEMA).repartition(
            8 * max(CPUS, 8)
        ).write.mode("overwrite").parquet(path)
    return path


def _timed_file_encode(spark, tok_path: str, cpus: int) -> dict:
    """Best-of-N full encode job (plan + read + encode + write + manifest).

    More repeats at small widths: this host has multi-second noise episodes,
    and a small-cpus run is both longer and the denominator of the scaling
    ratio.  All raw times are reported for transparency.
    """
    from rlv import engine_files

    repeats = REPEATS + (2 if cpus <= max(2, CPUS // 8) else 0)
    best = None
    times = []
    for i in range(repeats + 1):  # +1: first run is the untimed warmup
        out = f"/tmp/rlv_bench/out_{cpus}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        summary = engine_files.encode_files_dataset(
            spark, tok_path, out, num_tasks=4 * cpus, resume=False
        )
        wall = time.perf_counter() - t0
        if i == 0:
            continue
        times.append(round(wall, 3))
        if best is None or wall < best["wall_sec"]:
            summary["wall_sec"] = wall
            summary["tokens_per_sec"] = summary["tokens"] / wall
            best = summary
    best["all_times"] = times
    return best


def main() -> None:
    from rlv import session

    sf = _sf_label(SF_DIR)
    queries: dict[str, float] = {}
    extra: dict = {}

    import pyarrow.parquet as pq

    spark = session.make_session(CPUS, app="rlv-bench")
    try:
        n_docs = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows
        n_rows = max(2000, ROWS_PER_DOC * n_docs)
        tok_path = _ensure_bench_table(spark, n_rows)

        s_big = _timed_file_encode(spark, tok_path, CPUS)
        queries["encode"] = round(s_big["wall_sec"], 3)
        extra["tokens"] = s_big["tokens"]
        extra["tokens_per_sec"] = round(s_big["tokens_per_sec"])
        extra["bytes_per_token"] = round(s_big["bytes_out"] / s_big["tokens"], 4)
        extra["compressed_bytes"] = s_big["bytes_out"]
        extra["naive_rle_bytes"] = s_big["naive_rle_bytes"]
        extra["budget_ok"] = bool(s_big["bytes_out"] <= s_big["naive_rle_bytes"])

        # decode+verify pass over the written blocks: lineage-driven per-split
        # compare (zero-shuffle; engine.verify_roundtrip is the join-based
        # JVM alternative, ~10x slower at this SF)
        from rlv import engine_files

        t_best = None
        for i in range(2):
            t0 = time.perf_counter()
            res = engine_files.verify_files_dataset(
                spark, tok_path, f"/tmp/rlv_bench/out_{CPUS}", num_tasks=4 * CPUS
            )
            t = time.perf_counter() - t0
            t_best = t if t_best is None else min(t_best, t)
        queries["decode_verify"] = round(t_best, 3)
        extra["verify_mismatches"] = res["mismatches"]
        extra["verify_tokens_per_sec"] = round(res["tokens"] / t_best)

        # run-statistics facet (count_runs over the corpus, files plane: the
        # JVM list-column Arrow transfer alone costs ~25x this)
        t_best = None
        for i in range(2):
            t0 = time.perf_counter()
            cr = engine_files.count_runs_files(spark, tok_path, num_tasks=4 * CPUS)
            t = time.perf_counter() - t0
            t_best = t if t_best is None else min(t_best, t)
        queries["count_runs"] = round(t_best, 3)
        extra["n_runs"] = cr["runs"]

        # LPT balance evidence: per-split encode CPU from the manifest; at
        # 1000 executors the max/mean ratio IS the straggler factor
        mpdf = engine_files._read_manifest_pdf(f"/tmp/rlv_bench/out_{CPUS}")
        cpu = mpdf["encode_cpu_ns"].to_numpy()
        if cpu.size and cpu.mean() > 0:
            extra["split_cpu_imbalance"] = round(float(cpu.max() / cpu.mean()), 3)
    finally:
        spark.stop()

    # Scaling: the same job at N and 4N cores on the same input, at two pairs.
    # (2, 8) sits in this host's uncontended region; (8, 32) additionally
    # measures host oversubscription (a pure-ALU spin loop already inflates
    # ~1.3x at 32-way here — see BASELINE.md "scaling" notes), so the 2->8
    # pair is the cleaner proxy for adding executors on a real cluster.
    results = {CPUS: s_big}
    for cpus in sorted({max(1, CPUS // 16), max(1, CPUS // 4)}):
        spark_s = session.make_session(cpus, app=f"rlv-bench-{cpus}")
        try:
            results[cpus] = _timed_file_encode(spark_s, tok_path, cpus)
            queries[f"encode_{cpus}cpu"] = round(results[cpus]["wall_sec"], 3)
        finally:
            spark_s.stop()

    def _eff(lo: int, hi: int) -> dict:
        tl = results[lo]["tokens_per_sec"]
        th = results[hi]["tokens_per_sec"]
        return {
            "cpus_small": lo,
            "cpus_big": hi,
            "tokens_per_sec_small": round(tl),
            "tokens_per_sec_big": round(th),
            "efficiency": round((th / tl) / (hi / lo), 3),
        }

    lo = max(1, CPUS // 16)
    mid = max(1, CPUS // 4)
    extra["scaling"] = _eff(lo, mid) if mid > lo else _eff(mid, CPUS)
    if mid > lo:
        extra["scaling_contended"] = _eff(mid, CPUS)
    extra["encode_times"] = {str(c): r.get("all_times") for c, r in results.items()}

    print(
        json.dumps(
            {
                "metric": "token_encode_wall_sec",
                "value": queries["encode"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
