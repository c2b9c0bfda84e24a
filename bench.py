"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <e2e pipeline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The headline metric is the end-to-end flagship pipeline
(parse -> enrich -> route -> aggregate over the transcripts table,
all four sinks + dropped channel materialized) — the analogue of the
reference's http_pipelines_blackhole regression case. Extras include
turns/sec throughput for BENCH.md scaling math.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_bench(sf_dir: str, cores: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from pyspark.sql import functions as F

    from vector_spark.queries import QUERIES, transcripts
    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-bench", cores=cores)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    timings: dict[str, float] = {}

    # -- headline: end-to-end pipeline ------------------------------------
    tdf = transcripts(spark, sf_dir)
    n_turns = tdf.count()  # warm the input cache/file listing

    from vector_spark.plans.metrics import StageMetrics
    from vector_spark.plans.transcript_pipeline import run_pipeline_fused

    # warm-up passes (JVM JIT + python-worker startup excluded: the
    # baseline metric is sustained throughput under fixed load)
    for _ in range(2):
        run_pipeline_fused(spark, tdf).count()

    runs = []
    metrics = StageMetrics()
    sink_counts: dict = {}
    agg_rows = 0
    for i in range(3):
        m = StageMetrics()
        t0 = time.perf_counter()
        fused = run_pipeline_fused(spark, tdf, metrics=m)
        rows = fused.groupBy("sink").agg(
            F.sum("events").alias("n"), F.count(F.lit(1)).alias("groups")
        ).collect()
        runs.append(time.perf_counter() - t0)
        sink_counts = {r["sink"]: r["n"] for r in rows}
        agg_rows = sum(r["groups"] for r in rows)
        metrics = m
    runs.sort()
    e2e = runs[1]  # median of 3
    timings["pipeline_e2e"] = round(e2e, 3)
    timings["pipeline_e2e_best"] = round(runs[0], 3)
    stage = metrics.collect()
    dropped = int(stage.get("parse_enrich", {}).get("dropped", -1))

    # -- secondary headline queries ---------------------------------------
    secondary = [
        "op_agg_hourly",
        "op_dedupe",
        "op_reduce_daily",
        "op_reduce_sessions",
        "op_parse_syslog",
        "tpch_q1",
        "dp_minhash_sig",
        "dp_minhash_lsh_pairs",
        "dp_simhash",
        "dp_cosine_topk",
        "dp_exact_dedup",
        "dp_clean_corpus",
        "op_agg_salted",
        # round 2 additions (absent from BENCH_r01 by definition)
        "op_sample_counter",
        "dp_cosine_near_dup_bucketed",
        "op_agg_histogram",
        "op_parse_combined",
        "op_route_ddsearch",
        # round 3 additions
        "op_parse_grok_aliases",
        "op_decode_avro",
        "op_decode_native_proto",
        "op_cardinality",
        "dp_ann_ivf",
        "dp_repetition",
        "dp_decontaminate",
        "dp_simhash_pairs",
        # round 4 additions
        "op_line_agg_modes",
        "op_agg_sketch",
        "op_agg_sketch_merge",
        "dp_dup_groups",
        "dp_dedup_keep",
        "dp_stratified_sample",
        "dp_tfidf_terms",
        "dp_span_dedup",
        "dp_redact",
        "dp_lm_perplexity",
        "dp_pack_chunks",
        "dp_curate_corpus",
    ]
    for name in secondary:
        fn = QUERIES[name]
        best = None
        # min of 2 full evaluations: this sandbox is a shared host and
        # A/B reruns of IDENTICAL commits showed up to 1.8x swings from
        # neighbor load (r4 bisect); min-of-2 damps that without
        # changing what is measured — each run still evaluates every
        # output column into the noop sink.
        for _ in range(2):
            t0 = time.perf_counter()
            # noop sink, NOT count(): count() lets Catalyst prune columns
            # the query exists to compute (dp_simhash's signature UDF was
            # pruned entirely — 0.2 s where the honest cost is ~4 s); the
            # noop write evaluates every output column and discards rows
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    return {
        "metric": "pipeline_e2e_sec",
        "value": timings["pipeline_e2e"],
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cores": cores,
        "turns": n_turns,
        "throughput_turns_per_sec": round(n_turns / e2e, 1),
        "sink_counts": sink_counts,
        "agg_rows": agg_rows,
        "dropped": dropped,
        "stage_metrics": {k: {m: int(x) for m, x in v.items()} for k, v in stage.items()},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cores)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
