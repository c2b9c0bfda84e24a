"""Write PLANS.md: formatted physical plans of the flagship paths with
the properties that matter at 100TB called out (filter/column pushdown
into the parquet scan, broadcast joins, whole-stage codegen spans,
shuffle count). Re-run after plan-affecting changes:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def captured_explain(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit(plan: str, simple_plan: str) -> list[str]:
    tree = plan.split("\n\n")[0]
    n_shuffles = len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", tree))
    n_bhj = len(re.findall(r"BroadcastHashJoin", tree))
    n_arrow = len(re.findall(r"ArrowEvalPython", tree))
    # executed-plan tree marks whole-stage-codegen spans as '*(N) Op'
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", simple_plan)))
    notes = [
        f"- shuffles (`Exchange`): {n_shuffles}",
        f"- broadcast joins: {n_bhj}",
        f"- Arrow/pandas UDF nodes: {n_arrow}",
        f"- whole-stage codegen spans: {n_wsc}",
    ]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if pushed:
        notes.append(f"- pushed filters: {pushed[0][:120] or '(none needed)'}")
    read = re.findall(r"ReadSchema: ([^\n]*)", plan)
    if read:
        notes.append(f"- read schema (column pruning): `{read[0][:160]}`")
    return notes


def main() -> None:
    from pyspark.sql import functions as F

    from vector_spark.plans.transcript_pipeline import run_pipeline, run_pipeline_fused
    from vector_spark.queries import QUERIES, transcripts
    from vector_spark.session import get_spark

    spark = get_spark("plans", cores=8)
    sf_dir = "/root/testdata/sf0.01"
    tdf = transcripts(spark, sf_dir)

    sections = []

    def add(title, df):
        # formatted tree BEFORE execution (post-execution it prepends
        # the initial plan too and every node would count twice); the
        # executed plan AFTER collect() for codegen spans, which AQE
        # hides until this dataframe's own query execution runs
        # (count() would build a new plan and leave this one cold)
        formatted = captured_explain(df)
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        sections.append((title, formatted, final))

    add("Flagship fused pipeline (single action)", run_pipeline_fused(spark, tdf))
    out = run_pipeline(spark, tdf, cache_routes=False)
    add("Multi-port pipeline — errors sink aggregate", out.aggregates["errors"])
    add("Broadcast enrichment lookup (op_enrich_dim)", QUERIES["op_enrich_dim"](spark, sf_dir))
    add("Exact dedup hash-groupBy (dp_exact_dedup)", QUERIES["dp_exact_dedup"](spark, sf_dir))
    add(
        "Counter-mode sample, two-phase global numbering (op_sample_counter)",
        QUERIES["op_sample_counter"](spark, sf_dir),
    )
    add(
        "Cosine near-dup, bucketed equi-join path (dp_cosine_near_dup_bucketed)",
        QUERIES["dp_cosine_near_dup_bucketed"](spark, sf_dir),
    )
    add(
        "Histogram merge, posexplode + two-level aggregate (op_agg_histogram)",
        QUERIES["op_agg_histogram"](spark, sf_dir),
    )
    add(
        "MinHash LSH pairs, AQE exchange-reuse shingle frame (dp_minhash_lsh_pairs)",
        QUERIES["dp_minhash_lsh_pairs"](spark, sf_dir),
    )
    add(
        "Datadog-search routed filter, pushdown-eligible (op_route_ddsearch)",
        QUERIES["op_route_ddsearch"](spark, sf_dir),
    )
    add(
        "tag_cardinality_limit accept-set, TakeOrderedAndProject top-N (op_cardinality)",
        QUERIES["op_cardinality"](spark, sf_dir),
    )
    add(
        "IVF-Flat ANN, trained centroids + cluster equi-join (dp_ann_ivf)",
        QUERIES["dp_ann_ivf"](spark, sf_dir),
    )
    add(
        "Datadog grok alias parse, one Arrow crossing (op_parse_grok_aliases)",
        QUERIES["op_parse_grok_aliases"](spark, sf_dir),
    )
    add(
        "Gopher repetition signals, zero-shuffle projections (dp_repetition)",
        QUERIES["dp_repetition"](spark, sf_dir),
    )
    add(
        "Benchmark decontamination, broadcast eval n-grams (dp_decontaminate)",
        QUERIES["dp_decontaminate"](spark, sf_dir),
    )
    add(
        "Corpus top-k words, TakeOrderedAndProject heavy-hitters (dp_top_words)",
        QUERIES["dp_top_words"](spark, sf_dir),
    )
    add(
        "SimHash near-dup pairs, band-bucketed Hamming join (dp_simhash_pairs)",
        QUERIES["dp_simhash_pairs"](spark, sf_dir),
    )
    add(
        "VRL-source remap, compiled to Columns — no EvalPython (op_remap_vrl)",
        QUERIES["op_remap_vrl"](spark, sf_dir),
    )
    add(
        "Mergeable DDSketch, native log-gamma bin expressions (op_agg_sketch)",
        QUERIES["op_agg_sketch"](spark, sf_dir),
    )
    add(
        "DDSketch merge-of-merges, stored-sketch re-aggregation (op_agg_sketch_merge)",
        QUERIES["op_agg_sketch_merge"](spark, sf_dir),
    )
    add(
        "Dup-group labels, large/small-star connected components (dp_dup_groups)",
        QUERIES["dp_dup_groups"](spark, sf_dir),
    )
    add(
        "Canonical-doc dedup over dup groups (dp_dedup_keep)",
        QUERIES["dp_dedup_keep"](spark, sf_dir),
    )
    add(
        "line_agg full mode enum, lag'd boundary markers (op_line_agg_modes)",
        QUERIES["op_line_agg_modes"](spark, sf_dir),
    )
    add(
        "Span-level dedup, join-free distinct-span keep-first (dp_span_dedup)",
        QUERIES["dp_span_dedup"](spark, sf_dir),
    )
    add(
        "PII redaction, zero-shuffle JVM regexp chain (dp_redact)",
        QUERIES["dp_redact"](spark, sf_dir),
    )
    add(
        "Bigram-LM perplexity, persisted model + broadcast joins (dp_lm_perplexity)",
        QUERIES["dp_lm_perplexity"](spark, sf_dir),
    )
    add(
        "Context-window packing, two-phase weighted prefix sum (dp_pack_chunks)",
        QUERIES["dp_pack_chunks"](spark, sf_dir),
    )
    add(
        "Composed curation chain, one-projection signals + LM gate (dp_curate_corpus)",
        QUERIES["dp_curate_corpus"](spark, sf_dir),
    )
    add(
        "URL canonicalization + URL-level dedup, single combinable groupBy (dp_url_dedup)",
        QUERIES["dp_url_dedup"](spark, sf_dir),
    )
    add(
        "Exact fixed-N per-stratum sample, WindowGroupLimit pushdown (dp_sample_n)",
        QUERIES["dp_sample_n"](spark, sf_dir),
    )
    add(
        "Semantic dedup, bucketed pairs + components + keep-best (dp_semantic_dedup)",
        QUERIES["dp_semantic_dedup"](spark, sf_dir),
    )

    md = [
        "# PLANS — physical plans of the flagship paths\n",
        "Generated by `python scripts/dump_plans.py` (sf0.01 inputs;",
        "plan shape is scale-invariant). What to check per plan:",
        "`PushedFilters`/`ReadSchema` on the scan (pushdown + pruning),",
        "`BroadcastHashJoin` (no fact-side shuffle for dims),",
        "`WholeStageCodegen` spans (JVM-side expressions), Exchange",
        "count (shuffles), single `ArrowEvalPython` (the one pandas",
        "UDF crossing).\n",
        "Flagship note: of its 3 exchanges, the first is the",
        "single-parquet-file fan-out done by `transcripts()` for the",
        "oracle input — with a production bucketed table (many files,",
        "`days(ts), bucket(conv_id)`) the scan parallelizes natively",
        "and the job is 2 shuffles: the stable-order window exchange",
        "(compact post-parse columns — raw text is dropped before it)",
        "and the aggregate exchange. The window re-exchange exists",
        "because ArrowEvalPython does not propagate child partitioning;",
        "with the JVM-native grok path (use_pandas_grok=False) the",
        "window reuses the input clustering directly.\n",
        "Counter-sample note: its ONE SinglePartition exchange sits on",
        "the per-partition-counts subtree (O(num_partitions) rows, one",
        "row per input partition) feeding the broadcast of prefix-sum",
        "offsets — event data itself only crosses range and",
        "hash-by-partition-id exchanges, all fully parallel. The",
        "near-dup bucketed plan has NO CartesianProduct/BroadcastNLJ:",
        "candidates come from the quantization-bucket equi-join, and",
        "cells over max_bucket are dropped before pairing.\n",
        "Cardinality note: the accept-set top-N must show",
        "TakeOrderedAndProject (per-partition top-N, merge of <=limit",
        "rows) and NO window exec — a UUID-valued tag's distinct table",
        "never serializes through one task.\n",
        "LM-perplexity note: the static tree repeats the PERSISTED",
        "model-table lineage once per reference, inflating its Exchange",
        "count — at runtime the cache collapses those to one",
        "materialization each and the corpus crosses exactly 3",
        "map-side-combinable shuffles (unigram count, bigram count,",
        "per-doc score aggregate); vocab/context joins are explicit",
        "broadcasts, the bigram-model join is AQE-sized. The same",
        "static-count caveat applies to the curate chain, which embeds",
        "the LM: its runtime corpus-scale data movement is the LM's 3",
        "shuffles + the doc-keyed signal/LM join + ONE fingerprint",
        "keep-first window (profiled additive in BENCH.md).\n",
        "Packing note: its `Scan ExistingRDD` leaves are the",
        "localCheckpoint that PINS the range-partitioned layout before",
        "the cumsum/total branches fan out (r5 fix) — correct offsets",
        "no longer depend on exchange-reuse canonicalization, and the",
        "pre-checkpoint lineage (range exchange included) runs once.\n",
    ]
    for title, plan, simple in sections:
        md.append(f"\n## {title}\n")
        md.extend(audit(plan, simple))
        md.append("\n```")
        # physical plan only (trim the operator detail listing to keep
        # the file reviewable; the tree carries the structure)
        tree = plan.split("\n\n")[0]
        md.append(tree)
        md.append("```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(md))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
