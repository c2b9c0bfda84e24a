"""Two-parallelism scaling evidence for the CORPUS (datapipe) side —
the same N -> 4N pinned-core method as scripts/scaling_run.py (which
covers the flagship transcript pipeline), applied to the composed
curation chain `dp_curate_corpus` (signal projection + bigram-LM
train/score + redacted-fingerprint dedup + split): the most
shuffle-diverse datapipe job in the repo (3 LM count shuffles, a
doc-keyed join, a window).

Input: the driver's sf0.1 documents table replicated REP x with
offset doc_ids (deterministic, derived only from driver testdata;
path embeds REP so resizing regenerates). Hardware pinning via
`taskset -c` for the same reason documented in scaling_run.py: an
unpinned local[N] consumes more than N hardware cores.

Appends the result to BENCH.md and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, os, json, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cores})
from pyspark.sql import functions as F
from vector_spark.session import get_spark
from vector_spark.datapipe.corpus_pipeline import curate_corpus

spark = get_spark("scaling-dp", cores={cores})
path = {path!r}
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    base = spark.read.parquet({src!r})
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range({rep})
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(path)
docs = spark.read.parquet(path)
n = docs.count()
text_bytes = docs.select(F.sum(F.length("text"))).collect()[0][0]
if {gen_only}:
    print("RESULT::" + json.dumps({{"docs": n}}))
    raise SystemExit(0)


def job():
    curate_corpus(docs, min_words=5, max_xent=3.43, vocab_size=256).write.format(
        "noop"
    ).mode("overwrite").save()


spark.catalog.clearCache(); job()  # warm-up: JIT + model-cache path
runs = []
for i in range(3):
    spark.catalog.clearCache()
    t0 = time.perf_counter(); job(); runs.append(time.perf_counter() - t0)
runs.sort()
print("RESULT::" + json.dumps({{
    "cores": {cores}, "docs": n, "sec_median": round(runs[1], 3),
    "sec_all": [round(r, 3) for r in runs],
    "throughput_docs_per_sec": round(n / runs[1], 1),
    "text_mb_per_sec": round(text_bytes / runs[1] / 1e6, 1),
}}))
"""


def data_path(rep: int) -> str:
    return os.path.join(REPO, "data", f"documents_bench_x{rep}")


def run_at(cores: int, rep: int, src: str, pin: bool = True, gen_only: bool = False) -> dict:
    code = RUNNER.format(
        repo=REPO, cores=cores, path=data_path(rep), src=src, rep=rep,
        gen_only=gen_only,
    )
    cmd = [sys.executable, "-c", code]
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"scaling-dp at {cores} cores failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n = int(os.environ.get("SCALING_N", "2"))
    rep = int(os.environ.get("SCALING_DOC_REP", "4"))
    src = os.environ.get("SCALING_DOC_SRC", "/root/testdata/sf0.1/documents.parquet")
    run_at(os.cpu_count(), rep, src, pin=False, gen_only=True)  # generate unpinned
    hi = run_at(4 * n, rep, src)
    lo = run_at(n, rep, src)
    eff = (hi["throughput_docs_per_sec"] / lo["throughput_docs_per_sec"]) / 4
    summary = {
        "job": "dp_curate_corpus",
        "docs": hi["docs"],
        f"local[{n}]": lo,
        f"local[{4 * n}]": hi,
        "scaling_efficiency": round(eff, 3),
    }
    md = [
        "",
        f"## Datapipe scaling — curate chain, pinned {n} -> {4 * n} cores",
        "",
        f"Same taskset-pinned method as the flagship headline, applied to",
        f"`dp_curate_corpus` over {hi['docs']:,} documents (driver sf0.1",
        f"documents table replicated x{rep} with offset ids):",
        "",
        "| cores | median sec | docs/sec | text MB/s |",
        "|---|---|---|---|",
        f"| {n} | {lo['sec_median']} | {lo['throughput_docs_per_sec']} | {lo['text_mb_per_sec']} |",
        f"| {4 * n} | {hi['sec_median']} | {hi['throughput_docs_per_sec']} | {hi['text_mb_per_sec']} |",
        "",
        f"**{n} -> {4 * n} scaling efficiency: {round(eff, 3)}** (all runs: "
        f"{n}c {lo['sec_all']}, {4 * n}c {hi['sec_all']}).",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(md))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
