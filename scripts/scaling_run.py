"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; no real cluster in this
sandbox, so per driver instruction the same job runs at local[N] and
local[4N] on identical input).

Each parallelism level runs in its own subprocess (one JVM per cores
setting). Writes BENCH.md and prints the summary JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, json
sys.path.insert(0, {repo!r})
from bench import run_bench
print("RESULT::" + json.dumps(run_bench({sf_dir!r}, {cores})))
"""


def run_at(cores: int, sf_dir: str) -> dict:
    code = RUNNER.format(repo=REPO, sf_dir=sf_dir, cores=cores)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=1200
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"bench at {cores} cores failed:\n{out.stderr[-3000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "8"))
    lo = run_at(n, sf_dir)
    hi = run_at(4 * n, sf_dir)
    t_lo = lo["throughput_turns_per_sec"]
    t_hi = hi["throughput_turns_per_sec"]
    eff = (t_hi / t_lo) / 4
    summary = {
        "sf_dir": sf_dir,
        "N_cores": n,
        "4N_cores": 4 * n,
        "throughput_N": t_lo,
        "throughput_4N": t_hi,
        "scaling_efficiency": round(eff, 3),
        "pipeline_sec_N": lo["value"],
        "pipeline_sec_4N": hi["value"],
        "turns": lo["turns"],
    }
    print(json.dumps(summary))

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

North rule: throughput scaling efficiency >= 0.8 between cluster
sizes N and 4N executors. No real cluster exists in this sandbox, so
(per driver instruction) the identical end-to-end
parse->enrich->route->aggregate job ran on the identical deterministic
input at two local parallelism levels, one JVM each
(`spark.sql.shuffle.partitions` scaled with cores).

| | local[{n}] | local[{4 * n}] |
|---|---|---|
| pipeline e2e (median of 3, warm) | {lo["value"]} s | {hi["value"]} s |
| throughput | {t_lo:,.0f} turns/s | {t_hi:,.0f} turns/s |

- input: {lo["turns"]:,} turns ({sf_dir}), deterministic transcripts
- **scaling efficiency** = ({t_hi:,.0f} / {t_lo:,.0f}) / 4 = **{eff:.3f}**
- per-stage rows (from observe() metrics, 4N run):
  `{json.dumps(hi.get("stage_metrics", {}))}`
- sink counts identical at both levels:
  N={json.dumps(lo["sink_counts"])}
  4N={json.dumps(hi["sink_counts"])}

Secondary query timings (s) at 4N: {json.dumps(hi["queries"])}

Raw bench lines:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
