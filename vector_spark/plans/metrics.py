"""Per-stage pipeline metrics — the component_sent_events_total
analogue (lib/vector-common/src/internal_event/events_sent.rs:13-15).

Spark design: `df.observe(Observation, ...)` attaches metric
aggregates to a plan node with ZERO extra actions or scans — metrics
materialize as a side effect of whatever action runs the frame. A
StageMetrics registry collects them after the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


class StageMetrics:
    """Attach row-count (and optional custom) observations per stage;
    read them back after an action has run."""

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def observe(self, df: DataFrame, stage: str, **extra) -> DataFrame:
        """extra: name -> aggregate Column (e.g. errors=F.sum(...))."""
        obs = Observation(stage)
        self._obs[stage] = obs
        aggs = [F.count(F.lit(1)).alias("rows")]
        aggs.extend(c.alias(n) for n, c in extra.items())
        return df.observe(obs, *aggs)

    def collect(self) -> dict[str, dict]:
        out = {}
        for stage, obs in self._obs.items():
            try:
                out[stage] = dict(obs.get)
            except Exception:
                out[stage] = {}  # no action has touched this stage
        return out
