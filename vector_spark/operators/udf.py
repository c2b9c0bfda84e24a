"""The arbitrary-code escape hatch (SURVEY.md §2.1 `lua`).

Vector's lua transform gives users full per-event programmability
with state (src/transforms/lua/). The Spark analogue keeps the
escape hatch but batch-shaped: `map_batches` runs an arbitrary
pandas-DataFrame -> pandas-DataFrame function per Arrow batch
(mapInPandas — vectorized transfer, no per-row Python), and
`map_groups` runs per-key stateful logic (applyInPandas), the
batch rendering of a stateful lua transform.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def map_batches(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Arbitrary per-batch transform; fn may filter, expand (1->N
    rows), or reshape — the remap/lua superpowers, Arrow-batched."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(runner, schema)


def map_groups(
    df: DataFrame,
    group_by: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Per-group stateful transform: fn sees the FULL group as one
    pandas frame (ordered however it sorts it) — the batch analogue of
    a keyed, stateful lua/VRL program."""
    return df.groupBy(*group_by).applyInPandas(lambda pdf: fn(pdf), schema)
