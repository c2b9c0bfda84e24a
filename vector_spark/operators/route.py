"""route — non-exclusive condition fan-out with an _unmatched port.

Parity: src/transforms/route.rs:32-51 — each event is checked against
EVERY named condition; a COPY goes to every matching route; events
matching none go to the reserved `_unmatched` port (route.rs:14).
Route names `_unmatched`/`_default` are reserved (route.rs:64-66).

Spark design (single-pass fan-out): Catalyst cannot emit multiple
outputs from one operator, so the idiom is: evaluate all route
predicates ONCE as boolean columns on the parent, persist the parent,
then each port is a cheap filter on its boolean. This reads the
(expensively parsed/enriched) input once — the analogue of Vector's
Fanout over one upstream buffer (lib/vector-core/src/fanout.rs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNMATCHED = "_unmatched"
_RESERVED = {UNMATCHED, "_default"}


def route(
    df: DataFrame,
    conditions: dict[str, Column],
    cache: bool = True,
) -> dict[str, DataFrame]:
    """Returns {route_name: DataFrame, ..., '_unmatched': DataFrame}.

    Laws (asserted by the test suite, mirroring
    tests/behavior/transforms/route.toml):
      - every input row appears in >=1 output (routes U _unmatched)
      - _unmatched is disjoint from every route
      - a row appears in EVERY route whose condition it satisfies
    """
    bad = _RESERVED.intersection(conditions)
    if bad:
        raise ValueError(f"reserved route name(s): {sorted(bad)}")
    input_cols = df.columns
    flag_cols = {f"__route_{name}": F.coalesce(c, F.lit(False)) for name, c in conditions.items()}
    flagged = df.withColumns(flag_cols)
    if cache:
        flagged = flagged.persist()
    out: dict[str, DataFrame] = {}
    for name in conditions:
        out[name] = flagged.filter(F.col(f"__route_{name}")).select(*input_cols)
    none_match = ~F.greatest(*[F.col(f) for f in flag_cols]) if len(flag_cols) > 1 else ~F.col(
        next(iter(flag_cols))
    )
    out[UNMATCHED] = flagged.filter(none_match).select(*input_cols)
    return out
