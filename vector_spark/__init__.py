"""vector_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch rebuild of the capabilities of the Vector observability
pipeline (reference: makarchuk/vector) as an idiomatic Spark DataFrame
DAG: sources -> transforms (remap/filter/route/sample/dedupe/reduce/
aggregate/throttle/...) -> sinks, applied to tables of multi-turn
conversation/agent transcripts
(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp).

Architecture notes:
- Every operator is a declarative DataFrame transformation so Catalyst
  performs predicate pushdown / column pruning / join selection.
- Python UDFs are never row-at-a-time; the only non-JVM path is
  Arrow-vectorized pandas UDFs (grok parsing), per the design goal.
- Multi-output components (route ports, remap's dropped port) return
  dicts of DataFrames; the shared parent is cached once for single-pass
  fan-out (Vector's Fanout, lib/vector-core/src/fanout.rs).
"""

__version__ = "0.1.0"
