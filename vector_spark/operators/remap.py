"""remap — the map/project/parse workhorse with an error channel.

Capability parity with Vector's remap transform
(src/transforms/remap.rs:46-131 config; :426-482 dropped-port
semantics): apply a set of column expressions per event; rows whose
parse/transform fails are either dropped, kept, or rerouted — the
ORIGINAL event, annotated — to a `dropped` output.

Spark design: the "program" is a dict of Column expressions (compiled
once on the driver, executed by Tungsten — the analogue of compiling
a VRL program per config, src/transforms/remap.rs:159-190). The error
condition is itself a Column; the split into (ok, dropped) is two
filters over one cached parent, mirroring remap's two output ports.

Dropped-row annotation mirrors remap.rs:426-441:
  struct(reason, message, component_id, component_type, component_kind)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dropped_annotation(
    component_id: str, message: Column, reason: str = "error"
) -> Column:
    # remap.rs:426-441: reason is "abort" for VRL aborts, "error" else
    return F.struct(
        F.lit(reason).alias("reason"),
        message.alias("message"),
        F.lit(component_id).alias("component_id"),
        F.lit("remap").alias("component_type"),
        F.lit("transform").alias("component_kind"),
    ).alias("metadata_dropped")


@dataclass
class Remap:
    """exprs: output column -> Column expression (applied with
    withColumns, i.e. one projection).
    error_when: rows matching this are routed to the dropped port
    (evaluated BEFORE applying exprs would matter — we evaluate on the
    projected frame so parse-null checks work, but the dropped port
    carries the ORIGINAL input columns, per reference semantics).
    drop_on_error=False keeps failed rows in the ok output (Vector's
    drop_on_error=false)."""

    exprs: dict[str, Column]
    error_when: Column | None = None
    error_message: Column | None = None
    drop_on_error: bool = True
    reroute_dropped: bool = True
    component_id: str = "remap"
    _input_cols: list[str] = field(default_factory=list)

    def apply(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        input_cols = df.columns
        projected = df.withColumns(self.exprs)
        if self.error_when is None:
            return projected, projected.limit(0).select(
                *input_cols, _dropped_annotation(self.component_id, F.lit(None).cast("string"))
            )
        err = self.error_when
        if not self.drop_on_error:
            ok = projected
        else:
            ok = projected.filter(~F.coalesce(err, F.lit(False)))
        msg = self.error_message if self.error_message is not None else F.lit("remap error")
        dropped = (
            projected.filter(F.coalesce(err, F.lit(False)))
            # dropped port carries the original event + annotation
            .select(*input_cols, _dropped_annotation(self.component_id, msg))
        )
        if not self.reroute_dropped:
            dropped = dropped.limit(0)
        return ok, dropped


def remap_source(
    df: DataFrame,
    source: str,
    drop_on_abort: bool = True,
    reroute_dropped: bool = True,
    component_id: str = "remap",
    json_schemas: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """remap configured with VRL *source* (remap.rs `source` option):
    the program compiles once against df.schema to native Columns
    (functions/vrl_codegen.py), aborted events land on the dropped
    port with the same annotation struct as the expression form.

    Returns (ok_df, dropped_df). With drop_on_abort=False the aborted
    rows stay on the main output unmodified-from-abort-point, matching
    remap.rs drop_on_abort=false.
    """
    from vector_spark.functions.vrl_codegen import compile_vrl

    compiled = compile_vrl(source, df.schema, json_schemas=json_schemas)
    out = compiled.apply(df, drop_aborted=False)
    if "_aborted" not in out.columns:
        # program has no abort path: dropped port is statically empty
        return out, out.limit(0).withColumn(
            "metadata_dropped",
            _dropped_annotation(component_id, F.lit("aborted"), "abort"),
        )
    if not drop_on_abort:
        return out.drop("_aborted"), out.limit(0).drop("_aborted").withColumn(
            "metadata_dropped",
            _dropped_annotation(component_id, F.lit("aborted"), "abort"),
        )
    ok = out.filter(~F.col("_aborted")).drop("_aborted")
    dropped = out.filter(F.col("_aborted")).drop("_aborted")
    if reroute_dropped:
        dropped = dropped.withColumn(
            "metadata_dropped",
            _dropped_annotation(component_id, F.lit("aborted"), "abort"),
        )
    return ok, dropped


def remap(
    df: DataFrame,
    exprs: dict[str, Column],
    error_when: Column | None = None,
    error_message: Column | None = None,
    drop_on_error: bool = True,
    reroute_dropped: bool = True,
    component_id: str = "remap",
) -> tuple[DataFrame, DataFrame]:
    """Functional wrapper: returns (ok_df, dropped_df)."""
    return Remap(
        exprs,
        error_when,
        error_message,
        drop_on_error,
        reroute_dropped,
        component_id,
    ).apply(df)
