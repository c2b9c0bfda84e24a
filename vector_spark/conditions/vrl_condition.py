"""VRL boolean-expression conditions (src/conditions/vrl.rs).

The reference's third condition type: a route/filter predicate written
as a VRL *boolean expression* (`.level == "error" && exists(.tool)`),
compiled with the stdlib available and the event set READ-ONLY
(conditions/vrl.rs `config.set_read_only()` — a condition that mutates
the event is a compile error). At run time, a VRL runtime error or a
non-boolean result makes the condition FALSE (the reference emits
VrlConditionExecutionError and returns false rather than failing the
pipeline).

Spark mapping: the program compiles through the same VRL source
compiler as remap (functions/vrl_lang + vrl_codegen) into one JVM
boolean Column — the predicate runs inside whole-stage codegen and is
eligible for parquet predicate pushdown like any native filter.
Read-only-ness is enforced post-compile by rejecting programs whose
environment delta shows an event/metadata write, delete, or abort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.functions.vrl_codegen import (
    VrlCompileError,
    _resolve,
    compile_vrl,
)


def vrl_cond(source: str, df: DataFrame | None = None) -> Column:
    """Compile a VRL boolean expression into a filter Column.

    `df` supplies the schema the program compiles against (paths
    absent from it read as null, VRL's missing-path semantics); it is
    required because a schema-less compile would silently resolve
    every event path to null and the condition to constant-false.
    """
    if df is None:
        raise VrlCompileError(
            "vrl_cond needs the input DataFrame for schema resolution"
        )
    comp = compile_vrl(source, df.schema)
    env = comp.env
    wrote = (
        bool(env.fields)
        or bool(env.dropped)
        or bool(env.cond_dropped)
        or bool(env.meta)
        or env.abort is not None
    )
    if wrote:
        raise VrlCompileError(
            "VRL condition must be read-only: the program writes or "
            "deletes event/metadata state (conditions/vrl.rs "
            "set_read_only)"
        )
    res = comp.result
    vt = res.vtype
    if vt is not None and not isinstance(vt, (T.BooleanType, T.NullType)):
        if isinstance(vt, T.StringType):
            # dynamic/stringly results (parse_json proxies resolve as
            # strings) are judged at runtime like the reference's
            # resolved-value check
            return F.coalesce(_resolve(res).try_cast("boolean"), F.lit(False))
        # statically non-boolean: every row errors -> false
        return F.lit(False)
    return F.coalesce(_resolve(res).try_cast("boolean"), F.lit(False))
