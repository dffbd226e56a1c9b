"""Feathr SQL extension functions.

The reference's expression DSL *is* Spark SQL (SURVEY §2.2), plus a few
Feathr-specific helpers like ``cast_float`` seen in its tests
(/root/reference/feathr-rs/src/client.rs:360,383-388). We register those as
tiny SQL shims so expression strings from reference configs run verbatim.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# name -> 1-arg SQL template
_SHIMS = {
    "cast_float": "CAST(({0}) AS FLOAT)",
    "cast_double": "CAST(({0}) AS DOUBLE)",
    "cast_int": "CAST(({0}) AS INT)",
    "cast_long": "CAST(({0}) AS BIGINT)",
    "cast_string": "CAST(({0}) AS STRING)",
    "cast_boolean": "CAST(({0}) AS BOOLEAN)",
}

_registered_sessions: set = set()


def register_feathr_functions(spark: SparkSession) -> None:
    """Best-effort: register the shims as SQL UDFs (Spark ≥3.5 DDL) so
    ad-hoc ``spark.sql`` queries can use them too. The engine itself never
    relies on this — planner-built expressions go through
    :func:`rewrite_feathr_expr`, which inlines plain CAST expressions that
    Catalyst folds (no UDF call overhead)."""
    key = id(spark)
    if key in _registered_sessions:
        return
    for name, template in _SHIMS.items():
        body = template.format("CAST(x AS STRING)")
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(x STRING) RETURNS "
                f"{_ret_type(name)} RETURN {body}"
            )
        except Exception:
            break
    _registered_sessions.add(key)


def _ret_type(name: str) -> str:
    return {
        "cast_float": "FLOAT", "cast_double": "DOUBLE", "cast_int": "INT",
        "cast_long": "BIGINT", "cast_string": "STRING", "cast_boolean": "BOOLEAN",
    }[name]


def feathr_expr(expr: str):
    """Parse a Feathr expression string into a Spark Column (shims inlined)."""
    from pyspark.sql import functions as F
    return F.expr(rewrite_feathr_expr(expr))


def rewrite_feathr_expr(expr: str) -> str:
    """Fallback textual rewrite of Feathr helpers into ANSI casts.

    Used for oracle SQL generation and for engines where SQL UDF DDL is
    unavailable. Handles non-nested parenthesized calls.
    """
    out = expr
    for name, template in _SHIMS.items():
        pattern = re.compile(rf"\b{name}\s*\(([^()]*)\)")
        while True:
            new = pattern.sub(lambda m: template.format(m.group(1)), out)
            if new == out:
                break
            out = new
    return out
