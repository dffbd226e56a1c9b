"""Physical-plan quality guards over the whole driver-query surface.

Correctness tests prove the small-SF answer; these prove the *plan shape*
that has to survive a 1000-executor / 100 TB run: no unbounded cartesian
products, Python kept out of the hot path, whole-stage codegen present.
Plans are inspected without executing (explain only), so checking all
queries at sf0.001 is cheap.
"""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# Queries whose plan legitimately contains a broadcast nested-loop join:
# one side is a small, explicitly-broadcast frame (ANN query set, LSH
# plane table), so the "cross" join is a per-partition loop over a tiny
# local array — the scale-safe formulation of brute-force scoring.
BROADCAST_LOOP_OK = {
    "ann_topk",          # corpus × broadcast(query set)
    "ann_lsh_topk",      # bucket-joined, query side broadcast
    "ann_ivf_topk",      # probed inverted lists × broadcast(queries)
    "ann_lsh_recall",    # embeds ann_topk's exact scoring + 1-row×1-row crossJoin
    "ann_ivf_recall",    # same
}


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entry_mod.queries().items():
        out[name] = (_physical_plan(fn(spark, SF)))
    return out


def test_no_unbounded_cartesian_product(plans):
    """CartesianProduct = a non-broadcast cross join: partitions^2 tasks at
    cluster scale. No query may plan one, ever — the allowlisted ANN
    queries must come out as *Broadcast*NestedLoopJoin (tiny side shipped
    to every executor), not a full shuffle-side cartesian."""
    offenders = {n: p for n, p in plans.items() if "CartesianProduct" in p}
    assert not offenders, f"cartesian product in: {sorted(offenders)}"


def test_nested_loop_only_with_broadcast_and_allowlisted(plans):
    offenders = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BROADCAST_LOOP_OK
    ]
    assert not offenders, f"unexpected nested-loop join in: {offenders}"


def test_no_python_row_udfs_in_plans(plans):
    """BatchEvalPython = row-at-a-time Python UDF (the 10-100x slow path).
    Everything except the multimodal decode stub (inherently Python,
    Arrow-batched via mapInPandas -> ArrowEvalPython/MapInPandas) must
    stay JVM-side."""
    offenders = [
        n for n, p in plans.items()
        if "BatchEvalPython" in p and n != "udf_passthrough"
    ]
    assert not offenders, f"row-wise Python UDF in: {offenders}"


def test_whole_stage_codegen_present(spark, plans):
    """Codegen'd operators print with a "*(stage)" prefix. AQE plans only
    reveal their final (codegen-assigned) form after execution, so run a
    representative subset through the noop sink and check the final plan;
    non-AQE plans (no exchange, e.g. passthrough) are checked unexecuted."""
    assert "*(" in plans["passthrough_exprs"]
    for name in ["keyed_join", "window_agg_basic", "minhash_pairs"]:
        df = entry_mod.queries()[name](spark, SF)
        df.collect()  # finalizes this DataFrame's own AQE plan
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, name
        assert "*(" in final, f"no codegen span in final plan of {name}"


def test_keyed_join_broadcasts_small_dimension(plans):
    assert "BroadcastHashJoin" in plans["keyed_join"]


def _unpartitioned_windows(plan: str):
    """Window lines with no partition spec. Spark prints
    ``Window [funcs], [partitionCols], [orderCols]`` — three top-level
    bracket groups — when partitioned, and only two when not."""
    out = []
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*(0123456789)")
        if not stripped.startswith("Window ["):
            continue
        depth, groups = 0, 0
        for ch in stripped:
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups < 3:
            out.append(stripped[:120])
    return out


def test_no_unbounded_global_window_sort(plans):
    """An unpartitioned Window.orderBy moves ALL rows to one task — the
    single-partition sort anti-pattern (caught in round 2's top_ngrams).
    Any unpartitioned window must sit above a TakeOrderedAndProject (its
    input is then bounded to the global top-k, not the full table)."""
    offenders = {}
    for name, plan in plans.items():
        bad = _unpartitioned_windows(plan)
        if bad and "TakeOrderedAndProject" not in plan:
            offenders[name] = bad
    assert not offenders, f"unbounded global window sort in: {offenders}"
