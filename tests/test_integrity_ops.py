"""Value tests for the round-6 integrity/eval/graph operators:
fk_audit, seasonal_naive_eval, kcore_peel."""
import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.forecast import seasonal_naive_eval
from feathr_spark.operators.graph import kcore_peel
from feathr_spark.operators.quality import fk_audit


def test_fk_audit_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)],
        "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = fk_audit(child, "fk", parent, "pk", "c->p").collect()[0]
    assert r["edge"] == "c->p"
    assert r["n_child_rows"] == 7
    assert r["n_null_keys"] == 1
    assert r["n_orphan_rows"] == 3          # the three fk=9 rows
    assert r["n_orphan_keys"] == 1
    assert r["n_parent_keys"] == 3
    assert r["n_referenced_keys"] == 2      # 1 and 2 (3 unreferenced)
    assert abs(r["referenced_frac"] - 2 / 3) < 1e-4
    assert abs(r["orphan_row_frac"] - 3 / 7) < 1e-4


def test_fk_audit_clean_edge(spark):
    child = spark.createDataFrame([(1,), (2,), (2,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    r = fk_audit(child, "fk", parent, "pk").collect()[0]
    assert r["n_orphan_rows"] == 0 and r["n_null_keys"] == 0
    assert r["referenced_frac"] == 1.0 and r["orphan_row_frac"] == 0.0


def test_seasonal_naive_eval_hand_computed(spark):
    # 14 daily buckets, perfectly periodic train, off-by-one holdout
    # season=2, holdout=4: predictions exist from bucket 3 on
    rows = []
    vals = [10.0, 20.0] * 5 + [11.0, 21.0, 12.0, 22.0]  # last 4 = test
    base = 86400
    for i, v in enumerate(vals):
        rows.append((f"2024-01-{i + 1:02d} 00:00:00", v))
    df = spark.createDataFrame(rows, "ts string, v double")
    r = seasonal_naive_eval(df, "ts", "v", bucket_s=base, season=2,
                            holdout=4).collect()[0]
    # train rows with pred: buckets 3..10 -> 8; errors all 0
    assert r["n_train"] == 8 and r["n_test"] == 4
    # test preds: 10,20,11,21 vs actual 11,21,12,22 -> |err|=1 each
    assert abs(r["mae"] - 1.0) < 1e-9
    # train scale = 0 -> mase NULL (guarded, not infinity)
    assert r["mase"] is None
    # smape = mean(2*1/(a+p)) over the 4 test rows
    exp = (2 / 21 + 2 / 41 + 2 / 23 + 2 / 43) / 4
    assert abs(r["smape"] - exp) < 1e-6


def test_kcore_clique_survives_tail_peeled(spark):
    # K5 clique (degree 4 each) + a pendant chain hanging off node 0
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges += [(0, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame([(str(a), str(b)) for a, b in edges],
                               "src string, dst string")
    out = {r["id"]: r["degree"] for r in
           kcore_peel(df, k=3, rounds=3).collect()}
    # chain peels away in <=3 rounds; the clique is a 4-core
    assert set(out) == {"0", "1", "2", "3", "4"}
    assert all(d == 4 for d in out.values())


def test_kcore_fixed_rounds_partial_peel(spark):
    # a long chain needs one round per pendant: rounds=1 only strips
    # the two endpoints (fixed-round semantics, documented)
    chain = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame([(str(a), str(b)) for a, b in chain],
                               "src string, dst string")
    out1 = {r["id"] for r in kcore_peel(df, k=2, rounds=1).collect()}
    assert out1 == {str(i) for i in range(1, 6)}
    out4 = kcore_peel(df, k=2, rounds=6).collect()
    assert out4 == []
