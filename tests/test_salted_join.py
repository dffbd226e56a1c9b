"""salted_join: the manual skew-defeating equi-join. The contract under
test is result-identity with the plain join — salting must be invisible
outside the operator."""

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators._join import salted_join


def _skewed(spark):
    # 90% of fact rows share one hot key
    rows = [(1 if i % 10 else i, f"v{i}") for i in range(500)]
    fact = spark.createDataFrame(rows, "k bigint, payload string")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(60)], "k bigint, attr string")
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = sorted(map(tuple, fact.join(dim, "k").collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, ["k"], salt=8)
                        .select("k", "payload", "attr").collect()))
    assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    fact, dim = _skewed(spark)
    fact = fact.union(spark.createDataFrame([(999, "orphan")],
                                            "k bigint, payload string"))
    plain = sorted(map(tuple, fact.join(dim, "k", "left").collect()))
    salted = sorted(map(tuple,
                        salted_join(fact, dim, ["k"], salt=4, how="left")
                        .select("k", "payload", "attr").collect()))
    assert salted == plain
    assert any(r[1] == "orphan" and r[2] is None for r in salted)


def test_salted_join_null_keys_match_null_safely(spark):
    fact = spark.createDataFrame([(None, "a"), (1, "b")],
                                 "k bigint, payload string")
    dim = spark.createDataFrame([(None, "nulldim"), (1, "one")],
                                "k bigint, attr string")
    out = sorted(map(tuple, salted_join(fact, dim, ["k"], salt=3)
                     .select("payload", "attr").collect()))
    assert out == [("a", "nulldim"), ("b", "one")]


def test_salted_join_spreads_hot_key_across_salts(spark):
    # the routing property itself: a hot key's rows land on >1 salt
    fact, _ = _skewed(spark)
    lsalt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8))
    n_salts = (fact.where(F.col("k") == 1).withColumn("s", lsalt)
               .select("s").distinct().count())
    assert n_salts > 1


def test_salted_join_salt_one_degenerates_to_plain(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, "k").count()
    assert salted_join(fact, dim, ["k"], salt=1).count() == plain


def test_salted_join_rejects_bad_args(spark):
    fact, dim = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, [], salt=8)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], salt=0)


def test_salted_join_rejects_right_and_full_outer(spark):
    # ADVICE r9: unmatched right rows would be replicated salt-x (one
    # per exploded replica) under right/full outer — refuse them
    fact, dim = _skewed(spark)
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(fact, dim, ["k"], salt=4, how=how)


def test_salted_join_semi_anti_match_plain(spark):
    fact, dim = _skewed(spark)
    for how in ("left_semi", "left_anti"):
        plain = sorted(r["k"] for r in
                       fact.join(dim, "k", how).collect())
        salted = sorted(r["k"] for r in
                        salted_join(fact, dim, ["k"], salt=4,
                                    how=how).collect())
        assert salted == plain
