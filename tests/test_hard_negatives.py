"""Hard-negative mining semantics: same-label and explicit-positive
exclusion, the semi-hard score band, self-exclusion, rank determinism.
"""

import pytest

from feathr_spark.operators.similarity import cosine_topk, hard_negatives


def _emb(spark):
    # 2-D embeddings on the unit circle: cosine(a, b) is the angle gap,
    # so every score is hand-derivable
    import math
    rows = []
    #        id  angle_deg  label
    for vid, deg, lab in [(0, 0, 0), (1, 10, 0), (2, 20, 1),
                          (3, 45, 1), (4, 90, 2), (5, 180, None)]:
        r = math.radians(deg)
        rows.append((vid, [math.cos(r), math.sin(r)], lab))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")


def test_label_and_self_exclusion(spark):
    df = _emb(spark)
    q = df.where("vec_id = 0")
    out = hard_negatives(df, q, k=5, label_col="label").collect()
    ids = [r["neighbor_id"] for r in out]
    # 0 (self) and 1 (same label) excluded; NULL-label 5 kept
    assert 0 not in ids and 1 not in ids
    assert set(ids) == {2, 3, 4, 5}
    # hardest negative first: closest angle among allowed = id 2 (20°)
    assert ids[0] == 2


def test_null_label_query_excludes_nothing_by_label(spark):
    df = _emb(spark)
    q = df.where("vec_id = 5")   # NULL label
    ids = {r["neighbor_id"]
           for r in hard_negatives(df, q, k=5, label_col="label")
           .collect()}
    assert ids == {0, 1, 2, 3, 4}


def test_explicit_positives_anti_join(spark):
    df = _emb(spark)
    q = df.where("vec_id = 0")
    pos = spark.createDataFrame([(0, 2), (0, 3)],
                                "query_id bigint, neighbor_id bigint")
    ids = {r["neighbor_id"]
           for r in hard_negatives(df, q, k=5, label_col="label",
                                   positives=pos).collect()}
    assert ids == {4, 5}


def test_semi_hard_band_inclusive_low_exclusive_high(spark):
    import math
    df = _emb(spark)
    q = df.where("vec_id = 0")
    # scores vs id0: id1 cos10°≈.9848, id2 cos20°≈.9397, id3 ≈.7071,
    # id4 0.0, id5 -1.0 (4-dp rounded)
    out = hard_negatives(df, q, k=5, min_score=0.7071,
                         max_score=0.9848).collect()
    ids = [r["neighbor_id"] for r in out]
    assert ids == [2, 3]   # .9848 excluded (exclusive high), .7071 kept
    scores = {r["neighbor_id"]: r["score"] for r in out}
    assert scores[3] == pytest.approx(round(math.cos(math.radians(45)),
                                            4))


def test_no_exclusions_matches_cosine_topk(spark):
    df = _emb(spark)
    q = df.where("vec_id < 3")
    a = sorted(map(tuple, hard_negatives(df, q, k=3).collect()))
    b = sorted(map(tuple, cosine_topk(df, q, k=3).collect()))
    assert a == b
