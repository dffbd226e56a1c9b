"""Property-based checks for the round-9 operator batches: every
statistic here is pinned to a pure-Python reference (or an algebraic
invariant) over randomized inputs, not just the worked examples."""
import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feathr_spark.operators.classify import naive_bayes_classify
from feathr_spark.operators.layout import compaction_plan
from feathr_spark.operators.sampling import forward_label
from feathr_spark.operators.search import (rank_overlap_rbo,
                                           retrieval_metrics)
from feathr_spark.operators.text import lexical_richness

SETTINGS = dict(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


# --------------------------------------------------- retrieval metrics

runs = st.lists(st.booleans(), min_size=1, max_size=10)


@settings(**SETTINGS)
@given(rels=runs, n_extra_rel=st.integers(0, 5))
def test_retrieval_metrics_match_python_reference(spark, rels, n_extra_rel):
    k = len(rels)
    n_rel = sum(rels) + n_extra_rel
    hits = spark.createDataFrame(
        [(1, r + 1, bool(v)) for r, v in enumerate(rels)],
        "query_id bigint, rank bigint, is_rel boolean")
    totals = spark.createDataFrame([(1, n_rel)],
                                   "query_id bigint, n_rel bigint")
    out = retrieval_metrics(hits, totals, k=k).collect()[0]
    # pure-Python reference
    first = next((i + 1 for i, v in enumerate(rels) if v), None)
    rr = 1.0 / first if first else 0.0
    hits_rel = sum(rels)
    cum = 0
    ap_num = 0.0
    for i, v in enumerate(rels, 1):
        cum += v
        if v:
            ap_num += cum / i
    ap = ap_num / min(n_rel, k) if min(n_rel, k) > 0 else 0.0
    assert out["rr"] == pytest.approx(rr, abs=1e-4)
    assert out["p_at_k"] == pytest.approx(hits_rel / k, abs=1e-4)
    assert out["ap_at_k"] == pytest.approx(ap, abs=1e-4)
    if n_rel > 0:
        assert out["recall_at_k"] == pytest.approx(hits_rel / n_rel,
                                                   abs=1e-4)


# ------------------------------------------------------------------ RBO

perms = st.permutations(list(range(1, 9)))


@settings(**SETTINGS)
@given(la=perms, lb=perms, k=st.sampled_from([3, 5]))
def test_rbo_matches_textbook_on_random_permutations(spark, la, lb, k):
    p = 0.9
    a = spark.createDataFrame(
        [(1, item, r + 1) for r, item in enumerate(la)],
        "query_id bigint, neighbor_id bigint, rank bigint")
    b = spark.createDataFrame(
        [(1, item, r + 1) for r, item in enumerate(lb)],
        "query_id bigint, neighbor_id bigint, rank bigint")
    out = rank_overlap_rbo(a, b, k=k, p=p).collect()[0]
    want = (1 - p) * sum(
        p ** (d - 1) * len(set(la[:d]) & set(lb[:d])) / d
        for d in range(1, k + 1))
    assert out["rbo"] == pytest.approx(want, abs=1e-4)
    # symmetry
    rev = rank_overlap_rbo(b, a, k=k, p=p).collect()[0]
    assert rev["rbo"] == out["rbo"]


# ------------------------------------------------------ compaction plan

sizes_strategy = st.lists(st.integers(1, 900), min_size=1, max_size=40)


@settings(**SETTINGS)
@given(sizes=sizes_strategy, target=st.sampled_from([100, 500, 1500]))
def test_compaction_plan_is_exact_partition(spark, sizes, target):
    df = spark.createDataFrame(list(enumerate(sizes)),
                               "fid bigint, sz bigint")
    rows = sorted(compaction_plan(df, "sz", "fid",
                                  target_bytes=target).collect(),
                  key=lambda r: r["bin_id"])
    # partition: totals preserved; ids strictly increasing from 0
    # (NOT dense — an over-target item spans several bin widths and
    # skips the ids under it)
    assert sum(r["bin_bytes"] for r in rows) == sum(sizes)
    assert sum(r["n_items"] for r in rows) == len(sizes)
    ids = [r["bin_id"] for r in rows]
    assert ids[0] == 0 and ids == sorted(set(ids))
    # every non-final bin within one (max) item of the target
    mx = max(sizes)
    for r in rows[:-1]:
        assert target - mx <= r["bin_bytes"] <= target + mx


# -------------------------------------------------------- forward label

events_strategy = st.lists(
    st.tuples(st.integers(0, 3),            # user
              st.integers(0, 10_000)),      # ts seconds offset
    min_size=2, max_size=30)


@settings(**SETTINGS)
@given(evs=events_strategy, horizon=st.sampled_from([60, 600, 3600]))
def test_forward_label_matches_python_reference(spark, evs, horizon):
    import datetime
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, u, base + datetime.timedelta(seconds=s))
            for i, (u, s) in enumerate(evs)]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, "
                                     "ts timestamp")
    out = {r["event_id"]: r for r in
           forward_label(df, ["user_id"], "ts",
                         horizon_s=horizon).collect()}
    wm = max(s for _, s in evs)
    by_user = {}
    for i, (u, s) in enumerate(evs):
        by_user.setdefault(u, []).append((s, i))
    for u, lst in by_user.items():
        lst.sort()
        for j, (s, i) in enumerate(lst):
            nxt = lst[j + 1][0] if j + 1 < len(lst) else None
            observable = s + horizon <= wm
            if nxt is not None and nxt - s <= horizon:
                want = True
            elif observable:
                want = False
            else:
                want = None
            got = out[i]
            assert got["observable"] == observable
            assert got["label"] == want, (u, s, nxt, horizon)


# --------------------------------------------------------- Naive Bayes

corpus_strategy = st.lists(
    st.tuples(st.sampled_from(["x", "y"]),
              st.lists(st.sampled_from("abcdef"), min_size=1,
                       max_size=6)),
    min_size=2, max_size=10).filter(
        lambda rows: len({lbl for lbl, _ in rows}) == 2)


@settings(**SETTINGS)
@given(rows=corpus_strategy)
def test_naive_bayes_scores_match_python_reference(spark, rows):
    data = [(i, " ".join(toks), lbl) for i, (lbl, toks) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id bigint, text string, "
                                     "lang string")
    out = {r["doc_id"]: r for r in naive_bayes_classify(df).collect()}
    # reference model
    docs = [(lbl, toks) for lbl, toks in rows]
    vocab = {t for _, toks in docs for t in toks}
    n_docs = len(docs)
    by_c = {}
    for lbl, toks in docs:
        by_c.setdefault(lbl, []).append(toks)
    for i, (lbl, toks) in enumerate(docs):
        scores = {}
        for c in sorted(by_c):
            cnt = Counter(t for ts in by_c[c] for t in ts)
            t_c = sum(cnt.values())
            s = math.log(len(by_c[c]) / n_docs)
            for t in toks:
                s += math.log((cnt.get(t, 0) + 1) / (t_c + len(vocab)))
            scores[c] = s
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        best, best_s = ordered[0]
        margin = best_s - ordered[1][1] if len(ordered) > 1 else 1.0
        # the operator argmaxes per-term-quantized integer sums; the
        # float reference can disagree only inside the quantization
        # band (~n_tok microns) — assert pred only outside it
        if abs(margin) > 1e-3:
            assert out[i]["pred"] == best
            assert out[i]["nb_score"] == pytest.approx(best_s, abs=2e-4)


# --------------------------------------------------- lexical richness

texts_strategy = st.lists(st.sampled_from("aabbbc d e"), min_size=1,
                          max_size=40)


@settings(**SETTINGS)
@given(chars=texts_strategy)
def test_lexical_richness_matches_counter(spark, chars):
    text = "".join(chars)
    toks = " ".join(text.split()).lower().split(" ") if text.strip() \
        else [""]
    df = spark.createDataFrame([("g", text)], "source string, text string")
    r = lexical_richness(df).collect()[0]
    cnt = Counter(toks)
    n, v = sum(cnt.values()), len(cnt)
    assert r["n_tokens"] == n and r["n_types"] == v
    assert r["n_hapax"] == sum(1 for c in cnt.values() if c == 1)
    assert r["yule_k"] == pytest.approx(
        1e4 * (sum(c * c for c in cnt.values()) - n) / (n * n), abs=1e-3)
