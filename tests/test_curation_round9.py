"""Round-9 batch-3 operators: split-leakage audit, padded-batching
efficiency, BPE tokenizer induction (pair statistics + the iterative
merge loop vs a pure-Python reference)."""

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.bpe import (bpe_merges, bpe_pair_counts,
                                        word_frequencies)
from feathr_spark.operators.packing import (bucket_case_sql,
                                            length_buckets, padding_waste)
from feathr_spark.operators.quality import split_leakage


# ---------------------------------------------------------------- leakage

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, "
                                       "source string")


def test_split_leakage_counts_cross_split_exact_dups(spark):
    # Force the split assignment by choosing ids we can inspect: run the
    # operator, then recompute leakage with a hand-built pandas check.
    rows = [(i, f"unique text {i}", "s0") for i in range(40)]
    # 10 duplicated texts under fresh ids — some will straddle splits
    rows += [(100 + i, f"unique text {i}", "s0") for i in range(10)]
    df = _docs(spark, rows)
    out = split_leakage(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                        group_col="source").collect()

    # independent recomputation
    from feathr_spark.operators.sampling import hash_split
    d = (hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
         .select("doc_id", "split",
                 F.md5(F.lower(F.trim(F.regexp_replace(
                     "text", r"\s+", " ")))).alias("fp"))
         .collect())
    train_fps = {r["fp"] for r in d if r["split"] == "train"}
    expect = {}
    for r in d:
        if r["split"] == "train":
            continue
        n, leak = expect.get(r["split"], (0, 0))
        expect[r["split"]] = (n + 1, leak + (r["fp"] in train_fps))
    got = {r["split"]: (r["n_docs"], r["n_leaked"]) for r in out}
    assert got == {k: v for k, v in expect.items()}
    for r in out:
        assert r["leak_rate"] == pytest.approx(
            r["n_leaked"] / r["n_docs"], abs=1e-4)


def test_split_leakage_zero_when_no_dups(spark):
    df = _docs(spark, [(i, f"text {i}", "s") for i in range(50)])
    out = split_leakage(df, {"train": 0.5, "test": 0.5})
    assert all(r["n_leaked"] == 0 for r in out.collect())
    assert "train" not in {r["split"] for r in out.collect()}


# ---------------------------------------------------------------- padding

def test_length_buckets_ladder():
    assert length_buckets(16, 2048) == [16, 32, 64, 128, 256, 512,
                                        1024, 2048]
    assert length_buckets(16, 100) == [16, 32, 64, 100]
    with pytest.raises(ValueError):
        length_buckets(0, 16)


def test_bucket_case_sql_literal_ladder():
    sql = bucket_case_sql("n", [16, 32, 64])
    assert sql == ("CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 "
                   "ELSE 64 END")


def test_padding_waste_hand_computed(spark):
    # token counts: 3, 16, 17, 40 -> buckets 16, 16, 32, 64 (ladder
    # from 16); one 5000-token doc truncates to 2048
    def words(n):
        return " ".join(["w"] * n)
    # NB: empty text is ONE token under the repo-wide _norm_tokens
    # convention (split('', ' ') = ['']) on BOTH engines — doc 6 lands
    # in bucket 16 with 1 "token", it is not dropped.
    df = spark.createDataFrame(
        [(1, words(3)), (2, words(16)), (3, words(17)), (4, words(40)),
         (5, words(5000)), (6, "")],
        "doc_id bigint, text string")
    out = {r["bucket"]: r for r in
           padding_waste(df, min_bucket=16, max_len=2048).collect()}
    assert set(out) == {16, 32, 64, 2048}
    assert (out[16]["n_docs"], out[16]["real_tokens"],
            out[16]["padded_tokens"]) == (3, 20, 48)
    assert out[32]["real_tokens"] == 17
    assert out[64]["real_tokens"] == 40
    assert out[2048]["trunc_tokens"] == 5000 - 2048
    assert out[2048]["pad_ratio"] == 0.0
    assert out[16]["pad_ratio"] == pytest.approx(1 - 20 / 48, abs=1e-4)


# -------------------------------------------------------------------- bpe

def _bpe_reference(word_counts, n_merges):
    """Pure-Python BPE (Sennrich et al. 2016 pseudocode): weighted pair
    counts over the vocabulary, greedy left-to-right fuse, total
    tie-break (count desc, left asc, right asc)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), n = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_pair_counts_weighted_overlapping(spark):
    df = spark.createDataFrame(
        [(1, "aaa bb"), (2, "aaa"), (3, "ab")],
        "doc_id bigint, text string")
    out = {r["pair"]: r["n_pairs"]
           for r in bpe_pair_counts(df, k=10).collect()}
    # 'aaa' x2 occurrences -> 2 overlapping 'aa' each = 4; 'bb' -> 1
    assert out == {"aa": 4, "bb": 1, "ab": 1}


def test_bpe_pair_counts_topk_total_order(spark):
    df = spark.createDataFrame([(1, "xy xz")], "doc_id bigint, text string")
    rows = bpe_pair_counts(df, k=1).collect()
    # tie between 'xy' and 'xz' (1 each) -> pair ASC wins
    assert [(r["pair"], r["n_pairs"]) for r in rows] == [("xy", 1)]


def test_bpe_merges_matches_python_reference(spark):
    corpus = [(i, t) for i, t in enumerate(
        ["low lower lowest", "low low newer newest", "wider wide new",
         "lowlow wideness newness", "er er er est est"])]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    wc = {r["word"]: r["wn"]
          for r in word_frequencies(df).collect()}
    expect = _bpe_reference(wc, 6)
    got = bpe_merges(df, n_merges=6, checkpoint_every=3)
    assert got == expect


def test_bpe_merges_fuse_is_nonoverlapping_left_to_right(spark):
    # one word 'aaaa' x1: round 1 top pair (a,a,3) fuses to [aa, aa];
    # round 2 top pair (aa, aa, 1)
    df = spark.createDataFrame([(1, "aaaa")], "doc_id bigint, text string")
    got = bpe_merges(df, n_merges=2)
    assert got == [("a", "a", 3), ("aa", "aa", 1)]


# ---------------------------------------------------- token budget plan

def test_token_budget_plan_hand_computed(spark):
    from feathr_spark.operators.mixture import token_budget_plan
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "a"),
         (2, " ".join(["w"] * 100), "a"),
         (3, " ".join(["w"] * 50), "b"),
         (4, " ".join(["w"] * 10), "c")],   # not in weights -> 0
        "doc_id bigint, text string, source string")
    out = {r["source"]: r for r in
           token_budget_plan(df, {"a": 3.0, "b": 1.0}, 400,
                             max_epochs=2.0).collect()}
    # a: 200 toks, target 300, epochs 1.5 uncapped, planned 300
    assert (out["a"]["n_tokens"], out["a"]["target_tokens"],
            out["a"]["epochs"], out["a"]["planned_tokens"],
            out["a"]["capped"]) == (200, 300.0, 1.5, 300.0, False)
    # b: 50 toks, target 100 -> 2 epochs exactly, not capped
    assert (out["b"]["epochs"], out["b"]["capped"]) == (2.0, False)
    # c: weight 0 -> everything 0, never capped
    assert (out["c"]["weight"], out["c"]["target_tokens"],
            out["c"]["planned_tokens"], out["c"]["capped"]) \
        == (0.0, 0.0, 0.0, False)


def test_token_budget_plan_caps_over_epoching(spark):
    from feathr_spark.operators.mixture import token_budget_plan
    df = spark.createDataFrame(
        [(1, "w w", "tiny")], "doc_id bigint, text string, source string")
    r = token_budget_plan(df, {"tiny": 1.0}, 1000,
                          max_epochs=4.0).collect()[0]
    assert r["capped"] and r["epochs"] == 4.0
    assert r["planned_tokens"] == 8.0   # 4 epochs x 2 tokens


def test_token_budget_plan_validates():
    import pytest as _pt
    from feathr_spark.operators.mixture import token_budget_plan
    with _pt.raises(ValueError):
        token_budget_plan(None, {"a": 1.0}, 0)
    with _pt.raises(ValueError):
        token_budget_plan(None, {}, 10)


# --------------------------------------------------------- shard export

def test_shard_shuffle_is_permutation_and_deterministic(spark):
    from feathr_spark.operators.sampling import shard_shuffle
    df = spark.createDataFrame([(i,) for i in range(200)],
                               "doc_id bigint")
    a = shard_shuffle(df, n_shards=4).collect()
    b = shard_shuffle(df.repartition(7), n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # stable
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense
    assert sum(len(v) for v in by_shard.values()) == 200


def test_shard_shuffle_salt_redeals(spark):
    from feathr_spark.operators.sampling import shard_shuffle
    df = spark.createDataFrame([(i,) for i in range(100)],
                               "doc_id bigint")
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shard_shuffle(df, 4).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shard_shuffle(df, 4, salt="epoch1").collect()}
    assert a != b
