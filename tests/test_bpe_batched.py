"""Batched BPE induction (VERDICT r9 item 6): bpe_merges(batch=k) must
produce the IDENTICAL merge table to the sequential loop — the
prefix-admission rule (disjoint symbols + reach bound) is what makes
the amortized driver round-trips safe, so these tests hammer exactly
the interaction cases where naive top-k batching diverges.
"""

import random

import pytest

from feathr_spark.operators.bpe import (_admit_prefix, bpe_merges,
                                        word_frequencies)
from tests.test_curation_round9 import _bpe_reference


def _merges(spark, docs, n, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id bigint, text string")
    return bpe_merges(df, n_merges=n, **kw)


def test_batched_equals_sequential_on_reference_corpus(spark):
    docs = ["low lower lowest", "low low newer newest",
            "wider wide new", "lowlow wideness newness",
            "er er er est est"]
    seq = _merges(spark, docs, 10, checkpoint_every=3)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id bigint, text string")
    wc = {r["word"]: r["wn"] for r in word_frequencies(df).collect()}
    assert seq == _bpe_reference(wc, 10)
    for b in (2, 4, 16):
        assert _merges(spark, docs, 10, batch=b,
                       checkpoint_every=3) == seq


def test_batched_created_pair_displaces_naive_second_pick(spark):
    """'zab' x10 + 'cd' x9: sequential merges (a,b,10) then (z,ab,10) —
    the pair CREATED by merge 1 outranks (c,d,9). A naive 2-batch of
    the top-2 disjoint pairs would wrongly take (c,d); the reach bound
    must stop the batch after (a,b)."""
    docs = [" ".join(["zab"] * 10 + ["cd"] * 9)]
    seq = _merges(spark, docs, 3)
    assert seq[0] == ("a", "b", 10)
    assert seq[1] == ("z", "ab", 10)
    for b in (2, 3, 8):
        assert _merges(spark, docs, 3, batch=b) == seq


def test_batched_self_pair_and_shared_symbol_stop(spark):
    # 'aaaa': (a,a,3) then (aa,aa,1) — same-symbol chains force
    # 1-merge batches and the fused-string block
    docs = ["aaaa aaaa", "bb cc"]
    seq = _merges(spark, docs, 4)
    for b in (2, 4):
        assert _merges(spark, docs, 4, batch=b) == seq


def test_batched_augments_existing_symbol(spark):
    """A later (a,b) re-merge augments pairs touching the ALREADY
    EXISTING 'ab' symbol — the reach bound's 'existing' term."""
    docs = ["abab " * 6 + "qab " * 5 + "xy " * 4]
    seq = _merges(spark, docs, 4)
    for b in (2, 4):
        assert _merges(spark, docs, 4, batch=b) == seq


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_batched_equals_sequential_randomized(spark, seed):
    """Seeded small-alphabet corpora maximize pair interactions (every
    merge perturbs its neighbors); batched tables must still be
    bit-identical to the sequential ones, counts included."""
    rng = random.Random(seed)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
             for _ in range(60)]
    docs = [" ".join(rng.choices(words, k=25)) for _ in range(4)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id bigint, text string")
    wc = {r["word"]: r["wn"] for r in word_frequencies(df).collect()}
    expect = _bpe_reference(wc, 8)
    assert _merges(spark, docs, 8, batch=5) == expect
    assert _merges(spark, docs, 8, batch=2, checkpoint_every=2) == expect


def test_admit_prefix_unit():
    class Row(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    def rows(*triples):
        return [Row(l=l, r=r, n=n) for l, r, n in triples]

    # disjoint, well-separated counts -> all admitted
    top = rows(("a", "b", 100), ("c", "d", 40), ("e", "f", 10))
    assert _admit_prefix(top, False, 3) == [
        ("a", "b", 100), ("c", "d", 40), ("e", "f", 10)]
    # shared symbol stops the batch
    top = rows(("a", "b", 100), ("b", "c", 90), ("x", "y", 80))
    assert _admit_prefix(top, False, 3) == [("a", "b", 100)]
    # reach bound: fusing (a,b) can AUGMENT the pre-existing (x,'ab')
    # pair (35) by up to the (z,a) adjacency count (40) -> a post-fuse
    # count of up to 75, so the disjoint (c,d,70) must NOT be admitted
    top = rows(("a", "b", 100), ("c", "d", 70), ("z", "a", 40),
               ("x", "ab", 35))
    assert _admit_prefix(top, False, 4) == [("a", "b", 100)]
    # ...but a candidate above every reach bound is safe
    top = rows(("a", "b", 100), ("c", "d", 99), ("z", "a", 6))
    assert _admit_prefix(top, False, 3) == [
        ("a", "b", 100), ("c", "d", 99)]
    # truncated list (full=True): unseen pairs bound by the last count,
    # reach = gain + existing = 2 * tail
    top = rows(("a", "b", 100), ("c", "d", 30))
    assert _admit_prefix(top, True, 2) == [("a", "b", 100)]
    assert _admit_prefix(top, False, 2) == [
        ("a", "b", 100), ("c", "d", 30)]
    # want cap respected
    top = rows(("a", "b", 100), ("c", "d", 40))
    assert _admit_prefix(top, False, 1) == [("a", "b", 100)]


def test_merge_table_roundtrip_and_encode(spark, tmp_path):
    from feathr_spark.operators.bpe import (bpe_encode_stats,
                                            merges_from_df, merges_to_df)
    docs = ["low lower lowest", "low low newer newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id bigint, text string")
    merges = bpe_merges(df, n_merges=6, batch=3)
    path = str(tmp_path / "merges.parquet")
    merges_to_df(spark, merges).write.parquet(path)
    reloaded = merges_from_df(spark.read.parquet(path))
    assert reloaded == merges
    # the reloaded table drives the encoder identically
    a = sorted(map(tuple, bpe_encode_stats(
        df, [(l, r) for l, r, _ in merges]).collect()))
    b = sorted(map(tuple, bpe_encode_stats(
        df, [(l, r) for l, r, _ in reloaded]).collect()))
    assert a == b
