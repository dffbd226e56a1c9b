"""Exact-substring duplication report (Lee et al. ExactSubstr shape):
keep-first semantics, maximal-span merging, min_len granularity,
self-repetition, short-doc exclusion.
"""

import pytest

from feathr_spark.operators.dedup import exact_substring_spans


def _run(spark, docs, min_len=10):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in
            exact_substring_spans(df, min_len=min_len).collect()}


def test_keep_first_and_exact_span_length(spark):
    a = "abcdefghijKLMNOPQRSTuvwxyz"          # 26 chars, unique tail
    b = "IIIIIabcdefghijOOOOOOOOOO"           # contains a's first 10
    out = _run(spark, [(1, a), (2, b)])
    # first occurrence (doc 1) exempt; doc 2 carries one 10-char span
    assert 1 not in out
    assert out[2]["n_dup_spans"] == 1
    assert out[2]["dup_chars"] == 10
    assert out[2]["n_chars"] == len(b)
    assert out[2]["dup_ratio"] == pytest.approx(round(10 / len(b), 4))


def test_overlapping_grams_merge_to_maximal_span(spark):
    a = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    # doc 2 embeds a 15-char substring of a -> 6 overlapping dup grams
    # must merge into ONE 15-char span
    b = "xx" + a[5:20] + "yyyyyyyy"
    out = _run(spark, [(1, a), (2, b)])
    assert out[2]["n_dup_spans"] == 1
    assert out[2]["dup_chars"] == 15


def test_two_disjoint_spans_counted_separately(spark):
    a = "0123456789qqqqqqqqqqABCDEFGHIJ"
    b = "0123456789zzzzzzzzzzABCDEFGHIJ"   # shares head AND tail, not mid
    out = _run(spark, [(1, a), (2, b)])
    assert out[2]["n_dup_spans"] == 2
    assert out[2]["dup_chars"] == 20


def test_self_repetition_within_one_doc(spark):
    out = _run(spark, [(1, "Z" * 30)])
    # grams at pos 1..21 identical; pos 1 kept, 2..21 merge to [2, 31)
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["dup_chars"] == 29
    assert out[1]["n_chars"] == 30


def test_short_docs_and_sub_minlen_dups_invisible(spark):
    # 9-char shared substring < min_len -> not a duplication; doc
    # shorter than min_len has no gram at all
    out = _run(spark, [(1, "123456789_filler_abc"),
                       (2, "123456789-OTHER-tail"),
                       (3, "tiny")])
    assert out == {}


def test_corpus_order_defines_first(spark):
    # same text under ids 5 < 7: id 5 exempt, id 7 fully duplicated
    t = "The quick brown fox jumps over it"
    out = _run(spark, [(7, t), (5, t)])
    assert 5 not in out
    assert out[7]["dup_chars"] == len(t)
    assert out[7]["dup_ratio"] == pytest.approx(1.0)
