"""Bounded-memory frequent-items (heavy hitters) via merged Misra-Gries.

Approximate top-k terms for corpora whose vocabulary is too large to shuffle
exactly. The exact path (``text.top_ngrams``) shuffles one row per DISTINCT
term — at 100 TB of web text the n-gram vocabulary is billions of rows. This
sketch caps the shuffle at ``capacity`` rows PER PARTITION regardless of
vocabulary size: each partition maintains a Misra-Gries summary (Misra &
Gries 1982; the "space-saving"/"frequent" family) over its local term
stream, then only the summaries are merged.

Guarantee (standard MG bound): a partition summary undercounts any term by
at most ``floor(local_n / capacity)``. Summing summaries is itself an MG
merge, so the global estimate undercounts by at most ``sum_p floor(n_p /
capacity)`` — reported per term as ``max_err``. Every term with true count
> max_err is guaranteed PRESENT in the merged summary; with
``capacity >> k`` the top-k by estimated count matches the exact top-k for
skewed (Zipfian) corpora. Accuracy is driver-gated, ANN-recall style.

Plan shape: tokenization stays JVM-side (split + explode, whole-stage
codegen); Python sees only a single term column through Arrow-batched
``mapInPandas`` holding one dict of ≤ capacity counters per partition. The
exchange then carries ≤ capacity * n_partitions tiny rows.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("err", T.LongType()),
    ]
)


def _misra_gries_partition(capacity: int):
    """Build the per-partition mapInPandas function (capacity counters)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decremented = 0
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                c = int(c)
                if term in counters:
                    counters[term] += c
                    continue
                counters[term] = c
                if len(counters) <= capacity:
                    continue
                # Generalized decrement: subtract the minimum counter from
                # every entry and evict the zeros (batch form of MG's
                # decrement-all-by-one, same bound).
                m = min(counters.values())
                decremented += m
                counters = {t: n - m for t, n in counters.items() if n > m}
        if not counters:
            return
        yield pd.DataFrame(
            {
                "term": list(counters.keys()),
                "cnt": list(counters.values()),
                "err": [decremented] * len(counters),
            }
        )

    return summarize


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Approximate top-``k`` whitespace tokens of a text corpus.

    Returns ``(term, est_count, max_err)`` ordered by ``est_count`` DESC,
    ``term`` ASC — ``est_count <= true count <= est_count + max_err``.
    ``capacity`` is the per-partition counter budget (memory AND shuffle
    bound); raise it for flatter distributions.
    """
    if capacity < k:
        raise ValueError("heavy_hitters: capacity must be >= k")
    terms = (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("term")
        )
        .where(F.col("term") != "")
    )
    summaries = terms.mapInPandas(
        _misra_gries_partition(int(capacity)), schema=_SUMMARY_SCHEMA
    )
    # Two consumers below (error bound + merged counts); persist the tiny
    # summary frame (<= capacity * n_partitions rows) so the corpus is
    # tokenized and sketched exactly ONCE.
    summaries = summaries.persist()
    # err is emitted per summary row; the per-partition error is the MAX of
    # its rows (all equal), and the merged bound is the SUM over partitions.
    # A term absent from some partition's summary may have been decremented
    # away there, so the global bound (sum of every partition's decrement
    # total) is the sound per-term error. Compute it as a 1-row frame from
    # per-partition firsts and broadcast it onto the merged counts.
    part_err = (
        summaries.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.max("err").alias("perr"))
        .agg(F.sum("perr").alias("max_err"))
    )
    merged = summaries.groupBy("term").agg(F.sum("cnt").alias("est_count"))
    topk = merged.orderBy(
        F.desc("est_count"), F.asc("term")
    ).limit(int(k))
    return topk.crossJoin(F.broadcast(part_err)).select(
        "term", "est_count", F.coalesce("max_err", F.lit(0)).alias("max_err")
    )


def count_min_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of a corpus's whitespace-token frequencies
    (Cormode & Muthukrishnan 2005): ``depth`` hash rows × ``width``
    buckets of ADDITIVE counters — the other classic mergeable
    frequency sketch next to :func:`heavy_hitters`' Misra-Gries (MG
    answers "what are the top terms", CMS answers "how often is THIS
    term" for arbitrary later queries from constant state).

    The sketch IS a DataFrame: (row, bucket, cnt), at most depth×width
    rows regardless of corpus size — write it to parquet, merge sketches
    of corpus shards by summing matching cells. Hashes are deterministic
    ``xxhash64(term, row-seed) mod width``, so sketches built anywhere
    compose. Guarantee: estimate ≥ true count, and ≤ true + εN with
    ε = e/width at probability 1 − e^−depth. One explode + ONE
    (row, bucket) aggregate — map-side partials cap the shuffle at
    depth×width rows per task.
    """
    terms = (df.select(F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"))
        .where(F.col("term") != ""))
    cells = terms.select(F.posexplode(F.array(*[
        F.pmod(F.xxhash64(F.col("term"), F.lit(r)), F.lit(width))
        for r in range(depth)
    ])).alias("row", "bucket"))
    return (cells.groupBy("row", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_lookup(sketch: DataFrame, terms: DataFrame,
               term_col: str = "term", depth: int = 3,
               width: int = 1024) -> DataFrame:
    """Point-query a :func:`count_min_sketch`: per term, the minimum of
    its ``depth`` bucket counters (the CMS estimate). ``terms`` is a
    (usually small) frame of query terms; the join is on (row, bucket)
    against the depth×width-row sketch — broadcast by size. Missing
    cells count 0 (term never hashed there).

    Output: (``term_col``, est_count).
    """
    probes = terms.select(
        F.col(term_col),
        F.posexplode(F.array(*[
            F.pmod(F.xxhash64(F.col(term_col), F.lit(r)), F.lit(width))
            for r in range(depth)
        ])).alias("row", "bucket"))
    return (probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy(term_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("est_count")))
