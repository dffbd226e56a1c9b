"""Training-sequence packing: concat-and-cut assignment of documents to
fixed-capacity token sequences (the T5/GPT pretraining "pack" step).

The reference's expression DSL delegates scalar work to Spark SQL
(`/root/reference/feathr-rs/src/model.rs:248-253`); sequence packing is an
engine extension a training-data pipeline needs (turn a filtered corpus
into fixed-length training sequences with near-zero padding).

Semantics: documents are concatenated in a deterministic order and the
stream is cut every ``capacity`` tokens. A document therefore occupies the
half-open token span ``[start_offset, start_offset + n_tokens)`` of its
bucket's stream and lands in packs ``floor(start/capacity)`` through
``floor((end-1)/capacity)`` — documents that straddle a cut are split
across consecutive packs (``n_splits`` > 1), exactly like concat-packing
in practice. Zero padding except in each bucket's final pack.

Design for scale: packing is embarrassingly parallel across ``n_buckets``
hash buckets (each bucket is an independent stream — the standard sharded
formulation; cross-bucket order carries no meaning for training). The
whole operator is ONE shuffle: a window partitioned by bucket, ordered by
the document id, computing a running token sum. No joins, no Python, no
driver state; at 100 TB raise ``n_buckets`` so each bucket's running sum
stays executor-local (buckets ≈ cluster cores × small constant).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash64
from .search import _norm_tokens


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 1024,
    n_buckets: int = 8,
    tokens_col: Optional[str] = None,
) -> DataFrame:
    """Assign each document its span in the packed training stream.

    ``tokens_col`` supplies a precomputed token count (e.g. from a real
    tokenizer); otherwise whitespace tokens of normalized text are
    counted row-locally. Zero-token rows are dropped (they occupy no
    span). The bucket comes from the engine-portable md5-prefix hash of
    the id, so the assignment is reproducible across engines and runs.

    Output (all BIGINT): (``id_col``, bucket, n_tokens, start_offset,
    pack_first, pack_last, offset_in_pack, n_splits) where offsets are
    token positions within the bucket's stream and ``n_splits`` is the
    number of packs the document touches.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    n_tok = (F.col(tokens_col) if tokens_col
             else F.size(_norm_tokens(F.col(text_col)))).cast("bigint")
    base = (df.select(F.col(id_col).alias("__id"), n_tok.alias("n_tokens"))
            .where(F.col("n_tokens") > 0)
            .withColumn("bucket",
                        F.pmod(portable_hash64(F.col("__id").cast("string")),
                               F.lit(n_buckets)).cast("bigint")))
    w = Window.partitionBy("bucket").orderBy("__id")
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    cap = F.lit(int(capacity)).cast("bigint")
    out = base.select(
        F.col("__id").alias(id_col),
        "bucket",
        "n_tokens",
        start,
        cum.alias("__end"),
    )
    # true integer division (`div`), not double `/`+cast: token offsets in
    # a 100 TB stream can exceed 2^53 where double division loses exactness
    pack_first = F.expr(f"start_offset div {int(capacity)}L")
    pack_last = F.expr(f"(__end - 1L) div {int(capacity)}L")
    return out.select(
        id_col, "bucket", "n_tokens", "start_offset",
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        F.pmod(F.col("start_offset"), cap).alias("offset_in_pack"),
        (pack_last - pack_first + 1).alias("n_splits"))


def length_buckets(min_bucket: int = 16, max_len: int = 2048) -> list:
    """The power-of-two bucket ceilings from ``min_bucket`` to
    ``max_len`` (inclusive) that :func:`padding_waste` pads to."""
    if min_bucket <= 0 or max_len < min_bucket:
        raise ValueError("need 0 < min_bucket <= max_len")
    out, b = [], int(min_bucket)
    while b < max_len:
        out.append(b)
        b *= 2
    out.append(int(max_len))
    return out


def bucket_case_sql(expr: str, buckets: list) -> str:
    """The CASE expression a SQL oracle mirrors for the bucket ceiling
    of token count ``expr`` — shared with the engine so both sides use
    the IDENTICAL literal ladder (never ``2^ceil(log2(n))``: log2 of an
    exact power of two is one FP rounding away from the wrong bucket,
    and the two engines need not err the same way)."""
    arms = " ".join(f"WHEN {expr} <= {b} THEN {b}"
                    for b in buckets[:-1])
    return f"CASE {arms} ELSE {buckets[-1]} END"


def padding_waste(
    df: DataFrame,
    text_col: str = "text",
    tokens_col: Optional[str] = None,
    min_bucket: int = 16,
    max_len: int = 2048,
) -> DataFrame:
    """Per-length-bucket padding-efficiency readout for PADDED batching
    (the SFT/eval counterpart of :func:`pack_sequences`: when sequences
    must not be split or concatenated, each doc pads up to its bucket's
    ceiling, and the padding is pure wasted compute).

    Docs bucket to the smallest power-of-two ceiling >= their token
    count (ladder from :func:`length_buckets`; the ceiling comparison is
    a literal CASE ladder on BOTH engine and oracle — see
    :func:`bucket_case_sql` for why never ``2^ceil(log2 n)``). Docs
    longer than ``max_len`` truncate to it: their overflow counts as
    ``trunc_tokens``, not padding. Zero-token rows are dropped (only
    reachable via ``tokens_col``: the repo-wide ``_norm_tokens``
    convention tokenizes empty text to ``['']`` — ONE token — on both
    engines, matching :func:`pack_sequences`).

    One narrow projection + one bucket-cardinality aggregate (map-side
    combined; ~``log2(max_len/min_bucket)`` groups) — a full-corpus
    readout with a ladder-sized result at any scale.

    Output per bucket: (bucket, n_docs, real_tokens, padded_tokens,
    pad_ratio, trunc_tokens) where ``pad_ratio`` = wasted fraction of
    the padded volume = 1 - real/padded.
    """
    ladder = length_buckets(min_bucket, max_len)
    n_tok = (F.col(tokens_col) if tokens_col
             else F.size(_norm_tokens(F.col(text_col)))).cast("bigint")
    eff = F.least(F.col("__n"), F.lit(int(max_len)).cast("bigint"))
    bucket = F.expr(bucket_case_sql("__eff", ladder)).cast("bigint")
    base = (df.select(n_tok.alias("__n"))
            .where(F.col("__n") > 0)
            .select("__n", eff.alias("__eff"))
            .select("__n", "__eff", bucket.alias("bucket")))
    agg = (base.groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("__d"),
                F.sum("__eff").alias("__real"),
                F.sum(F.col("__n") - F.col("__eff")).alias("__trunc")))
    padded = F.col("bucket") * F.col("__d")
    return agg.select(
        "bucket",
        F.col("__d").cast("bigint").alias("n_docs"),
        F.col("__real").cast("bigint").alias("real_tokens"),
        padded.cast("bigint").alias("padded_tokens"),
        F.round(F.lit(1.0) - F.col("__real").cast("double")
                / padded.cast("double") + F.lit(1e-9), 4)
        .cast("double").alias("pad_ratio"),
        F.col("__trunc").cast("bigint").alias("trunc_tokens"))
