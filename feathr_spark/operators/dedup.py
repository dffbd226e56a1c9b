"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB): every method is a pure DataFrame pipeline —
shingle/hash/signature computation is per-row (narrow, codegen'd builtin
expressions, no Python UDFs); candidate generation is a band-bucket
self-join (shuffle on bucket id only, never an all-pairs product);
verification runs only on bucket-colliding pairs. Buckets with a single
member never join. Deterministic seeds throughout (reproducible runs).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Permutation family h_j(x) = (a_j*x + b_j) mod M31 over 31-bit base
# hashes: 31-bit operands keep a*h + b < 2^62, inside int64 even with ANSI
# overflow checks. M31 collisions are irrelevant for minhash accuracy.
_MERSENNE = (1 << 31) - 1


def _perm_params(num_perm: int) -> List[tuple]:
    # deterministic LCG-derived parameters (no RNG dependency)
    params = []
    a, b = 0x4A7C15, 0x27D4EB4F
    for _ in range(num_perm):
        a = (a * 6364136223846793005 + 1442695040888963407) % _MERSENNE
        b = (b * 6364136223846793005 + 1442695040888963407) % _MERSENNE
        params.append((a | 1, b))
    return params


def normalize_text(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy on normalized text: one representative
    (min id) per distinct content + the duplicate count. Single shuffle on
    the md5 fingerprint (not the full text — short keys, skew-safe)."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (df.select(F.col(id_col), fp.alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").cast("bigint").alias("n_dups")))


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of normalized text (builtin
    transform/sequence — no UDF)."""
    norm = normalize_text(col)
    n = F.length(norm)
    return F.when(n < k, F.array(norm)).otherwise(
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: norm.substr(i, F.lit(k)),
        )))


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of normalized text."""
    tokens = F.split(normalize_text(col), " ")
    cnt = F.size(tokens)
    return F.when(cnt < n, F.array(F.concat_ws(" ", tokens))).otherwise(
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        )))


def minhash_signature(shingles: Column, num_perm: int = 64) -> Column:
    """MinHash signature: per permutation j, min over shingle base-hashes of
    (a_j*h + b_j) mod M61. Base hash xxhash64 is computed once per shingle."""
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))

    def perm_fn(a: int, b: int):
        return lambda h: F.pmod(h * a + b, F.lit(_MERSENNE))

    sigs = [F.array_min(F.transform(base, perm_fn(a, b)))
            for a, b in _perm_params(num_perm)]
    return F.array(*sigs)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding.

    shingle → minhash → band → bucket-join: each doc emits `bands` rows
    keyed by (band_id, xxhash64(band rows)); a self-join per bucket yields
    candidates; optional exact-Jaccard verification on the shingle sets
    filters to ``threshold``. Output: (id_a, id_b, jaccard), id_a < id_b.
    """
    rows_per_band = num_perm // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        char_shingles(F.col(text_col), shingle_k).alias("__sh"),
    ).withColumn("__sig", minhash_signature(F.col("__sh"), num_perm))

    banded = base.select(
        "__id", "__sh",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.concat_ws(
                ",", F.transform(F.slice(F.col("__sig"), b * rows_per_band + 1,
                                         rows_per_band), lambda x: x.cast("string")))),
        )).alias("__band", "__bucket"),
    )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (left.join(right,
                      (F.col("l.__band") == F.col("r.__band")) &
                      (F.col("l.__bucket") == F.col("r.__bucket")) &
                      (F.col("l.__id") < F.col("r.__id")))
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
                    F.col("l.__sh").alias("sh_a"), F.col("r.__sh").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))

    if not verify:
        return cand.select("id_a", "id_b")
    return (cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b",
                    F.round("jaccard", 4).cast("double").alias("jaccard")))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 32) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs, LSH-candidated (lower thresholds
    need more bands: bands=32 → rows_per_band=2 catches J≈0.5 pairs)."""
    rows_per_band = num_perm // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        word_ngrams(F.col(text_col), n).alias("__sh"),
    ).withColumn("__sig", minhash_signature(F.col("__sh"), num_perm))
    banded = base.select(
        "__id", "__sh",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.concat_ws(
                ",", F.transform(F.slice(F.col("__sig"), b * rows_per_band + 1,
                                         rows_per_band), lambda x: x.cast("string")))),
        )).alias("__band", "__bucket"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    cand = (left.join(right,
                      (F.col("l.__band") == F.col("r.__band")) &
                      (F.col("l.__bucket") == F.col("r.__bucket")) &
                      (F.col("l.__id") < F.col("r.__id")))
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
                    F.col("l.__sh").alias("sh_a"), F.col("r.__sh").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b",
                    F.round("jaccard", 4).cast("double").alias("jaccard")))


def simhash64(col: Column, k: int = 3, n_bits: int = 64) -> Column:
    """64-bit SimHash over word k-shingles: bit i of the result is the sign
    of the vote sum over shingle-hash bit i. Bit loop is unrolled in Python
    (Spark disallows nested higher-order lambdas); each vote is a builtin
    ``aggregate`` over the shared shingle-hash array."""
    hashes = word_ngrams(col, k)
    hvals = F.transform(hashes, lambda s: F.xxhash64(s))

    def vote_fn(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1))

    out = F.lit(0).cast("bigint")
    for i in range(n_bits):
        mask = 1 << i
        if mask >= 1 << 63:  # sign bit: wrap to two's-complement int64
            mask -= 1 << 64
        vote = F.aggregate(hvals, F.lit(0).cast("bigint"), vote_fn(mask))
        out = out.bitwiseOR(F.when(vote > 0, F.lit(mask).cast("bigint"))
                            .otherwise(F.lit(0).cast("bigint")))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit band bucketing (any pair within
    hamming ≤ 3 of 64 bits shares at least one exact 16-bit band by
    pigeonhole when the 3 differing bits fall in ≤3 bands), then exact
    hamming verification."""
    sig = df.select(F.col(id_col).alias("__id"),
                    simhash64(F.col(text_col)).alias("__sim"))
    banded = sig.select(
        "__id", "__sim",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("__sim"), b * 16).bitwiseAND(F.lit(0xFFFF))
            for b in range(4)
        ])).alias("__band", "__bucket"))
    left, right = banded.alias("l"), banded.alias("r")
    cand = (left.join(right,
                      (F.col("l.__band") == F.col("r.__band")) &
                      (F.col("l.__bucket") == F.col("r.__bucket")) &
                      (F.col("l.__id") < F.col("r.__id")))
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
                    F.col("l.__sim").alias("sim_a"), F.col("r.__sim").alias("sim_b"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn("hamming", hamming64(F.col("sim_a"), F.col("sim_b")))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")))


def embedding_cosine_pairs(df: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id", threshold: float = 0.95,
                           planes: int = 16) -> DataFrame:
    """Embedding near-dup pairs: random-hyperplane LSH bucket (sign bits of
    deterministic pseudo-random projections) → in-bucket cosine verify.
    For very high thresholds one 16-bit bucket has high recall; increase
    `planes` tables for lower thresholds."""
    from .similarity import cosine, lsh_bucket
    v = df.select(F.col(id_col).alias("__id"),
                  F.col(vec_col).cast("array<double>").alias("__v"))
    dim = None  # resolved lazily inside lsh_bucket via expression
    bucketed = v.withColumn("__bucket", lsh_bucket(F.col("__v"), planes))
    left, right = bucketed.alias("l"), bucketed.alias("r")
    cand = (left.join(right, (F.col("l.__bucket") == F.col("r.__bucket")) &
                      (F.col("l.__id") < F.col("r.__id")))
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
                    F.col("l.__v").alias("va"), F.col("r.__v").alias("vb")))
    return (cand.withColumn("cosine", cosine(F.col("va"), F.col("vb")))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 4).cast("double").alias("cosine")))
