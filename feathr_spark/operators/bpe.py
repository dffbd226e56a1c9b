"""Tokenizer induction over a corpus: byte-pair-encoding merge mining.

The reference has no tokenizer surface (its expression DSL stops at Spark
scalar functions, `/root/reference/feathr-rs/src/model.rs:248-253`);
training-data pipelines need one — the vocabulary a corpus gets tokenized
with is itself LEARNED from the corpus (Sennrich et al., ACL 2016), and at
100 TB the frequency counting that drives the learning is exactly the kind
of work that must run where the data lives.

Two operators:

* :func:`bpe_pair_counts` — ONE round of pair statistics: the corpus-wide
  frequency of every adjacent symbol pair, top-k. This is the heavy,
  data-sized step of BPE training and is fully declarative (two keyed
  aggregations, a word-frequency collapse then a pair collapse — the
  second input is VOCABULARY-sized, not corpus-sized, which is the whole
  trick: a 100 TB corpus has ~10⁸ distinct words, so rounds after the
  first collapse are cheap however big the corpus is).

* :func:`bpe_merges` — the full iterative loop: repeatedly take the most
  frequent pair (deterministic tie-break), fuse it greedily left-to-right
  inside every vocabulary word, recount. The per-round driver traffic is
  one bounded collect; with ``batch > 1`` each recount admits a provably
  sequential-identical PREFIX of the top pairs (:func:`_admit_prefix`),
  so a real 50k-merge vocabulary costs thousands of rounds, not 50k. The
  fuse is a narrow ``aggregate`` lambda over symbol arrays, never Python.
  The word frame is persisted per round and the lineage is truncated
  periodically, the same discipline as the graph loops
  (``operators/graph.py``).

Symbols are characters of the whitespace-normalized lowercase words (no
end-of-word marker — the synthetic corpus carries no morphology worth
modeling; plumb one in by appending a sentinel char upstream if needed).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import _norm_tokens

_PAIR_STRUCT = ("transform(sequence(1, size({c}) - 1), "
                "i -> struct({c}[i - 1] AS l, {c}[i] AS r))")


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(word, wn)`` — the corpus-sized
    collapse every BPE round reuses. One keyed shuffle (map-side
    combined), output vocabulary-sized."""
    return (df.select(F.explode(_norm_tokens(F.col(text_col)))
                      .alias("word"))
            .where(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wn")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    k: int = 20) -> DataFrame:
    """Top-``k`` adjacent character pairs by corpus frequency — round 1
    of BPE training as a standalone readout (also the degenerate-corpus
    smoke check: a healthy natural-language corpus has 'th'/'in'-style
    leaders, OCR noise shows up as junk bigrams at the top).

    Pair occurrences count per word occurrence (weight = word count),
    overlapping occurrences included ('aaa' contributes 2 x 'aa') — the
    plain statistics convention; the MERGE loop (:func:`bpe_merges`)
    fuses non-overlapping left-to-right like every BPE implementation.

    Plan: word collapse (corpus-sized shuffle) -> explode the
    vocabulary's adjacent pairs -> pair collapse (vocabulary-sized
    shuffle) -> TakeOrderedAndProject on (count DESC, pair ASC) — a
    total order, so the k-cut is engine-deterministic.

    Output: (pair, n_pairs).
    """
    words = word_frequencies(df, text_col)
    pairs = (words.where(F.length("word") >= 2)
             .select(F.col("wn"),
                     F.explode(F.expr(
                         "transform(sequence(1, length(word) - 1), "
                         "i -> substring(word, i, 2))")).alias("pair")))
    return (pairs.groupBy("pair")
            .agg(F.sum("wn").cast("bigint").alias("n_pairs"))
            .orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
            .limit(int(k)))


def _fuse_expr(left: str, right: str) -> str:
    """SQL ``aggregate`` lambda fusing every non-overlapping adjacent
    (left, right) occurrence in ``syms``, greedily left-to-right (after
    a fuse the merged token cannot re-pair with the next symbol within
    the same round — the standard BPE replacement order)."""
    l_lit = "'" + left.replace("'", "\\'") + "'"
    r_lit = "'" + right.replace("'", "\\'") + "'"
    return f"""aggregate(
        syms,
        named_struct('acc', cast(array() as array<string>),
                     'pend', cast(null as string)),
        (s, x) -> if(s.pend = {l_lit} and x = {r_lit},
                     named_struct('acc',
                                  array_append(s.acc, concat({l_lit}, {r_lit})),
                                  'pend', cast(null as string)),
                     named_struct('acc',
                                  if(s.pend is not null,
                                     array_append(s.acc, s.pend), s.acc),
                                  'pend', x)),
        s -> if(s.pend is not null, array_append(s.acc, s.pend), s.acc))"""


def _admit_prefix(top, full: bool, want: int):
    """Admit a PREFIX of the collected top-M pair order that is provably
    identical to taking the merges one recount at a time.

    ``top`` is the top-M rows in the sequential selection order (count
    DESC, left ASC, right ASC); ``full`` says whether M rows came back
    (so unseen pairs are bounded by the last row's count rather than 0).

    Soundness: fusing an admitted pair j = (a, b) into symbol ``ab``
    can change other pairs' counts in exactly three ways —

    * pairs sharing a symbol string with j lose occurrences (they can
      only DROP, and every pair ranked above a later candidate was
      itself admitted, so drops never promote anything);
    * brand-new or augmented pairs ``(x, ab)`` / ``(ab, y)`` appear:
      each occurrence consumes an old ``(x, a)`` / ``(b, y)``
      adjacency, so the gain is ≤ the max old count over pairs with
      ``right == a`` or ``left == b``, and the pre-existing part (when
      ``ab`` was already a vocabulary symbol from an earlier round) is
      ≤ the max old count over pairs touching the string ``ab``. Their
      SUM bounds any post-fuse count such a pair can reach.

    A candidate i is admitted only while (1) its symbols are disjoint
    from every previously admitted pair's symbols AND fused strings
    (so its own count is exactly its old count), and (2) its count is
    STRICTLY greater than every previously admitted pair's reach bound
    (so nothing created/augmented can displace it, ties included). The
    first failure stops the batch — prefix-only admission is what makes
    the argument inductive. Counts beyond top-M are bounded by the
    M-th count (or 0 when the list was exhausted).
    """
    tail = int(top[-1]["n"]) if full else 0

    def _reach(l: str, r: str) -> int:
        # No self-exclusion: for l != r the pair (l, r) never matches
        # the adjacency predicate anyway, and for a SELF-pair (a, a)
        # the consumed adjacency feeding created pairs like (aa, a) /
        # (aa, aa) IS (a, a) itself — excluding it under-bounds and
        # admits wrong merges after a self-pair.
        fused = l + r
        gain = max([int(p["n"]) for p in top
                    if p["r"] == l or p["l"] == r] + [tail])
        existing = max([int(p["n"]) for p in top
                        if p["l"] == fused or p["r"] == fused] + [tail])
        return gain + existing

    admitted: List[Tuple[str, str, int]] = []
    bounds: List[int] = []
    blocked: set = set()
    for row in top:
        l, r, n = row["l"], row["r"], int(row["n"])
        if admitted:
            if l in blocked or r in blocked:
                break
            if any(n <= u for u in bounds):
                break
        admitted.append((l, r, n))
        if len(admitted) >= want:
            break
        bounds.append(_reach(l, r))
        blocked.update((l, r, l + r))
    return admitted


def bpe_merges(df: DataFrame, n_merges: int = 8,
               text_col: str = "text",
               checkpoint_every: int = 4,
               batch: int = 1) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table ``[(left, right, pair_count), ...]`` in learned order — the
    artifact a tokenizer ships.

    Each round: (1) pair-count aggregate over the VOCABULARY frame
    (weighted by word frequency; vocabulary-sized, not corpus-sized);
    (2) a bounded top-rows collect — the loop's only driver traffic;
    (3) fuse the winner(s) inside every word's symbol array with a
    narrow ``aggregate`` lambda (:func:`_fuse_expr`). The corpus is
    touched exactly once, by the initial word collapse.

    ``batch > 1`` amortizes the driver round-trips: each recount
    collects the top ``max(4·batch, 32)`` pairs and admits a prefix of
    them via :func:`_admit_prefix`, whose disjointness + reach-bound
    rule makes the batched merge table PROVABLY identical to the
    sequential one (tested equal on reference corpora). Real
    vocabularies admit many merges per recount once counts spread out,
    so a 50k-merge induction needs thousands, not 50k, Spark jobs —
    each still vocabulary-sized. ``batch=1`` is the plain
    one-argmax-per-round loop (1-row collect).

    The word frame persists across rounds (each round's job would
    otherwise replay the whole lineage) and ``localCheckpoint`` every
    ``checkpoint_every`` applied merges truncates the stacked fuse
    lambdas — the graph-loop discipline (``operators/graph.py``).
    """
    words = (word_frequencies(df, text_col)
             .select(F.expr("split(word, '')").alias("syms"),
                     F.col("wn"))
             .persist())
    merges: List[Tuple[str, str, int]] = []
    batch = max(1, int(batch))
    applied_since_ckpt = 0
    try:
        while len(merges) < int(n_merges):
            m_rows = 1 if batch == 1 else max(4 * batch, 32)
            top = (words.where(F.size("syms") >= 2)
                   .select(F.col("wn"),
                           F.explode(F.expr(
                               _PAIR_STRUCT.format(c="syms")))
                           .alias("p"))
                   .groupBy(F.col("p.l").alias("l"),
                            F.col("p.r").alias("r"))
                   .agg(F.sum("wn").alias("n"))
                   .orderBy(F.col("n").desc(), F.col("l").asc(),
                            F.col("r").asc())
                   .limit(m_rows)
                   .collect())
            if not top:
                break
            admitted = _admit_prefix(top, len(top) == m_rows,
                                     int(n_merges) - len(merges))
            nxt = words
            for l, r, n in admitted:
                merges.append((l, r, n))
                nxt = nxt.select(F.expr(_fuse_expr(l, r)).alias("syms"),
                                 F.col("wn"))
                applied_since_ckpt += 1
                if applied_since_ckpt >= int(checkpoint_every):
                    nxt = nxt.localCheckpoint(eager=True)
                    applied_since_ckpt = 0
            nxt = nxt.persist()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges


def bpe_encode_stats(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\x1f",
    round_dp: int = 4,
) -> DataFrame:
    """Apply an ORDERED merge table (the artifact :func:`bpe_merges`
    ships, or any fixed vocabulary's) and report per-document token
    statistics: whitespace word count, BPE token count, and fertility
    (chars per BPE token — the tokenizer-efficiency readout that decides
    whether a vocabulary suits a corpus).

    Encode algebra (cross-engine exact, no floats until the final
    ratio): a word's tokenization is a ``sep``-delimited string —
    ``·c₁··c₂··…·`` (single ``sep`` at the ends, double between
    tokens) — and applying merge (l, r) is ONE literal string replace
    ``·l··r· → ·lr·``: non-overlapping left-to-right replacement is
    exactly the BPE fuse order, and the boundary separators make a
    token-suffix/prefix false match impossible. Merges apply in rank
    order, each fully, per the standard encoder. ``sep`` (default unit
    separator, U+001F) must not occur inside words.

    Plan shape: the corpus collapses to per-doc word counts (one
    map-side-combined shuffle); the k replaces run over the DISTINCT
    vocabulary (the bpe_pair_counts trick — vocabulary-sized however
    big the corpus); one vocabulary-keyed join carries (word → token
    count) back; per-doc sums are exact BIGINTs. Output: (``id_col``,
    n_words, n_bpe_tokens, fertility).
    """
    d2 = sep + sep
    toks = (df.select(F.col(id_col).alias("__id"),
                      F.explode(_norm_tokens(F.col(text_col)))
                      .alias("word"))
            .where(F.col("word") != ""))
    dw = toks.groupBy("__id", "word").agg(
        F.count("*").cast("bigint").alias("__cnt"))
    vocab = dw.select("word").distinct()
    enc = vocab.withColumn(
        "__s", F.concat(F.lit(sep),
                        F.array_join(F.split(F.col("word"), ""), d2),
                        F.lit(sep)))
    for left, right in merges:
        pat = sep + left + d2 + right + sep
        rep = sep + left + right + sep
        enc = enc.withColumn(
            "__s", F.replace(F.col("__s"), F.lit(pat), F.lit(rep)))
    enc = enc.select(
        "word",
        F.size(F.split(F.col("__s"), d2)).cast("bigint").alias("__nb"),
        F.length("word").cast("bigint").alias("__nc"))
    j = dw.join(enc, "word")
    out = (j.groupBy("__id")
           .agg(F.sum("__cnt").cast("bigint").alias("n_words"),
                F.sum(F.col("__cnt") * F.col("__nb")).cast("bigint")
                .alias("n_bpe_tokens"),
                F.sum(F.col("__cnt") * F.col("__nc")).cast("bigint")
                .alias("__nchars")))
    fert = F.round(F.col("__nchars") / F.col("n_bpe_tokens")
                   + F.lit(10.0 ** -(round_dp + 5)), round_dp)
    return out.select(F.col("__id").alias(id_col), "n_words",
                      "n_bpe_tokens",
                      fert.cast("double").alias("fertility"))


def merges_to_df(spark, merges: List[Tuple[str, str, int]]) -> DataFrame:
    """Persist a learned merge table as a DataFrame — the tokenizer
    artifact travels with the data platform (write it as parquet next
    to the corpus it was trained on), mirroring the PQ codebook
    persistence pattern (``pq.pq_books_to_df``). Rank is the explicit
    merge order: the table is order-critical and DataFrames are not.
    """
    rows = [(i, l, r, int(n)) for i, (l, r, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank bigint, left string, right string, pair_count bigint")


def merges_from_df(df: DataFrame) -> List[Tuple[str, str, int]]:
    """Reload a persisted merge table in merge order (rank asc) —
    feed the (left, right) prefix to :func:`bpe_encode_stats`.
    Bounded collect: the table is vocabulary-sized by construction."""
    rows = df.select("rank", "left", "right", "pair_count") \
             .orderBy("rank").collect()
    return [(r["left"], r["right"], int(r["pair_count"])) for r in rows]
