"""Bloom-prefiltered exact containment joins (100 TB decontamination path).

The standard cross-corpus membership problem — "which probe-side rows have
a key that exists in the build-side corpus?" — is a semi join whose naive
plan shuffles the ENTIRE probe side on the key. At 100 TB the probe side
is the training corpus and the overwhelming majority of its rows miss
(decontamination hit rates are typically well under 1%), so almost all of
that shuffle moves rows that a membership sketch could have rejected
locally.

These operators put a Bloom filter in front of the exact join, the same
idea Spark's own InjectRuntimeFilter rule applies internally with
``BloomFilterAggregate`` (not exposed to SQL in this build, so the sketch
is composed from public primitives):

* **Build** (one pass over build-side keys, no wide shuffle of payloads):
  each key sets ``num_hashes`` bit positions ``pmod(xxhash64(key, i), m)``;
  positions are grouped into 64-bit words and OR-combined with the
  ``bit_or`` aggregate. ``bit_or`` has a partial-merge implementation, so
  the only exchange moves at most ``m/64`` partially-combined words per
  map task — the sketch, never the keys.
* **Probe** (zero shuffle, whole-stage codegen): the word table (at most
  ``m/64`` rows, 16 bytes each) broadcasts; each of the ``num_hashes``
  membership tests is a broadcast hash join against it. The k joins all
  broadcast the SAME frame, so the exchange is built once and reused
  (ReusedExchange). Rows failing any bit test are discarded before any
  shuffle happens.
* **Verify** (exact): Bloom filters have no false negatives, so the
  surviving maybe-members — a small fraction of the probe side at real
  hit rates — go through the ordinary exact semi/anti join. The final
  output is therefore EXACTLY the semi/anti join result; the sketch only
  changes how many rows reach the shuffle.

Sizing: ``m = -n·ln(p)/ln(2)²`` bits and ``k = (m/n)·ln(2)`` hashes for
``n`` expected build keys at false-positive rate ``p`` (Bloom, CACM 1970).
At p=1% that is ~9.6 bits/key: 1e9 build keys → ~1.2 GB of words, at
which point pass ``broadcast_words=False`` to let AQE pick the join
strategy instead of forcing a driver-sized broadcast.
"""
from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, functions as F


def bloom_parameters(expected_items: int, fp_rate: float) -> tuple[int, int]:
    """Optimal (m_bits, num_hashes) for ``expected_items`` keys at
    ``fp_rate`` — the textbook formulas, with m rounded up to a multiple
    of 64 so the word table has no ragged tail."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError("fp_rate must be in (0, 1)")
    m = -expected_items * math.log(fp_rate) / (math.log(2) ** 2)
    m_bits = max(64, int(math.ceil(m / 64.0)) * 64)
    k = max(1, round(m_bits / expected_items * math.log(2)))
    return m_bits, int(k)


def _position(key_col: str, i: int, m_bits: int):
    """Bit position i for a key: pmod(xxhash64(key, i), m). Varying the
    second hashed column acts as the per-hash seed; pmod keeps the
    position non-negative."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))


def build_bloom_words(df_build: DataFrame, key_col: str, m_bits: int,
                      num_hashes: int) -> DataFrame:
    """One-pass Bloom build: DataFrame of (__bloom_w, __bloom_bits) 64-bit
    words, at most ``m_bits/64`` rows. Duplicate build keys cost nothing
    (they set the same bits), so no distinct() — the build side is
    scanned once with no key shuffle; only partially bit_or-combined
    words reach the exchange."""
    positions = F.array(*[_position(key_col, i, m_bits)
                          for i in range(num_hashes)])
    return (df_build
            .where(F.col(key_col).isNotNull())
            .select(F.explode(positions).alias("__bloom_p"))
            .select(F.shiftright("__bloom_p", 6).alias("__bloom_w"),
                    F.expr("shiftleft(1L, int(__bloom_p % 64))")
                     .alias("__bloom_b"))
            .groupBy("__bloom_w")
            .agg(F.bit_or("__bloom_b").alias("__bloom_bits")))


def _with_might_contain(df_probe: DataFrame, words: DataFrame, key_col: str,
                        m_bits: int, num_hashes: int,
                        broadcast_words: bool) -> tuple[DataFrame, list[str]]:
    """Attach ``__bloom_might`` (all k bits set) to the probe frame via k
    joins against the word table. Returns (frame, internal column names
    to drop). With ``broadcast_words`` the k joins share one reused
    broadcast exchange; without it AQE chooses (huge-m escape hatch)."""
    probed = df_probe
    internal = ["__bloom_might"]
    checks = []
    for i in range(num_hashes):
        pcol, wcol, bitscol = f"__bloom_p{i}", f"__bloom_w{i}", f"__bloom_bits{i}"
        probed = probed.withColumn(pcol, _position(key_col, i, m_bits))
        side = words.select(F.col("__bloom_w").alias(wcol),
                            F.col("__bloom_bits").alias(bitscol))
        if broadcast_words:
            side = F.broadcast(side)
        probed = probed.join(side,
                             F.shiftright(F.col(pcol), 6) == F.col(wcol),
                             "left")
        # missing word row -> no build key ever touched it -> bit is 0
        checks.append(F.expr(
            f"coalesce(shiftrightunsigned({bitscol}, int({pcol} % 64)), 0L)"
            f" & 1L = 1L"))
        internal += [pcol, wcol, bitscol]
    might = checks[0]
    for c in checks[1:]:
        might = might & c
    return probed.withColumn("__bloom_might", might), internal


def _resolve_params(df_build: DataFrame, build_key: str,
                    expected_items: Optional[int], fp_rate: float,
                    m_bits: Optional[int],
                    num_hashes: Optional[int]) -> tuple[int, int]:
    if m_bits is not None:
        return m_bits, (num_hashes or 5)
    if expected_items is None:
        # explicit count action: one columnar scan of the key column.
        # Callers at scale should pass expected_items from catalog stats
        # instead of paying this job.
        expected_items = max(1, df_build.where(
            F.col(build_key).isNotNull()).count())
    return bloom_parameters(expected_items, fp_rate)


def bloom_semi_join(df_probe: DataFrame, df_build: DataFrame, key_col: str,
                    build_key_col: Optional[str] = None,
                    expected_items: Optional[int] = None,
                    fp_rate: float = 0.01,
                    m_bits: Optional[int] = None,
                    num_hashes: Optional[int] = None,
                    broadcast_words: bool = True) -> DataFrame:
    """Exact ``LEFT SEMI`` join of ``df_probe`` against ``df_build`` keys,
    Bloom-prefiltered: probe rows that fail the sketch (definite
    non-members) never reach the verification shuffle; the surviving
    maybe-members are exactly verified, so the result is identical to
    ``df_probe.join(df_build_keys, key, "left_semi")`` for ANY sketch
    parameters — m/k only trade prefilter selectivity.
    """
    build_key = build_key_col or key_col
    m, k = _resolve_params(df_build, build_key, expected_items, fp_rate,
                           m_bits, num_hashes)
    words = build_bloom_words(df_build, build_key, m, k)
    probed, internal = _with_might_contain(df_probe, words, key_col, m, k,
                                           broadcast_words)
    survivors = probed.where(F.col("__bloom_might")).drop(*internal)
    build_keys = (df_build.where(F.col(build_key).isNotNull())
                  .select(F.col(build_key).alias(key_col)))
    return survivors.join(build_keys, key_col, "left_semi")


def bloom_anti_join(df_probe: DataFrame, df_build: DataFrame, key_col: str,
                    build_key_col: Optional[str] = None,
                    expected_items: Optional[int] = None,
                    fp_rate: float = 0.01,
                    m_bits: Optional[int] = None,
                    num_hashes: Optional[int] = None,
                    broadcast_words: bool = True) -> DataFrame:
    """Exact ``LEFT ANTI`` join (decontamination direction: KEEP probe
    rows whose key is NOT in the build corpus), Bloom-prefiltered.

    No-false-negatives means a row the sketch rejects is PROVABLY absent
    from the build side, so the overwhelming clean majority is emitted
    straight off the scan with zero shuffle; only the maybe-members (true
    hits + the fp_rate sliver) pay the exact anti join. The probe
    pipeline is consumed by both branches and is recomputed rather than
    persisted — it is a narrow columnar scan + reused-broadcast joins,
    and caching it would materialize the full probe corpus, exactly the
    thing a 100 TB decontamination pass cannot afford.
    """
    build_key = build_key_col or key_col
    m, k = _resolve_params(df_build, build_key, expected_items, fp_rate,
                           m_bits, num_hashes)
    words = build_bloom_words(df_build, build_key, m, k)
    probed, internal = _with_might_contain(df_probe, words, key_col, m, k,
                                           broadcast_words)
    clean = probed.where(~F.col("__bloom_might")).drop(*internal)
    maybe = probed.where(F.col("__bloom_might")).drop(*internal)
    build_keys = (df_build.where(F.col(build_key).isNotNull())
                  .select(F.col(build_key).alias(key_col)))
    verified_clean = maybe.join(build_keys, key_col, "left_anti")
    return clean.unionByName(verified_clean)
