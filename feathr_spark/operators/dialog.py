"""Dialog / instruction-tuning data operators: multi-turn conversations
as nested ``array<struct<role, content>>`` columns.

SFT/RLHF corpora are conversations, not flat documents — the curation
engine needs turn-aware primitives: structural validation (role
alternation, non-empty content), loss-budget accounting (how many of
the characters you pay to train on are assistant turns — the only ones
that carry loss under standard masking), and flattening for per-turn
quality scoring by the existing text operators.

All three operators are pure nested-type expressions (higher-order
functions over the struct array / one ``posexplode``): zero shuffle,
whole-stage-codegen eligible, and exactly mirrorable in an engine with
list/struct HOFs (the DuckDB oracles process identical
``list<struct>`` values).

Role vocabulary follows the de-facto public chat schema: ``system``
(optional, first only), then strictly alternating ``user`` /
``assistant`` starting with ``user``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dialog_stats(df: DataFrame, turns_col: str = "turns",
                 id_col: str = "doc_id",
                 round_dp: int = 4) -> DataFrame:
    """Per-conversation structural + loss-budget readout.

    Output columns:

    * ``n_turns`` / ``n_user`` / ``n_assistant`` — turn counts;
    * ``valid`` — the structural gate: at least one user and one
      assistant turn, an optional single leading ``system`` turn, the
      rest strictly alternating user/assistant starting with user,
      ending on assistant (complete exchanges), no empty/NULL content,
      no unknown roles;
    * ``total_chars`` / ``assistant_chars`` — content volume;
    * ``assistant_share`` — assistant_chars / total_chars, the
      loss-bearing fraction under standard SFT masking (rounded,
      NULL for all-empty conversations).

    Row-local: every readout is one HOF fold over the array.
    """
    t = F.col(turns_col)
    # the alternation body: turns after an optional leading system turn
    body = F.when(
        (F.size(t) > 0) & (t[0]["role"] == F.lit("system")),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))).otherwise(t)
    n_user = F.size(F.filter(t, lambda s: s["role"] == F.lit("user")))
    n_asst = F.size(F.filter(t, lambda s: s["role"]
                             == F.lit("assistant")))
    roles_ok = F.size(F.filter(
        t, lambda s: ~s["role"].isin("system", "user", "assistant"))) \
        == 0
    content_ok = F.size(F.filter(
        t, lambda s: s["content"].isNull()
        | (F.length(s["content"]) == 0))) == 0
    # strict alternation: body[i].role must equal user when i is even,
    # assistant when odd — ONE zip of the body against its index
    # sequence, then count violations
    alt_ok = F.size(F.filter(
        F.zip_with(
            body,
            F.sequence(F.lit(0),
                       F.greatest(F.size(body) - 1, F.lit(0))),
            lambda s, i: s["role"] == F.when(
                i % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))),
        lambda ok: ~ok)) == 0
    ends_asst = (F.size(body) > 0) & \
        (F.element_at(body, -1)["role"] == F.lit("assistant"))
    total_chars = F.aggregate(
        t, F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.coalesce(F.length(s["content"])
                                        .cast("bigint"), F.lit(0)))
    asst_chars = F.aggregate(
        F.filter(t, lambda s: s["role"] == F.lit("assistant")),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.coalesce(F.length(s["content"])
                                        .cast("bigint"), F.lit(0)))
    valid = (n_user >= 1) & (n_asst >= 1) & roles_ok & content_ok \
        & alt_ok & ends_asst
    nudge = F.lit(10.0 ** -(round_dp + 5))
    return df.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_turns"),
        n_user.cast("bigint").alias("n_user"),
        n_asst.cast("bigint").alias("n_assistant"),
        valid.alias("valid"),
        total_chars.alias("total_chars"),
        asst_chars.alias("assistant_chars"),
        F.when(total_chars > 0,
               F.round(asst_chars / total_chars + nudge, round_dp))
        .cast("double").alias("assistant_share"))


def flatten_turns(df: DataFrame, turns_col: str = "turns",
                  id_col: str = "doc_id") -> DataFrame:
    """One row per turn: (``id_col``, turn_idx 0-based, role, content,
    n_chars) — the shape the flat text operators (quality gates, LM
    scoring, PII redaction) consume for per-turn curation. One
    ``posexplode``, zero shuffle."""
    return (df.select(F.col(id_col),
                      F.posexplode(F.col(turns_col))
                      .alias("turn_idx", "__t"))
            .select(F.col(id_col),
                    F.col("turn_idx").cast("bigint").alias("turn_idx"),
                    F.col("__t")["role"].alias("role"),
                    F.col("__t")["content"].alias("content"),
                    F.coalesce(F.length(F.col("__t")["content"]),
                               F.lit(0)).cast("bigint")
                    .alias("n_chars")))
