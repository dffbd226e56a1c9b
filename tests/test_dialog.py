"""Dialog/SFT-data operators: validity gate rules, loss-budget
accounting, turn flattening.
"""

import pytest

from feathr_spark.operators.dialog import dialog_stats, flatten_turns


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, "
              "turns array<struct<role string, content string>>")


def _stats(spark, rows):
    return {r["doc_id"]: r
            for r in dialog_stats(_df(spark, rows)).collect()}


def test_valid_conversation_with_and_without_system(spark):
    out = _stats(spark, [
        (1, [("user", "hi"), ("assistant", "hello there")]),
        (2, [("system", "be nice"), ("user", "hi"),
             ("assistant", "hey"), ("user", "ok"),
             ("assistant", "bye")]),
    ])
    assert out[1]["valid"] and out[2]["valid"]
    assert out[1]["n_turns"] == 2 and out[2]["n_turns"] == 5
    assert out[2]["n_user"] == 2 and out[2]["n_assistant"] == 2
    # loss budget: assistant chars / total chars
    assert out[1]["assistant_chars"] == 11
    assert out[1]["total_chars"] == 13
    assert out[1]["assistant_share"] == pytest.approx(round(11 / 13, 4))


def test_invalid_cases(spark):
    out = _stats(spark, [
        # starts with assistant
        (1, [("assistant", "hi"), ("user", "yo")]),
        # two users in a row
        (2, [("user", "a"), ("user", "b"), ("assistant", "c")]),
        # ends on user (incomplete exchange)
        (3, [("user", "a"), ("assistant", "b"), ("user", "c")]),
        # empty content
        (4, [("user", ""), ("assistant", "b")]),
        # unknown role
        (5, [("user", "a"), ("tool", "x"), ("assistant", "b")]),
        # system not first -> breaks alternation
        (6, [("user", "a"), ("system", "s"), ("assistant", "b")]),
        # system only / no exchange
        (7, [("system", "s")]),
        # NULL content
        (8, [("user", "a"), ("assistant", None)]),
    ])
    for i in range(1, 9):
        assert not out[i]["valid"], i


def test_flatten_turns_shape(spark):
    df = _df(spark, [(9, [("system", "s"), ("user", "hi there"),
                          ("assistant", None)])])
    rows = {r["turn_idx"]: r for r in flatten_turns(df).collect()}
    assert [rows[i]["role"] for i in range(3)] == \
        ["system", "user", "assistant"]
    assert rows[1]["n_chars"] == 8
    assert rows[2]["content"] is None and rows[2]["n_chars"] == 0
