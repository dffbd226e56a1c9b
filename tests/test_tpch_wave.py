"""Semantic cross-checks for the round-9 TPC-H wave.

The DuckDB oracles prove these queries on the fixed testdata corpora;
these tests attack the two places a fixed corpus can hide a bug:

* q21's decorrelated per-order fold replaced the textbook
  EXISTS/NOT-EXISTS self-join plan — equivalence is re-proved here
  against an independent pure-Python implementation of the textbook
  semantics on randomized corpora (different key overlaps, duplicate
  (order, supplier) lines, orders with 1..k suppliers).
* q15 keeps ALL suppliers tied at the maximum revenue (the classic
  float-max tie pitfall its decimal fold exists to prevent) — proved on
  a corpus constructed to tie exactly.
* q1's decimal folds are partition-order independent — proved by
  running the same corpus through 1-partition and 7-partition layouts
  and requiring bit-identical rows.
"""

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

EPOCH = datetime.datetime(1995, 1, 1)


def _write(d, name, table):
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))


def _gen_corpus(d, seed, n_orders=120, n_supp=12, n_lines=400):
    rng = np.random.default_rng(seed)
    odates = [EPOCH + datetime.timedelta(days=int(x))
              for x in rng.integers(0, 2000, size=n_orders)]
    _write(d, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, 50, n_orders), pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_orders),
        "o_totalprice": pa.array(rng.uniform(1e3, 1e5, n_orders)),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
    }))
    lo = rng.integers(0, n_orders, n_lines)
    ls = rng.integers(0, n_supp, n_lines)
    # ship 0..200 days after the order date: straddles the 90d cutoff
    sdates = [odates[o] + datetime.timedelta(days=int(x))
              for o, x in zip(lo, rng.integers(0, 200, n_lines))]
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 40, n_lines), pa.int64()),
        "l_suppkey": pa.array(ls, pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 7, n_lines), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 50, n_lines).astype(float)),
        "l_extendedprice": pa.array(rng.uniform(1e2, 1e4, n_lines)),
        "l_discount": pa.array(rng.integers(0, 11, n_lines) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, n_lines) / 100.0),
        "l_returnflag": pa.array(["N"] * n_lines),
        "l_linestatus": pa.array(["O"] * n_lines),
        "l_shipdate": pa.array(sdates, pa.timestamp("us")),
    }))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"S{k}" for k in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 5, n_supp), pa.int32()),
        "s_acctbal": pa.array(rng.uniform(0, 1e4, n_supp)),
    }))
    return odates, lo, ls, sdates


def _q21_textbook(odates, lo, ls, sdates):
    """The EXISTS/NOT-EXISTS semantics, computed directly: a supplier
    counts an order iff (its pair shipped late) AND (another supplier
    participated) AND (no other supplier shipped late)."""
    pairs = set(zip(lo.tolist(), ls.tolist()))
    late = {(int(o), int(s))
            for o, s, sd in zip(lo, ls, sdates)
            if sd > odates[o] + datetime.timedelta(days=90)}
    by_order, late_by_order = {}, {}
    for o, s in pairs:
        by_order.setdefault(o, set()).add(s)
    for o, s in late:
        late_by_order.setdefault(o, set()).add(s)
    wait = {}
    for o, s in late:
        others = by_order[o] - {s}
        late_others = late_by_order[o] - {s}
        if others and not late_others:
            wait[s] = wait.get(s, 0) + 1
    return wait


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_q21_fold_matches_textbook_exists_semantics(spark, tmp_path, seed):
    d = str(tmp_path)
    odates, lo, ls, sdates = _gen_corpus(d, seed)
    expect = _q21_textbook(odates, lo, ls, sdates)
    got = {r.s_suppkey: r.numwait
           for r in entry_mod.q_tpch_q21_waiting(spark, d).collect()}
    assert got == expect


def test_q15_keeps_every_supplier_tied_at_max(spark, tmp_path):
    d = str(tmp_path)
    _gen_corpus(d, seed=7, n_supp=6)
    # overwrite lineitem: suppliers 0 and 1 tie exactly at the top
    # (same price, zero discount, in-quarter shipdate), supplier 2 lower
    ship = datetime.datetime(1997, 11, 15)
    rows = [(0, 0, 5000.0), (1, 1, 5000.0), (2, 2, 100.0)]
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([0, 0, 0], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 1.0, 1.0]),
        "l_extendedprice": pa.array([r[2] for r in rows]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0, 0.0, 0.0]),
        "l_returnflag": pa.array(["N"] * 3),
        "l_linestatus": pa.array(["O"] * 3),
        "l_shipdate": pa.array([ship] * 3, pa.timestamp("us")),
    }))
    out = entry_mod.q_tpch_q15_top_supplier(spark, d).collect()
    assert sorted(r.s_suppkey for r in out) == [0, 1]
    assert all(r.total_revenue == 5000.0 for r in out)


def test_q1_fold_is_partition_order_independent(spark, tmp_path):
    """The decimal(18,6) sums must produce bit-identical output no
    matter how the scan is partitioned — re-lay the same lineitem out
    as 1 file and as 7 shuffled files and compare exactly."""
    d1, d7 = str(tmp_path / "p1"), str(tmp_path / "p7")
    os.makedirs(d1), os.makedirs(d7)
    _gen_corpus(d1, seed=3, n_lines=2000)
    li = pq.read_table(os.path.join(d1, "lineitem.parquet"))
    rng = np.random.default_rng(9)
    perm = rng.permutation(li.num_rows)
    shuffled = li.take(pa.array(perm))
    os.makedirs(os.path.join(d7, "lineitem.parquet"), exist_ok=True)
    for i in range(7):
        pq.write_table(
            shuffled.slice(i * 300, 300),
            os.path.join(d7, "lineitem.parquet", f"part-{i}.parquet"))

    def rows(d):
        return sorted(
            tuple(r) for r in entry_mod.q_tpch_q1_pricing(spark, d)
            .collect())

    assert rows(d1) == rows(d7)
