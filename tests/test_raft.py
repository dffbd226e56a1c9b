"""Safety and liveness tests for the Raft registry-HA core
(feathr_spark/registry/raft.py) on the deterministic in-memory network.

Mirrors the capability of the reference's registry/raft-registry
(openraft-based; network/raft.rs, store/store.rs) with the algorithm
implemented from the public Raft paper. Every test drives logical ticks
explicitly — no wall-clock, no module randomness — so failures replay
bit-for-bit.
"""
import json

import pytest

from feathr_spark.registry.raft import (
    FOLLOWER, LEADER, InMemoryCluster, NotLeader, RaftNode)


def make(n=3, seed=0, **kw):
    return InMemoryCluster([f"n{i}" for i in range(n)], seed=seed, **kw)


# ---------------------------------------------------------------------------
# elections
# ---------------------------------------------------------------------------

def test_elects_exactly_one_leader():
    c = make(3)
    leader = c.run_until_leader()
    c.tick(30)
    leaders = [n for n in c.nodes.values() if n.role == LEADER]
    assert leaders == [leader]
    assert all(n.leader_id == leader.id for n in c.nodes.values())


def test_election_safety_at_most_one_leader_per_term():
    """Across 200 ticks with 30% message loss, no two nodes may ever be
    leader in the same term (Raft's Election Safety property)."""
    c = make(5, seed=3)
    c.drop_fraction = 0.30
    seen = {}  # term -> leader id
    for _ in range(200):
        c.tick()
        for n in c.nodes.values():
            if n.role == LEADER:
                assert seen.setdefault(n.current_term, n.id) == n.id
    assert seen  # at least one election succeeded despite the loss


def test_leader_reelected_after_crash():
    c = make(3)
    first = c.run_until_leader()
    c.crash(first.id)
    second = c.run_until_leader()
    assert second.id != first.id
    assert second.current_term > first.current_term


def test_single_node_cluster_self_elects_and_commits():
    c = make(1)
    leader = c.run_until_leader()
    idx, _ = leader.client_write({"op": "x"})
    assert leader.commit_index >= idx
    assert c.applied["n0"] == [{"op": "x"}]


# ---------------------------------------------------------------------------
# replication
# ---------------------------------------------------------------------------

def test_writes_replicate_in_order_to_all_nodes():
    c = make(3)
    for i in range(5):
        c.write({"op": i})
    want = [{"op": i} for i in range(5)]
    assert all(c.applied[n] == want for n in c.nodes)


def test_client_write_rejected_at_follower_with_hint():
    c = make(3)
    leader = c.run_until_leader()
    c.tick(5)  # let heartbeats propagate leader identity
    follower = next(n for n in c.nodes.values() if n.role == FOLLOWER)
    with pytest.raises(NotLeader) as e:
        follower.client_write({"op": "nope"})
    assert e.value.leader_hint == leader.id


def test_crashed_follower_catches_up_on_restart():
    c = make(3)
    leader = c.run_until_leader()
    behind = next(n for n in c.nodes.values() if n is not leader)
    c.crash(behind.id)
    for i in range(4):
        c.write({"op": i})
    c.restart(behind.id)
    c.tick(30)
    assert c.applied[behind.id] == [{"op": i} for i in range(4)]


def test_divergent_uncommitted_entries_truncated():
    """A leader partitioned away with unreplicated appends must lose them
    when it rejoins: its log is overwritten by the new leader's (§5.3)."""
    c = make(3, seed=1)
    old = c.run_until_leader()
    others = [n.id for n in c.nodes.values() if n is not old]
    c.partition([old.id], others)
    # these can never commit (no majority on old's side)
    old.client_write({"op": "lost-1"})
    old.client_write({"op": "lost-2"})
    # majority side elects and commits its own entries
    for _ in range(500):
        new = c.leader()
        if new is not None and new.id in others:
            break
        c.tick()
    new = c.leader()
    assert new.id in others
    new.client_write({"op": "kept"})
    c.tick(10)
    c.heal()
    c.tick(40)
    want = [{"op": "kept"}]
    assert c.applied[old.id] == want
    assert all(c.applied[n] == want for n in c.nodes)
    # the lost entries are gone from the old leader's log too
    cmds = [e.command.get("data") for e in c.nodes[old.id].log.entries
            if e.command.get("type") == "write"]
    assert {"op": "lost-1"} not in cmds and {"op": "lost-2"} not in cmds


def test_minority_partition_cannot_commit():
    c = make(5, seed=2)
    leader = c.run_until_leader()
    c.tick(5)
    minority = [leader.id,
                next(n.id for n in c.nodes.values() if n is not leader)]
    majority = [n for n in c.nodes if n not in minority]
    c.partition(minority, majority)
    before = leader.commit_index
    idx, _ = leader.client_write({"op": "stuck"})
    c.tick(60)
    assert leader.commit_index == before < idx
    assert all({"op": "stuck"} not in c.applied[n] for n in c.nodes)


def test_stale_leader_steps_down_on_heal():
    c = make(3, seed=4)
    old = c.run_until_leader()
    others = [n.id for n in c.nodes.values() if n is not old]
    c.partition([old.id], others)
    for _ in range(500):
        if any(c.nodes[o].role == LEADER for o in others):
            break
        c.tick()
    c.heal()
    c.tick(30)
    assert old.role != LEADER
    assert c.leader().id in others


# ---------------------------------------------------------------------------
# snapshots + membership
# ---------------------------------------------------------------------------

def test_snapshot_compacts_log_and_new_node_catches_up_via_snapshot():
    c = make(3)
    leader = c.run_until_leader()
    for i in range(8):
        c.write({"op": i})
    leader.take_snapshot(retain=1)
    assert leader.log.start_index > 1  # actually compacted
    fresh = c.add_node("n9")
    leader.add_learner("n9")
    c.tick(40)
    assert c.applied["n9"] == [{"op": i} for i in range(8)]
    # promote: learner -> voter (single-server change)
    leader.change_membership(sorted(leader.voters + ["n9"]))
    c.tick(20)
    assert "n9" in leader.voters and "n9" not in leader.learners
    assert fresh.voters == leader.voters
    # the widened quorum still commits
    c.write({"op": "post"})
    assert c.applied["n9"][-1] == {"op": "post"}


def test_change_membership_rejects_multi_node_jumps_and_strangers():
    c = make(3)
    leader = c.run_until_leader()
    with pytest.raises(ValueError):  # +2 voters at once
        leader.change_membership(sorted(leader.voters + ["x", "y"]))
    with pytest.raises(ValueError):  # not a learner yet
        leader.change_membership(sorted(leader.voters + ["x"]))


def test_removed_voter_no_longer_counts_toward_quorum():
    c = make(3)
    leader = c.run_until_leader()
    c.tick(5)
    gone = next(n.id for n in c.nodes.values() if n is not leader)
    leader.change_membership(sorted(v for v in leader.voters if v != gone))
    c.tick(10)
    assert len(leader.voters) == 2
    # crash the removed node; the 2-voter cluster must still commit
    c.crash(gone)
    idx, _ = leader.client_write({"op": "after-removal"})
    c.tick(10)
    assert leader.commit_index >= idx


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

def test_term_vote_and_log_survive_restart(tmp_path):
    applied = []
    path = str(tmp_path / "raft_n0.json")
    n = RaftNode("n0", ["n0"], applied.append, persist_path=path)
    n.tick()  # single-voter: self-elects immediately on timeout
    for _ in range(30):
        if n.role == LEADER:
            break
        n.tick()
    n.client_write({"op": "persisted"})
    term, last = n.current_term, n.log.last_index()

    reborn_applied = []
    reborn = RaftNode("n0", ["n0"], reborn_applied.append,
                      persist_path=path)
    assert reborn.current_term == term
    assert reborn.log.last_index() == last
    assert reborn.voted_for == "n0"
    # committed state is rebuilt by replaying the log after re-election
    for _ in range(30):
        reborn.tick()
        if reborn.role == LEADER:
            break
    reborn.client_write({"op": "again"})
    assert reborn_applied == [{"op": "persisted"}, {"op": "again"}]


# ---------------------------------------------------------------------------
# randomized safety fuzz
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_nodes,seed", [(3, 11), (5, 12), (5, 13)])
def test_fuzz_applied_logs_never_diverge(n_nodes, seed):
    """The Raft State Machine Safety property under chaos: random message
    loss, random partitions, random leader crashes, writes whenever some
    node claims leadership. After healing, every node must apply the
    SAME command sequence — and at every step, applied logs must be
    prefixes of one another."""
    import random as _r
    rng = _r.Random(seed)
    c = make(n_nodes, seed=seed)
    ids = list(c.nodes)
    wrote = 0
    for step in range(400):
        roll = rng.random()
        if roll < 0.02 and not c.partitions:
            k = rng.randrange(1, n_nodes)
            side = rng.sample(ids, k)
            c.partition(side, [i for i in ids if i not in side])
        elif roll < 0.04:
            c.heal()
        elif roll < 0.06 and len(c.down) < (n_nodes - 1) // 2:
            c.crash(rng.choice([i for i in ids if i not in c.down]))
        elif roll < 0.08 and c.down:
            c.restart(rng.choice(sorted(c.down)))
        elif roll < 0.28:
            l = c.leader()
            if l is not None:
                try:
                    l.client_write({"op": wrote})
                    wrote += 1
                except NotLeader:
                    pass
        c.drop_fraction = 0.15 if rng.random() < 0.5 else 0.0
        c.tick()
        # prefix consistency at every step
        logs = sorted((c.applied[i] for i in ids), key=len)
        for a, b in zip(logs, logs[1:]):
            assert b[:len(a)] == a, f"divergence at step {step}"
    # heal and settle: everyone converges to the same applied sequence
    for i in sorted(c.down):
        c.restart(i)
    c.heal()
    c.tick(150)
    final = c.leader()
    final.client_write({"op": "fin"})
    c.tick(60)
    want = c.applied[final.id]
    assert want[-1] == {"op": "fin"}
    assert all(c.applied[i] == want for i in ids)


def test_fuzz_committed_writes_are_never_lost():
    """Durability: any write whose index commits at the proposing leader
    must appear on every node at the end — even across leader changes."""
    import random as _r
    rng = _r.Random(99)
    c = make(5, seed=99)
    ids = list(c.nodes)
    committed = []
    pending = []  # (leader, index, command)
    k = 0
    for step in range(400):
        roll = rng.random()
        if roll < 0.03 and not c.partitions:
            side = rng.sample(ids, rng.randrange(1, 5))
            c.partition(side, [i for i in ids if i not in side])
        elif roll < 0.06:
            c.heal()
        elif roll < 0.30:
            l = c.leader()
            if l is not None:
                try:
                    cmd = {"op": k}
                    idx, _ = l.client_write(cmd)
                    pending.append((l, idx, cmd))
                    k += 1
                except NotLeader:
                    pass
        c.tick()
        still = []
        for l, idx, cmd in pending:
            # commitment check: the index committed while the proposer
            # was still the leader of that term
            if l.role == LEADER and l.commit_index >= idx:
                committed.append(cmd)
            elif l.role == LEADER:
                still.append((l, idx, cmd))
        pending = still
    c.heal()
    c.tick(150)
    l = c.leader()
    l.client_write({"op": "fin"})
    c.tick(60)
    for i in ids:
        got = c.applied[i]
        for cmd in committed:
            assert cmd in got, f"committed {cmd} lost on {i}"


def test_auto_snapshot_compacts_and_cluster_still_converges():
    """snapshot_every compacts automatically; a follower that was down
    across several compaction cycles rejoins via InstallSnapshot."""
    c = InMemoryCluster(["n0", "n1", "n2"], seed=21)
    for n in c.nodes.values():
        n.snapshot_every, n.snapshot_retain = 5, 2
    leader = c.run_until_leader()
    behind = next(n for n in c.nodes.values() if n is not leader)
    c.crash(behind.id)
    for i in range(20):
        c.write({"op": i})
    assert leader.log.start_index > 1  # auto-compaction actually ran
    c.restart(behind.id)
    c.tick(60)
    assert c.applied[behind.id] == [{"op": i} for i in range(20)]


def test_truncated_config_entry_rolls_back_membership():
    """§6 fallback rule: a config entry applies on APPEND, but if a
    conflicting leader truncates it the node must REVERT to the prior
    configuration — otherwise its quorum arithmetic diverges forever."""
    c = make(3, seed=31)
    old = c.run_until_leader()
    c.tick(5)  # commit the term's noop: config changes require it
    others = [n.id for n in c.nodes.values() if n is not old]
    c.partition([old.id], others)
    # uncommitted single-server removal, only in the stale leader's log
    old.change_membership(sorted(v for v in old.voters if v != others[0]))
    assert len(old.voters) == 2
    for _ in range(500):
        if any(c.nodes[o].role == LEADER for o in others):
            break
        c.tick()
    new = next(c.nodes[o] for o in others if c.nodes[o].role == LEADER)
    new.client_write({"op": "overwrites-config"})
    c.tick(10)
    c.heal()
    c.tick(60)
    # the config entry was truncated by the new leader's log — full
    # 3-voter membership must be restored on the old leader
    assert sorted(old.voters) == ["n0", "n1", "n2"]
    assert all(sorted(n.voters) == ["n0", "n1", "n2"]
               for n in c.nodes.values())
    assert c.applied[old.id][-1] == {"op": "overwrites-config"}


def test_fuzz_with_membership_churn_never_diverges():
    """Chaos + live membership changes: random add-learner/promote/remove
    at the current leader while partitions and drops churn. Applied logs
    must stay prefix-consistent and converge after heal — exercises the
    config-rollback path under real interleavings."""
    import random as _r
    rng = _r.Random(77)
    base = [f"n{i}" for i in range(5)]
    c = make(5, seed=77)
    extra = 0
    wrote = 0
    for step in range(400):
        roll = rng.random()
        l = c.leader()
        try:
            if roll < 0.02 and not c.partitions:
                ids = list(c.nodes)
                side = rng.sample(ids, rng.randrange(1, len(ids)))
                c.partition(side, [i for i in ids if i not in side])
            elif roll < 0.05:
                c.heal()
            elif roll < 0.07 and l is not None and extra < 3:
                nid = f"x{extra}"
                extra += 1
                c.add_node(nid, seed=500 + extra)
                l.add_learner(nid)
            elif roll < 0.09 and l is not None and l.learners:
                cand = l.learners[0]
                if l.match_index.get(cand, 0) >= l.commit_index:
                    l.change_membership(sorted(l.voters + [cand]))
            elif roll < 0.11 and l is not None and len(l.voters) > 3:
                drop = next(v for v in sorted(l.voters) if v != l.id)
                l.change_membership(sorted(
                    v for v in l.voters if v != drop))
            elif roll < 0.30 and l is not None:
                l.client_write({"op": wrote})
                wrote += 1
        except (NotLeader, ValueError):
            pass
        c.drop_fraction = 0.10 if rng.random() < 0.4 else 0.0
        c.tick()
        logs = sorted((c.applied[i] for i in c.applied), key=len)
        for a, b in zip(logs, logs[1:]):
            assert b[:len(a)] == a, f"divergence at step {step}"
    c.heal()
    c.tick(200)
    l = c.leader()
    assert l is not None
    l.client_write({"op": "fin"})
    c.tick(80)
    want = c.applied[l.id]
    assert want[-1] == {"op": "fin"}
    # every node still in the final membership must have converged
    for nid in l.voters:
        assert c.applied[nid] == want, f"{nid} diverged"
