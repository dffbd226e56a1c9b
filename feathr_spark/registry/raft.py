"""Raft consensus for registry metadata HA (SURVEY §2 item 50).

The reference's ``registry/raft-registry`` replicates the registry state
machine across nodes with openraft (store/store.rs: log + full-state
snapshots; network/raft.rs:47-52: the vote/append/snapshot RPC surface;
network/management.rs:172-182: init / add-learner / change-membership /
metrics / request forwarding). This module implements the same
capability natively from the public Raft paper (Ongaro & Ousterhout,
"In Search of an Understandable Consensus Algorithm", USENIX ATC'14):

* leader election with randomized timeouts (§5.2),
* log replication with the AppendEntries consistency check and
  conflict truncation (§5.3),
* the current-term commit guard (§5.4.2, figure 8),
* full-state snapshots + InstallSnapshot for lagging followers (§7),
* single-server membership changes, effective on APPEND (§6; arbitrary
  jumps are rejected — callers step through one voter at a time, which
  is what the reference's client does too),
* learners (non-voting replicas) as the add-learner → promote path.

Design notes (deliberately different from the reference's tokio stack):
the node is a PASSIVE state machine — ``tick()`` advances timers and
RPC handlers are plain synchronous functions returning their response,
so the same core runs under (a) the deterministic in-memory network the
tests drive step-by-step with injected drops/partitions, and (b) the
threaded localhost-HTTP transport in ``raft_http.py``. Nothing here
depends on wall-clock time or module-level randomness: timeouts are
tick counts drawn from a per-node seeded RNG, which makes every safety
test reproducible.

This is control-plane metadata HA only — queries and dataflow never
touch this path (they run on Spark); see SURVEY §2 row 50.
"""
from __future__ import annotations

import json
import random
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple


# --------------------------------------------------------------------------
# Log model
# --------------------------------------------------------------------------

@dataclass
class LogEntry:
    term: int
    index: int
    command: Dict[str, Any]  # {"type": "noop"|"write"|"config", ...}

    def to_json(self) -> Dict[str, Any]:
        return {"term": self.term, "index": self.index,
                "command": self.command}

    @staticmethod
    def from_json(d: Dict[str, Any]) -> "LogEntry":
        return LogEntry(term=d["term"], index=d["index"],
                        command=d["command"])


class NotLeader(Exception):
    """Raised on client_write at a non-leader; carries the best hint."""

    def __init__(self, leader_hint: Optional[str]):
        super().__init__(f"not the leader (hint: {leader_hint})")
        self.leader_hint = leader_hint


class RaftLog:
    """In-memory log with a compaction offset.

    ``entries[0]`` is the entry at index ``start_index``; indices are
    1-based Raft indices (index 0 = the empty-log sentinel with term 0,
    or the snapshot's last-included position after compaction).
    """

    def __init__(self):
        self.entries: List[LogEntry] = []
        self.start_index = 1          # raft index of entries[0]
        self.snap_last_index = 0      # last index covered by snapshot
        self.snap_last_term = 0

    # -- index helpers --------------------------------------------------
    def last_index(self) -> int:
        if self.entries:
            return self.entries[-1].index
        return self.snap_last_index

    def last_term(self) -> int:
        if self.entries:
            return self.entries[-1].term
        return self.snap_last_term

    def term_at(self, index: int) -> Optional[int]:
        """Term of the entry at ``index``; None if unknown (compacted
        away and not the snapshot boundary, or beyond the log)."""
        if index == 0:
            return 0
        if index == self.snap_last_index:
            return self.snap_last_term
        pos = index - self.start_index
        if 0 <= pos < len(self.entries):
            return self.entries[pos].term
        return None

    def entry(self, index: int) -> Optional[LogEntry]:
        pos = index - self.start_index
        if 0 <= pos < len(self.entries):
            return self.entries[pos]
        return None

    def slice_from(self, index: int) -> List[LogEntry]:
        pos = max(0, index - self.start_index)
        return self.entries[pos:]

    # -- mutation -------------------------------------------------------
    def append(self, entry: LogEntry) -> None:
        self.entries.append(entry)

    def truncate_from(self, index: int) -> None:
        """Drop the entry at ``index`` and everything after it."""
        pos = index - self.start_index
        if pos < len(self.entries):
            del self.entries[max(0, pos):]

    def compact(self, upto_index: int) -> None:
        """Discard entries <= upto_index (they live in the snapshot)."""
        if upto_index < self.start_index:
            return
        term = self.term_at(upto_index)
        pos = upto_index - self.start_index + 1
        self.entries = self.entries[pos:]
        self.start_index = upto_index + 1
        self.snap_last_index = upto_index
        if term is not None:
            self.snap_last_term = term


# --------------------------------------------------------------------------
# The node
# --------------------------------------------------------------------------

FOLLOWER, CANDIDATE, LEADER = "follower", "candidate", "leader"


class RaftNode:
    """One Raft participant.

    ``apply_fn(command) -> result`` is the replicated state machine
    (RegistryStateMachine in raft_http.py); it MUST be deterministic —
    every non-deterministic input (entity uuids, timestamps) is fixed at
    propose time inside the command, never generated during apply.

    ``send_fn(dst_id, rpc_name, payload) -> Optional[response]`` is the
    transport: synchronous request/response (HTTP) returns the response
    dict; a message-passing simulation returns None and routes responses
    back via ``handle_*_response``.

    ``snapshot_fn() -> bytes`` / ``restore_fn(bytes)`` serialize the
    state machine for log compaction + InstallSnapshot.
    """

    def __init__(self, node_id: str, voters: List[str],
                 apply_fn: Callable[[Dict[str, Any]], Any],
                 send_fn=None,
                 snapshot_fn: Optional[Callable[[], bytes]] = None,
                 restore_fn: Optional[Callable[[bytes], None]] = None,
                 election_ticks: Tuple[int, int] = (10, 20),
                 heartbeat_ticks: int = 3,
                 seed: int = 0,
                 persist_path: Optional[str] = None,
                 snapshot_every: int = 0,
                 snapshot_retain: int = 8):
        self.id = node_id
        self.voters = list(voters)        # current voting membership
        self.learners: List[str] = []     # replicated to, never vote
        self.apply_fn = apply_fn
        self.send_fn = send_fn or (lambda dst, rpc, payload: None)
        self.snapshot_fn = snapshot_fn
        self.restore_fn = restore_fn
        self.persist_path = persist_path

        # persistent state (§5.1)
        self.current_term = 0
        self.voted_for: Optional[str] = None
        self.log = RaftLog()
        # configuration history: (log index, voters, learners) for every
        # config in effect, oldest first. Config entries apply on APPEND
        # (§6), so when a conflicting leader TRUNCATES an uncommitted
        # config entry the node must FALL BACK to the previous
        # configuration — without this history the deposed config would
        # stick forever and quorum arithmetic would silently diverge.
        self._config_log: List[Tuple[int, List[str], List[str]]] = [
            (0, list(voters), [])]

        # volatile
        self.role = FOLLOWER
        self.commit_index = 0
        self.last_applied = 0
        self.leader_id: Optional[str] = None
        self.next_index: Dict[str, int] = {}
        self.match_index: Dict[str, int] = {}
        self.votes_got: set = set()
        self.apply_results: Dict[int, Any] = {}  # index -> result (leader)

        # zlib.crc32, not hash(): str hash is randomized per process
        # (PYTHONHASHSEED), which would make "deterministic" tests flip
        # between pytest invocations
        import zlib
        self._rng = random.Random(seed ^ (zlib.crc32(node_id.encode())
                                          & 0xFFFF))
        self.election_ticks = election_ticks
        self.heartbeat_ticks = heartbeat_ticks
        self._ticks_since_heard = 0
        self._ticks_since_heartbeat = 0
        self._timeout = self._rng.randint(*election_ticks)
        self.lock = threading.RLock()
        self._snapshot_blob: Optional[bytes] = None
        self._snapshot_meta: Optional[Tuple[int, int]] = None
        # auto-compaction policy (the reference's openraft config does
        # this; 0 = manual take_snapshot() only): snapshot + compact
        # after every `snapshot_every` applies, keeping
        # `snapshot_retain` trailing entries so slow-but-connected
        # followers catch up by append instead of full InstallSnapshot
        self.snapshot_every = snapshot_every
        self.snapshot_retain = snapshot_retain
        self._load_persisted()

    # -- persistence (term/vote/log survive restarts, §5.1) -------------
    # The whole log is rewritten per mutation (atomic tmp+rename) — an
    # O(log-size) cost that is deliberate: registry metadata writes are
    # low-rate (human-scale project/feature registrations), and the
    # auto-snapshot policy keeps the file bounded at snapshot_every +
    # snapshot_retain entries + one state blob. A WAL would only pay
    # off at write rates this state machine never sees.
    def _persist(self) -> None:
        if not self.persist_path:
            return
        import base64
        blob = {
            "current_term": self.current_term,
            "voted_for": self.voted_for,
            "voters": self.voters,
            "learners": self.learners,
            "start_index": self.log.start_index,
            "snap_last_index": self.log.snap_last_index,
            "snap_last_term": self.log.snap_last_term,
            "entries": [e.to_json() for e in self.log.entries],
            "config_log": [[i, v, l] for i, v, l in self._config_log],
            # snapshot travels with the log: after compaction the tail
            # alone cannot rebuild the state machine on restart
            "snapshot": (base64.b64encode(self._snapshot_blob).decode()
                         if self._snapshot_blob is not None else None),
            "snapshot_meta": list(self._snapshot_meta)
            if self._snapshot_meta else None,
        }
        tmp = self.persist_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(blob, f)
        import os
        os.replace(tmp, self.persist_path)

    def _load_persisted(self) -> None:
        if not self.persist_path:
            return
        import base64
        import os
        if not os.path.exists(self.persist_path):
            return
        with open(self.persist_path) as f:
            blob = json.load(f)
        self.current_term = blob["current_term"]
        self.voted_for = blob["voted_for"]
        self.voters = blob["voters"]
        self.learners = blob.get("learners", [])
        self.log.start_index = blob["start_index"]
        self.log.snap_last_index = blob["snap_last_index"]
        self.log.snap_last_term = blob["snap_last_term"]
        self.log.entries = [LogEntry.from_json(e) for e in blob["entries"]]
        if blob.get("config_log"):
            self._config_log = [(i, list(v), list(l))
                                for i, v, l in blob["config_log"]]
        snap = blob.get("snapshot")
        if snap is not None:
            self._snapshot_blob = base64.b64decode(snap)
            meta = blob.get("snapshot_meta")
            self._snapshot_meta = tuple(meta) if meta else None
            if self.restore_fn is not None and self._snapshot_meta:
                # rebuild the state machine: restore the snapshot, then
                # committed tail entries re-apply once the commit index
                # is rediscovered from the leader (Raft never persists
                # commit_index; §5.3's replay covers the gap)
                self.restore_fn(self._snapshot_blob)
                self.commit_index = self._snapshot_meta[0]
                self.last_applied = self._snapshot_meta[0]

    # -- membership helpers ---------------------------------------------
    def _peers(self) -> List[str]:
        """Everyone replication reaches (voters + learners, minus me)."""
        return [p for p in dict.fromkeys(self.voters + self.learners)
                if p != self.id]

    def _majority(self) -> int:
        return len(self.voters) // 2 + 1

    def is_leader(self) -> bool:
        return self.role == LEADER

    # -- timers ----------------------------------------------------------
    def tick(self) -> None:
        """Advance one logical clock step. Followers/candidates count
        toward an election timeout; leaders count toward heartbeats."""
        with self.lock:
            if self.role == LEADER:
                self._ticks_since_heartbeat += 1
                if self._ticks_since_heartbeat >= self.heartbeat_ticks:
                    self._ticks_since_heartbeat = 0
                    self._broadcast_append()
                return
            self._ticks_since_heard += 1
            # a node outside the voter set never self-elects (learner)
            if (self._ticks_since_heard >= self._timeout
                    and self.id in self.voters):
                self._start_election()

    def _reset_election_timer(self) -> None:
        self._ticks_since_heard = 0
        self._timeout = self._rng.randint(*self.election_ticks)

    # -- elections (§5.2) -------------------------------------------------
    def _start_election(self) -> None:
        self.role = CANDIDATE
        self.current_term += 1
        self.voted_for = self.id
        self.votes_got = {self.id}
        self.leader_id = None
        self._persist()
        self._reset_election_timer()
        if self._majority() == 1:
            self._become_leader()
            return
        req = {
            "term": self.current_term,
            "candidate_id": self.id,
            "last_log_index": self.log.last_index(),
            "last_log_term": self.log.last_term(),
        }
        for p in [v for v in self.voters if v != self.id]:
            if self.role != CANDIDATE:  # a response resolved the race
                return
            resp = self.send_fn(p, "vote", dict(req))
            if resp is not None:
                self.handle_vote_response(p, resp)

    def handle_vote(self, req: Dict[str, Any]) -> Dict[str, Any]:
        with self.lock:
            # §6 disruption guard (thesis §4.2.3): a server REMOVED from
            # the membership never learns it (the leader stops
            # replicating to it the moment the config entry appends), so
            # it times out and campaigns forever at ever-higher terms.
            # While we believe a current leader exists — we ARE it, or
            # we heard from it within the MINIMUM election timeout —
            # disregard the RequestVote entirely (term untouched), so
            # the deposed server cannot dethrone a live leader. A
            # genuinely newer leader still wins instantly: AppendEntries
            # at a higher term is always honored.
            if req["term"] > self.current_term and (
                    self.role == LEADER
                    or (self.leader_id is not None
                        and self._ticks_since_heard
                        < self.election_ticks[0])):
                return {"term": self.current_term, "vote_granted": False}
            if req["term"] > self.current_term:
                self._step_down(req["term"])
            granted = False
            if req["term"] == self.current_term and \
                    self.voted_for in (None, req["candidate_id"]):
                # §5.4.1 up-to-date check
                up_to_date = (
                    req["last_log_term"] > self.log.last_term()
                    or (req["last_log_term"] == self.log.last_term()
                        and req["last_log_index"] >= self.log.last_index()))
                if up_to_date:
                    granted = True
                    self.voted_for = req["candidate_id"]
                    self._persist()
                    self._reset_election_timer()
            return {"term": self.current_term, "vote_granted": granted}

    def handle_vote_response(self, src: str, resp: Dict[str, Any]) -> None:
        with self.lock:
            if resp["term"] > self.current_term:
                self._step_down(resp["term"])
                return
            if self.role != CANDIDATE or resp["term"] < self.current_term:
                return
            if resp.get("vote_granted"):
                self.votes_got.add(src)
                if len(self.votes_got) >= self._majority():
                    self._become_leader()

    def _become_leader(self) -> None:
        self.role = LEADER
        self.leader_id = self.id
        nxt = self.log.last_index() + 1
        self.next_index = {p: nxt for p in self._peers()}
        self.match_index = {p: 0 for p in self._peers()}
        # §8: commit a noop from the new term so earlier-term entries
        # become committable through the current-term guard
        self._append_local({"type": "noop"})
        self._broadcast_append()

    def _step_down(self, term: int) -> None:
        if term > self.current_term:
            self.current_term = term
            self.voted_for = None
            self._persist()
        self.role = FOLLOWER
        self.votes_got = set()
        self._reset_election_timer()

    # -- replication (§5.3) -----------------------------------------------
    def _append_local(self, command: Dict[str, Any]) -> LogEntry:
        e = LogEntry(term=self.current_term,
                     index=self.log.last_index() + 1, command=command)
        self.log.append(e)
        if command.get("type") == "config":
            self._apply_config(command)  # effective on APPEND (§6)
        self._persist()
        if self._majority() == 1 and not self._peers():
            self._advance_commit()
        return e

    def client_write(self, command: Dict[str, Any]) -> Tuple[int, int]:
        """Propose a state-machine command; returns (index, term). The
        caller polls ``result(index)`` / ``commit_index`` for completion
        (the HTTP layer does this with a bounded wait)."""
        with self.lock:
            if self.role != LEADER:
                raise NotLeader(self.leader_id)
            e = self._append_local({"type": "write", "data": command})
            self._broadcast_append()
            return e.index, e.term

    def _append_args_for(self, peer: str) -> Optional[Dict[str, Any]]:
        nxt = self.next_index.get(peer, self.log.last_index() + 1)
        prev = nxt - 1
        prev_term = self.log.term_at(prev)
        if prev_term is None:
            return None  # compacted past nxt -> needs a snapshot
        return {
            "term": self.current_term,
            "leader_id": self.id,
            "prev_log_index": prev,
            "prev_log_term": prev_term,
            "entries": [e.to_json() for e in self.log.slice_from(nxt)],
            "leader_commit": self.commit_index,
        }

    def _broadcast_append(self) -> None:
        for p in self._peers():
            # a synchronous response can depose us MID-LOOP (higher-term
            # reply -> _step_down bumps current_term). Without this
            # guard the next iteration would build an AppendEntries
            # carrying the NEW term — a term this node never won — and
            # the legitimate leader of that term would accept it as its
            # own, truncating committed entries (found by the fuzz
            # harness, seed 11: the stale minority leader deposed the
            # real one on heal).
            if self.role != LEADER:
                return
            args = self._append_args_for(p)
            if args is None:
                self._send_snapshot(p)
                continue
            resp = self.send_fn(p, "append", args)
            if resp is not None:
                self.handle_append_response(
                    p, resp, sent_upto=args["prev_log_index"]
                    + len(args["entries"]))

    def handle_append(self, req: Dict[str, Any]) -> Dict[str, Any]:
        with self.lock:
            if req["term"] > self.current_term:
                self._step_down(req["term"])
            if req["term"] < self.current_term:
                return {"term": self.current_term, "success": False}
            # Election Safety: there is at most one leader per term and
            # it is us — an equal-term AppendEntries at a LEADER is
            # forged/corrupt by definition and must be REJECTED, never
            # honored (defense-in-depth for the mid-broadcast term-bump
            # class fixed in _broadcast_append). A CANDIDATE at the
            # same term, by contrast, just lost the race: step down.
            if self.role == LEADER:
                return {"term": self.current_term, "success": False}
            if self.role == CANDIDATE:
                self._step_down(req["term"])
            self.leader_id = req["leader_id"]
            self._reset_election_timer()

            prev_i, prev_t = req["prev_log_index"], req["prev_log_term"]
            local_term = self.log.term_at(prev_i)
            if prev_i > 0 and local_term != prev_t:
                # consistency check failed; help the leader back up fast
                # (the conflict-term optimization from §5.3)
                hint = min(prev_i, self.log.last_index() + 1)
                if local_term is not None:
                    while hint > self.log.start_index and \
                            self.log.term_at(hint - 1) == local_term:
                        hint -= 1
                return {"term": self.current_term, "success": False,
                        "conflict_index": hint}

            changed = False
            for ej in req["entries"]:
                e = LogEntry.from_json(ej)
                existing_term = self.log.term_at(e.index)
                if existing_term is None and \
                        e.index <= self.log.snap_last_index:
                    continue  # already in the snapshot
                if existing_term is not None and existing_term != e.term:
                    self.log.truncate_from(e.index)
                    self._rollback_config(e.index)
                    existing_term = None
                if existing_term is None:
                    self.log.append(e)
                    if e.command.get("type") == "config":
                        self._apply_config(e.command, e.index)
                    changed = True
            if changed:
                self._persist()

            if req["leader_commit"] > self.commit_index:
                # min with the last entry THIS RPC verified (prev +
                # entries), NOT our last_index(): the log may carry an
                # unverified stale suffix from an older term beyond the
                # match point, and last_index() would commit it (figure
                # 2's "index of last new entry", the one rule in
                # AppendEntries that is about safety, not progress)
                verified = req["prev_log_index"] + len(req["entries"])
                new_commit = min(req["leader_commit"], verified)
                if new_commit > self.commit_index:
                    self.commit_index = new_commit
                    self._apply_committed()
            return {"term": self.current_term, "success": True,
                    "match_index": prev_i + len(req["entries"])}

    def handle_append_response(self, src: str, resp: Dict[str, Any],
                               sent_upto: int) -> None:
        with self.lock:
            if resp["term"] > self.current_term:
                self._step_down(resp["term"])
                return
            if self.role != LEADER:
                return
            if resp.get("success"):
                self.match_index[src] = max(
                    self.match_index.get(src, 0),
                    resp.get("match_index", sent_upto))
                self.next_index[src] = self.match_index[src] + 1
                self._advance_commit()
            else:
                ci = resp.get("conflict_index",
                              self.next_index.get(src, 1) - 1)
                if ci < self.log.start_index:
                    # the follower needs entries we compacted away —
                    # only the snapshot can bridge the gap (§7)
                    self.next_index[src] = self.log.start_index
                    self._send_snapshot(src)
                else:
                    self.next_index[src] = ci

    def _advance_commit(self) -> None:
        """§5.4.2: only entries of the CURRENT term commit by counting."""
        for n in range(self.log.last_index(), self.commit_index, -1):
            if self.log.term_at(n) != self.current_term:
                break
            votes = 1 if self.id in self.voters else 0
            votes += sum(1 for p in self.voters
                         if p != self.id and self.match_index.get(p, 0) >= n)
            if votes >= self._majority():
                self.commit_index = n
                self._apply_committed()
                break

    def _apply_committed(self) -> None:
        while self.last_applied < self.commit_index:
            self.last_applied += 1
            e = self.log.entry(self.last_applied)
            if e is None:  # inside snapshot; state already restored
                continue
            if e.command.get("type") == "write":
                result = self.apply_fn(e.command["data"])
                if self.role == LEADER:
                    self.apply_results[e.index] = result
        if (self.snapshot_every and self.snapshot_fn is not None
                and self.last_applied - self.log.snap_last_index
                >= self.snapshot_every):
            self.take_snapshot(retain=self.snapshot_retain)

    def result(self, index: int) -> Any:
        return self.apply_results.get(index)

    # -- snapshots (§7) ----------------------------------------------------
    def take_snapshot(self, retain: int = 0) -> None:
        """Snapshot the state machine at last_applied and compact the log
        (keeping ``retain`` trailing entries for slow followers).

        The snapshot METADATA is pinned at last_applied — the state the
        blob actually contains — independent of the compaction point;
        advertising the compaction point instead would make followers
        re-apply the retained entries on top of state that already
        includes them (double-apply)."""
        with self.lock:
            if self.snapshot_fn is None or self.last_applied == 0:
                return
            term = self.log.term_at(self.last_applied)
            if term is None:
                term = self.log.snap_last_term
            self._snapshot_blob = self.snapshot_fn()
            self._snapshot_meta = (self.last_applied, term)
            self.log.compact(max(self.log.snap_last_index,
                                 self.last_applied - retain))
            self._persist()  # the compacted log alone can't rebuild
            # state on restart; the file must carry the snapshot too

    def _send_snapshot(self, peer: str) -> None:
        if self._snapshot_blob is None:
            return
        meta = self._snapshot_meta or (self.log.snap_last_index,
                                       self.log.snap_last_term)
        req = {
            "term": self.current_term,
            "leader_id": self.id,
            "last_included_index": meta[0],
            "last_included_term": meta[1],
            "data": self._snapshot_blob.decode("utf-8"),
            "voters": self.voters,
            "learners": self.learners,
        }
        resp = self.send_fn(peer, "snapshot", req)
        if resp is not None:
            self.handle_snapshot_response(peer, resp)

    def handle_snapshot(self, req: Dict[str, Any]) -> Dict[str, Any]:
        with self.lock:
            if req["term"] > self.current_term:
                self._step_down(req["term"])
            if req["term"] < self.current_term or self.role == LEADER:
                return {"term": self.current_term, "success": False}
            if self.role == CANDIDATE:
                self._step_down(req["term"])
            self.leader_id = req["leader_id"]
            self._reset_election_timer()
            idx, term = req["last_included_index"], req["last_included_term"]
            if idx <= self.log.snap_last_index:
                return {"term": self.current_term, "success": True,
                        "match_index": self.log.snap_last_index}
            if self.restore_fn is not None:
                self.restore_fn(req["data"].encode("utf-8"))
            self._snapshot_blob = req["data"].encode("utf-8")
            self._snapshot_meta = (idx, term)
            # keep any log suffix that extends past the snapshot and
            # matches it; otherwise clear
            if self.log.term_at(idx) == term:
                self.log.compact(idx)
            else:
                self.log.entries = []
                self.log.start_index = idx + 1
                self.log.snap_last_index = idx
                self.log.snap_last_term = term
            self.voters = list(req.get("voters", self.voters))
            self.learners = list(req.get("learners", self.learners))
            # the snapshot's config is committed by definition — it
            # becomes the new rollback floor
            self._config_log = [(idx, list(self.voters),
                                 list(self.learners))]
            self.commit_index = max(self.commit_index, idx)
            self.last_applied = max(self.last_applied, idx)
            self._persist()
            return {"term": self.current_term, "success": True,
                    "match_index": idx}

    def handle_snapshot_response(self, src: str,
                                 resp: Dict[str, Any]) -> None:
        with self.lock:
            if resp["term"] > self.current_term:
                self._step_down(resp["term"])
                return
            if self.role != LEADER or not resp.get("success"):
                return
            self.match_index[src] = max(self.match_index.get(src, 0),
                                        resp["match_index"])
            self.next_index[src] = self.match_index[src] + 1

    # -- membership (§6: single-server changes, effective on append) -------
    def _apply_config(self, command: Dict[str, Any],
                      index: Optional[int] = None) -> None:
        self.voters = list(command["voters"])
        self.learners = list(command.get("learners", []))
        self._config_log.append(
            (index if index is not None else self.log.last_index(),
             list(self.voters), list(self.learners)))
        if self.role == LEADER:
            for p in self._peers():
                self.next_index.setdefault(p, self.log.last_index() + 1)
                self.match_index.setdefault(p, 0)
            if self.id not in self.voters:
                # removed leader finishes replicating then steps down;
                # simplest safe behavior: step down now
                self._step_down(self.current_term)

    def _rollback_config(self, from_index: int) -> None:
        """Truncation dropped entries >= from_index: any configuration
        they introduced is void — revert to the latest surviving one."""
        while len(self._config_log) > 1 and \
                self._config_log[-1][0] >= from_index:
            self._config_log.pop()
        _, self.voters, self.learners = self._config_log[-1]
        self.voters, self.learners = list(self.voters), list(self.learners)

    def _check_config_change_allowed(self) -> None:
        """Thesis §4.1 safety preconditions for single-server changes:
        (a) the PREVIOUS config entry must be committed before a new one
        may be appended — two in-flight changes compose into a
        multi-server jump whose old and new quorums need not overlap
        (the exact scenario the membership-churn fuzz caught at seed
        26: {remove A} then {remove B} uncommitted let a deposed voter
        form an old-config quorum disjoint from the new-config quorum
        and overwrite committed entries); and (b) the leader must have
        committed an entry in ITS OWN term (the post-election noop), so
        the config chains onto a committed prefix."""
        if self._config_log[-1][0] > self.commit_index:
            raise ValueError(
                "previous membership change is not committed yet")
        if self.log.term_at(self.commit_index) != self.current_term:
            raise ValueError(
                "leader has not committed an entry in its term yet")

    def add_learner(self, node_id: str) -> Tuple[int, int]:
        """Start replicating to ``node_id`` without a vote (the
        catch-up phase of the reference's add-learner endpoint)."""
        with self.lock:
            if self.role != LEADER:
                raise NotLeader(self.leader_id)
            if node_id in self.voters or node_id in self.learners:
                return self.log.last_index(), self.current_term
            self._check_config_change_allowed()
            cmd = {"type": "config", "voters": list(self.voters),
                   "learners": list(self.learners) + [node_id]}
            e = self._append_local(cmd)
            self._broadcast_append()
            return e.index, e.term

    def change_membership(self, new_voters: List[str]) -> Tuple[int, int]:
        """Single-server membership change: the new voter set must
        differ from the current one by EXACTLY one node (add or remove);
        an added voter must already be a learner (caught up). Arbitrary
        jumps raise ValueError — step through one change at a time."""
        with self.lock:
            if self.role != LEADER:
                raise NotLeader(self.leader_id)
            self._check_config_change_allowed()
            old, new = set(self.voters), set(new_voters)
            added, removed = new - old, old - new
            if len(added) + len(removed) != 1:
                raise ValueError(
                    "membership must change by exactly one voter per step "
                    f"(got +{sorted(added)} -{sorted(removed)})")
            if added and next(iter(added)) not in self.learners:
                raise ValueError("new voter must be added as a learner "
                                 "and caught up first")
            learners = [l for l in self.learners if l not in new]
            cmd = {"type": "config", "voters": sorted(new),
                   "learners": learners}
            e = self._append_local(cmd)
            self._broadcast_append()
            return e.index, e.term

    # -- introspection ------------------------------------------------------
    def metrics(self) -> Dict[str, Any]:
        with self.lock:
            return {
                "id": self.id,
                "state": self.role,
                "current_term": self.current_term,
                "current_leader": self.leader_id,
                "last_log_index": self.log.last_index(),
                "commit_index": self.commit_index,
                "last_applied": self.last_applied,
                "membership": {"voters": list(self.voters),
                               "learners": list(self.learners)},
            }


# --------------------------------------------------------------------------
# Deterministic in-memory network for the safety tests
# --------------------------------------------------------------------------

class InMemoryCluster:
    """Synchronous-RPC test harness: ``send_fn`` routes directly to the
    destination node's handler and returns its response, unless a drop
    rule or partition eats the message. Time is advanced explicitly with
    ``tick()`` — fully deterministic for a given seed."""

    def __init__(self, node_ids: List[str], apply_factory=None, seed=0,
                 election_ticks=(10, 20), heartbeat_ticks=3):
        self.partitions: List[set] = []     # list of isolated groups
        self.down: set = set()
        self.drop_fraction = 0.0
        self._rng = random.Random(seed)
        self.applied: Dict[str, List[Any]] = {n: [] for n in node_ids}
        self.nodes: Dict[str, RaftNode] = {}
        for i, n in enumerate(node_ids):
            apply_fn = (apply_factory(n) if apply_factory
                        else self._default_apply(n))
            self.nodes[n] = RaftNode(
                n, list(node_ids), apply_fn,
                send_fn=self._make_send(n),
                snapshot_fn=self._make_snap(n),
                restore_fn=self._make_restore(n),
                election_ticks=election_ticks,
                heartbeat_ticks=heartbeat_ticks,
                seed=seed + i * 7919)

    def _default_apply(self, node_id):
        def apply_fn(cmd):
            self.applied[node_id].append(cmd)
            return {"ok": True, "n": len(self.applied[node_id])}
        return apply_fn

    def _make_snap(self, node_id):
        def snap():
            return json.dumps(self.applied[node_id]).encode()
        return snap

    def _make_restore(self, node_id):
        def restore(blob: bytes):
            self.applied[node_id] = json.loads(blob.decode())
        return restore

    def _reachable(self, a: str, b: str) -> bool:
        if a in self.down or b in self.down:
            return False
        for group in self.partitions:
            if (a in group) != (b in group):
                return False
        return True

    def _make_send(self, src: str):
        def send(dst: str, rpc: str, payload: Dict[str, Any]):
            if dst not in self.nodes or not self._reachable(src, dst):
                return None
            if self.drop_fraction and self._rng.random() < self.drop_fraction:
                return None
            handler = {"vote": self.nodes[dst].handle_vote,
                       "append": self.nodes[dst].handle_append,
                       "snapshot": self.nodes[dst].handle_snapshot}[rpc]
            resp = handler(payload)
            # response can be dropped independently (asymmetric loss)
            if self.drop_fraction and self._rng.random() < self.drop_fraction:
                return None
            return resp
        return send

    # -- test controls ----------------------------------------------------
    def tick(self, n: int = 1) -> None:
        for _ in range(n):
            for node in self.nodes.values():
                if node.id not in self.down:  # a crashed process is OFF
                    node.tick()

    def leader(self) -> Optional[RaftNode]:
        leaders = [n for n in self.nodes.values()
                   if n.role == LEADER and n.id not in self.down]
        # with partitions there can be a stale leader; prefer the one
        # with the highest term (the only one that can commit)
        return max(leaders, key=lambda n: n.current_term) if leaders else None

    def run_until_leader(self, max_ticks: int = 500) -> RaftNode:
        for _ in range(max_ticks):
            l = self.leader()
            if l is not None:
                return l
            self.tick()
        raise AssertionError("no leader elected")

    def write(self, command: Dict[str, Any], settle: int = 10):
        l = self.run_until_leader()
        idx, term = l.client_write(command)
        self.tick(settle)
        return idx, term

    def partition(self, *groups: List[str]) -> None:
        self.partitions = [set(g) for g in groups]

    def heal(self) -> None:
        self.partitions = []
        self.drop_fraction = 0.0

    def crash(self, node_id: str) -> None:
        self.down.add(node_id)

    def restart(self, node_id: str) -> None:
        self.down.discard(node_id)

    def add_node(self, node_id: str, seed: int = 104729) -> RaftNode:
        """Create a fresh, empty node (not yet a voter anywhere): the
        add-learner → catch up → change-membership flow starts here."""
        voters = (self.leader() or next(iter(self.nodes.values()))).voters
        self.applied[node_id] = []
        node = RaftNode(
            node_id, list(voters), self._default_apply(node_id),
            send_fn=self._make_send(node_id),
            snapshot_fn=self._make_snap(node_id),
            restore_fn=self._make_restore(node_id),
            election_ticks=self.nodes[next(iter(self.nodes))].election_ticks,
            heartbeat_ticks=3, seed=seed)
        self.nodes[node_id] = node
        return node
