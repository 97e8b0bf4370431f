"""Fleet termination hardening (round-3 verdict #8 + ADVICE orphan guard):

- seeded fuzz over randomized post-STOP drain/export/consume schedules — the
  coordinator must never write EXIT while drops are unconsumed or a worker
  is un-ready, and must always terminate once the fleet is truly quiescent;
- randomized worker-death schedules — coordinate must release survivors
  (EXIT) and raise;
- the phase-2 orphan guard — a worker whose coordinator heartbeat goes
  stale (or never appears) must error out instead of hanging forever.

Pure status-file simulation, no Spark sessions.
"""

import json
import os
import random
import threading
import time

import pytest

from spiderman_spark.plans import fleet

N_SCHEDULES = 12
N_KILL_SCHEDULES = 8


def _put(fd, w, **kw):
    base = {
        "worker": w, "rounds": 1, "fetched": 5, "idle": 3,
        "consumed": 0, "exported": 0, "ready": False,
    }
    base.update(kw)
    tmp = os.path.join(fd, "status", f"w{w}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(base, fh)
    os.replace(tmp, os.path.join(fd, "status", f"w{w}.json"))


def _wait_for(path, timeout=20.0):
    t0 = time.monotonic()
    while not os.path.exists(path):
        assert time.monotonic() - t0 < timeout, f"timed out waiting for {path}"
        time.sleep(0.02)


def test_orphan_check_unit(tmp_path):
    fd = str(tmp_path)
    # no heartbeat: bounded by the wait itself
    fleet._orphan_check(fd, waited_s=1.0, orphan_timeout_s=10.0)
    with pytest.raises(RuntimeError, match="never appeared"):
        fleet._orphan_check(fd, waited_s=11.0, orphan_timeout_s=10.0)
    # fresh heartbeat: fine even after a long wait
    hb = os.path.join(fd, "HEARTBEAT")
    open(hb, "w").close()
    fleet._orphan_check(fd, waited_s=9999.0, orphan_timeout_s=10.0)
    # stale heartbeat: coordinator died between STOP and EXIT
    old = time.time() - 100.0
    os.utime(hb, (old, old))
    with pytest.raises(RuntimeError, match="stale"):
        fleet._orphan_check(fd, waited_s=0.0, orphan_timeout_s=10.0)


@pytest.mark.parametrize("seed", range(N_SCHEDULES))
def test_coordinate_fuzz_random_drain_schedules(tmp_path, monkeypatch, seed):
    """Random post-STOP handoff churn: exports appear, peers consume them
    after random delays, ready flags flap with the drains.  EXIT must only
    appear after the LAST balancing write, and the fleet must terminate."""
    monkeypatch.setattr(fleet, "STATUS_POLL_S", 0.04)
    rng = random.Random(seed)
    fd = str(tmp_path)
    os.makedirs(os.path.join(fd, "status"))
    W = rng.randint(2, 4)
    state = {w: {"exported": 0, "consumed": 0, "rounds": 1} for w in range(W)}
    readiness = {w: False for w in range(W)}
    last_invalid = [time.time()]  # last wall time the fleet was NOT exitable

    def put(w, ready):
        _put(fd, w, ready=ready, **state[w])
        readiness[w] = ready
        balanced = sum(s["exported"] for s in state.values()) == sum(
            s["consumed"] for s in state.values()
        )
        if not (balanced and all(readiness.values())):
            last_invalid[0] = time.time()

    # pre-STOP: stagger workers into idleness, with some still-busy flaps
    for w in range(W):
        if rng.random() < 0.4:
            _put(fd, w, idle=0, rounds=0)
    for w in range(W):
        put(w, ready=False)
        time.sleep(rng.random() * 0.05)
    t = threading.Thread(target=fleet.coordinate, args=(fd, W), daemon=True)
    t.start()
    stop, exit_ = os.path.join(fd, "STOP"), os.path.join(fd, "EXIT")
    _wait_for(stop)

    # post-STOP churn: a random number of export→(delayed)consume episodes.
    # If the coordinator already confirmed a genuinely-quiescent snapshot
    # (balanced, all ready across two polls), EXIT is legitimate — real
    # workers would have exited, so stop churning.
    for _ in range(rng.randint(1, 4)):
        if os.path.exists(exit_):
            break
        exporter = rng.randrange(W)
        consumer = rng.randrange(W)
        k = rng.randint(1, 3)
        state[exporter]["exported"] += k
        put(exporter, ready=True)
        for w in range(W):
            if w != exporter and rng.random() < 0.7:
                put(w, ready=True)
        if rng.random() < 0.5:
            # hold the imbalance across several polls: EXIT must not appear
            time.sleep(0.25)
            assert not os.path.exists(exit_), (
                f"seed {seed}: EXIT written while {k} drops unconsumed"
            )
        state[consumer]["consumed"] += k
        state[consumer]["rounds"] += 1  # a drain bumps the round counter
        put(consumer, ready=True)
        time.sleep(rng.random() * 0.1)

    # final quiescent state: everyone ready, balanced
    for w in range(W):
        put(w, ready=True)
    t.join(timeout=20)
    assert not t.is_alive(), f"seed {seed}: coordinator did not terminate"
    assert os.path.exists(exit_)
    assert os.path.getmtime(exit_) >= last_invalid[0] - 0.02, (
        f"seed {seed}: EXIT predates the last imbalanced/un-ready state"
    )
    sts = fleet._statuses(fd, W)
    assert all(s["ready"] for s in sts)
    assert sum(s["exported"] for s in sts) == sum(s["consumed"] for s in sts)


class _FakeProc:
    def __init__(self):
        self.returncode = None
        self.terminated = False

    def poll(self):
        return self.returncode

    def terminate(self):
        self.terminated = True


@pytest.mark.parametrize("seed", range(N_KILL_SCHEDULES))
def test_coordinate_fuzz_worker_death(tmp_path, monkeypatch, seed):
    """A worker process dying at a random point (before or after STOP) must
    make coordinate release the survivors via EXIT, terminate them, and
    raise — never hang."""
    monkeypatch.setattr(fleet, "STATUS_POLL_S", 0.04)
    rng = random.Random(1000 + seed)
    fd = str(tmp_path)
    os.makedirs(os.path.join(fd, "status"))
    W = rng.randint(2, 3)
    procs = [_FakeProc() for _ in range(W)]
    victim = rng.randrange(W)
    die_after_stop = rng.random() < 0.5

    caught: list = []

    def run():
        try:
            fleet.coordinate(fd, W, procs=procs)
        except RuntimeError as exc:
            caught.append(exc)

    # statuses that never go ready → without the death, phase 2 would spin
    for w in range(W):
        _put(fd, w, ready=False)
    t = threading.Thread(target=run, daemon=True)
    t.start()
    if die_after_stop:
        _wait_for(os.path.join(fd, "STOP"))
    time.sleep(rng.random() * 0.2)
    procs[victim].returncode = 1
    t.join(timeout=20)
    assert not t.is_alive(), f"seed {seed}: coordinate hung after worker death"
    assert caught and "exited early" in str(caught[0])
    assert os.path.exists(os.path.join(fd, "EXIT"))  # survivors released
    assert all(p.terminated for i, p in enumerate(procs) if i != victim)


def test_coordinate_writes_heartbeat(tmp_path, monkeypatch):
    """The phase-2 orphan guard depends on the coordinator's heartbeat —
    assert coordinate actually refreshes it while polling."""
    monkeypatch.setattr(fleet, "STATUS_POLL_S", 0.04)
    fd = str(tmp_path)
    os.makedirs(os.path.join(fd, "status"))
    _put(fd, 0, ready=False)
    t = threading.Thread(target=fleet.coordinate, args=(fd, 1), daemon=True)
    t.start()
    hb = os.path.join(fd, "HEARTBEAT")
    _wait_for(hb)
    m1 = os.path.getmtime(hb)
    time.sleep(0.3)
    m2 = os.path.getmtime(hb)
    assert m2 > m1, "heartbeat not refreshed"
    _put(fd, 0, ready=True)
    t.join(timeout=20)
    assert not t.is_alive()
