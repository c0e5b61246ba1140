"""Object-store lease-mutex crash recovery + fencing (VERDICT r12 #1).

The lease-break path (``ObjectStoreCommitStore.mutex``) was round 12's
only untested code path.  These tests pin:

- a holder SIGKILLed INSIDE the critical section (lease unexpired at
  death) is recovered: waiters break the dead lease after TTL and
  exactly one reclaims at a time — hold intervals never overlap;
- release-after-break is a no-op (a successor's fresh lease survives
  the zombie's release);
- fencing: a holder paused past its TTL gets ``MutexLostError`` from
  ``check()`` (the hook the commit plane calls before pointer flips /
  counter writes) and from exiting the context (the wall-clock
  assert that a critical section outlived its lease);
- the break's conditional DELETE removes only the content it judged
  expired — a fresh lease with different content is left alone.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import signal
import threading
import time

import pytest

from tb_lakehouse_enhanced_spark.sources.logstore import (
    MutexLostError,
    ObjectStoreCommitStore,
    PosixCommitStore,
)

TTL = 1.2


# -- child entrypoints (spawn-safe: module level) ---------------------------

def _holder_forever(lock_path: str, ttl: float) -> None:
    store = ObjectStoreCommitStore()
    store.LEASE_TTL_SECONDS = ttl
    with store.mutex(lock_path):
        with open(lock_path + ".acquired", "w") as f:
            f.write(str(os.getpid()))
        time.sleep(3600)        # parent SIGKILLs us holding the lease


def _waiter(lock_path: str, ttl: float, log_path: str,
            wid: int) -> None:
    store = ObjectStoreCommitStore()
    store.LEASE_TTL_SECONDS = ttl
    with store.mutex(lock_path):
        t0 = time.time()
        time.sleep(0.05)
        t1 = time.time()
        # O_APPEND single short write: atomic on POSIX
        with open(log_path, "a") as f:
            f.write(json.dumps({"w": wid, "t0": t0, "t1": t1}) + "\n")


def test_holder_killed_in_critical_section_is_recovered(tmp_path):
    """N waiters contend while the holder dies INSIDE the mutex with
    an unexpired lease: exactly one waiter reclaims after TTL, every
    waiter eventually completes, and no two hold intervals overlap."""
    lock = str(tmp_path / "ptr.lock")
    log = str(tmp_path / "holds.jsonl")
    ctx = mp.get_context("spawn")
    holder = ctx.Process(target=_holder_forever, args=(lock, TTL))
    holder.start()
    deadline = time.time() + 30
    while not os.path.isfile(lock + ".acquired"):
        assert time.time() < deadline, "holder never acquired"
        time.sleep(0.02)
    assert os.path.isfile(lock + ".lease")
    killed_at = time.time()
    os.kill(holder.pid, signal.SIGKILL)
    holder.join(timeout=10)
    n = 4
    waiters = [ctx.Process(target=_waiter, args=(lock, TTL, log, i))
               for i in range(n)]
    for p in waiters:
        p.start()
    for p in waiters:
        p.join(timeout=60)
        assert p.exitcode == 0
    with open(log) as f:
        holds = [json.loads(line) for line in f]
    assert sorted(h["w"] for h in holds) == list(range(n))
    # the dead holder's lease gated everyone until it expired
    assert min(h["t0"] for h in holds) >= killed_at
    holds.sort(key=lambda h: h["t0"])
    for a, b in zip(holds, holds[1:]):
        assert a["t1"] <= b["t0"] + 1e-6, f"overlapping holds: {a} {b}"
    # the broken lease is gone or owned by nobody stale
    assert not os.path.isfile(lock + ".lease")


def test_zombie_holder_is_fenced_and_release_is_noop(tmp_path):
    """A holder paused past TTL: a successor breaks + reclaims; the
    zombie's check() raises, its context exit raises, and neither
    touches the successor's fresh lease."""
    store = ObjectStoreCommitStore()
    store.LEASE_TTL_SECONDS = 0.3
    lock = str(tmp_path / "p.lock")
    cm = store.mutex(lock)
    handle = cm.__enter__()
    handle.check()                      # within TTL: fine
    time.sleep(0.45)                    # zombie: lease expired
    acquired = threading.Event()
    release = threading.Event()
    succ_errors: list = []

    def successor():
        try:
            with store.mutex(lock) as h2:
                acquired.set()
                release.wait(10)
                h2.check()              # still owned despite the zombie
        except Exception as e:          # noqa: BLE001
            succ_errors.append(e)
            acquired.set()

    th = threading.Thread(target=successor)
    th.start()
    assert acquired.wait(10)
    with pytest.raises(MutexLostError):
        handle.check()
    # the zombie's release must not delete the successor's lease, and
    # the overstay itself raises (wall-clock fence)
    with pytest.raises(MutexLostError):
        cm.__exit__(None, None, None)
    assert os.path.isfile(lock + ".lease"), \
        "zombie release deleted the successor's fresh lease"
    release.set()
    th.join(timeout=10)
    assert not succ_errors, succ_errors


def test_overstay_raises_even_uncontended(tmp_path):
    store = ObjectStoreCommitStore()
    store.LEASE_TTL_SECONDS = 0.2
    lock = str(tmp_path / "q.lock")
    with pytest.raises(MutexLostError, match="outlived"):
        with store.mutex(lock):
            time.sleep(0.35)
    # the lease was still released (it was still owned at exit)
    assert not os.path.isfile(lock + ".lease")
    # and the mutex is immediately reacquirable
    with store.mutex(lock) as h:
        h.check()


def test_body_exception_not_masked_by_overstay(tmp_path):
    store = ObjectStoreCommitStore()
    store.LEASE_TTL_SECONDS = 0.2
    lock = str(tmp_path / "r.lock")
    with pytest.raises(RuntimeError, match="boom"):
        with store.mutex(lock):
            time.sleep(0.35)
            raise RuntimeError("boom")


def test_conditional_delete_spares_fresh_lease(tmp_path):
    p = str(tmp_path / "x.lease")
    with open(p, "wb") as f:
        f.write(b"fresh-content")
    ObjectStoreCommitStore._delete_if_match(p, b"stale-content")
    assert os.path.isfile(p), "conditional delete removed a fresh lease"
    ObjectStoreCommitStore._delete_if_match(p, b"fresh-content")
    assert not os.path.isfile(p)
    ObjectStoreCommitStore._delete_if_match(p, b"anything")   # no-op


def test_posix_handle_check_is_noop(tmp_path):
    store = PosixCommitStore()
    with store.mutex(str(tmp_path / "f.lock")) as h:
        h.check()                       # flock cannot be lost
