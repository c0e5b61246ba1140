"""Cross-PROCESS concurrency soak (VERDICT r11 next-round #2).

The OCC / self-heal suites drive races deterministically via
monkeypatched interleaves inside one process; the primitives they rely
on (put-if-absent, the pointer mutex, the identity mutex) are
INTER-PROCESS primitives. These tests exercise them across real OS
processes, against both commit-store backends:

- N writer processes hammer ``_publish`` on one table with no external
  coordination: every version is committed by exactly one writer, the
  version chain is dense, and no writer's successful commit is lost.
- N processes concurrently ``reserve_identity``: the reserved ranges
  are dense and pairwise disjoint.
- A writer process is SIGKILLed between its commit-file publication
  and its pointer flip (a real mid-commit crash, not a monkeypatch);
  a later writer from another process auto-heals the orphan and
  commits — exactly one heal, no lost batches.
- N full SparkSession processes run blind ``append`` batches
  concurrently; all batches land, the chain is dense (POSIX backend;
  one JVM per process keeps this test heavier, so it runs one backend
  — the file-plane tests above cover both).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import signal
import subprocess
import sys
import time

import pytest

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(params=["posix", "objectstore"])
def backend(request, monkeypatch):
    monkeypatch.setenv("TB_LAKEHOUSE_COMMIT_STORE", request.param)
    return request.param


def _tiny_parquet(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), path)


def _seed_table(path: str) -> ManagedTable:
    """v0 without Spark: a data dir + a commit published through the
    real protocol (file plane only)."""
    t = ManagedTable(None, path)
    _tiny_parquet(os.path.join(path, "v0", "part-0.parquet"))
    t._publish(0, {"version": 0, "dir": "v0", "op": "WRITE",
                   "ts": time.time()})
    return t


# -- child entrypoints (spawn-safe: module level) --------------------------

def _publish_racer(path: str, writer: str, n_commits: int,
                   backend: str, out: "mp.Queue") -> None:
    """Publish ``n_commits`` file-plane commits, OCC-retrying on lost
    races — the real blind-append protocol minus the Spark write."""
    os.environ["TB_LAKEHOUSE_COMMIT_STORE"] = backend
    t = ManagedTable(None, path)
    won = []
    for i in range(n_commits):
        token = f"{writer}b{i}"
        staged = None
        for _attempt in range(200):
            v = t.current_version() + 1
            dirname = f"v{v}-a{token}"
            vdir = os.path.join(path, dirname)
            if staged is None:
                _tiny_parquet(os.path.join(vdir, "part-0.parquet"))
            elif staged != vdir:
                os.rename(staged, vdir)
            staged = vdir
            meta = {"version": v, "dir": dirname, "op": "APPEND",
                    "ts": time.time(), "live_base": v - 1,
                    "added_files": ["part-0.parquet"],
                    "writer": writer, "batch": i}
            try:
                t._publish(v, meta)
                won.append(v)
                break
            except Exception:
                time.sleep(0.001)
        else:
            out.put(("error", writer, f"batch {i} lost 200 races"))
            return
    out.put(("ok", writer, won))


def _identity_racer(path: str, writer: int, n_calls: int, per_call: int,
                    backend: str, out: "mp.Queue") -> None:
    os.environ["TB_LAKEHOUSE_COMMIT_STORE"] = backend
    t = ManagedTable(None, path)
    got = []
    for _ in range(n_calls):
        base = t.reserve_identity("id", per_call, floor_slots=0)
        got.append((base, per_call))
    out.put((writer, got))


def _crashing_in_mutex_publisher(path: str, backend: str,
                                 ttl: float) -> None:
    """Run the REAL ``_publish`` but hang INSIDE the pointer mutex
    (mirror-emission step, before the flip) — the parent SIGKILLs us
    there.  On the objectstore backend we die HOLDING an unexpired
    lease: recovery must go through the lease-break path (r12's only
    untested code path; VERDICT r12 #1b)."""
    os.environ["TB_LAKEHOUSE_COMMIT_STORE"] = backend
    from tb_lakehouse_enhanced_spark.sources.logstore import (
        ObjectStoreCommitStore,
    )
    ObjectStoreCommitStore.LEASE_TTL_SECONDS = ttl
    t = ManagedTable(None, path)
    v = t.current_version() + 1
    _tiny_parquet(os.path.join(path, f"v{v}-adead", "part-0.parquet"))
    meta = {"version": v, "dir": f"v{v}-adead", "op": "APPEND",
            "ts": time.time(), "live_base": v - 1,
            "added_files": ["part-0.parquet"]}

    def hang(self, _v, _meta):
        with open(os.path.join(path, "_in_mutex"), "w") as f:
            f.write(str(os.getpid()))
        time.sleep(3600)        # parent kills us inside the mutex
    ManagedTable._emit_delta_log = hang
    t._publish(v, meta)


def _crashing_publisher(path: str, backend: str) -> None:
    """Create the commit file for the next version, then hang before
    the pointer flip — the parent SIGKILLs us here: a real mid-commit
    crash leaving an orphan commit."""
    os.environ["TB_LAKEHOUSE_COMMIT_STORE"] = backend
    t = ManagedTable(None, path)
    v = t.current_version() + 1
    _tiny_parquet(os.path.join(path, f"v{v}-adead", "part-0.parquet"))
    meta = {"version": v, "dir": f"v{v}-adead", "op": "APPEND",
            "ts": time.time(), "live_base": v - 1,
            "added_files": ["part-0.parquet"]}
    ok = t._store.put_if_absent(t._commit_file(v), json.dumps(meta))
    assert ok
    time.sleep(3600)        # parent kills us before any flip


# -- tests ------------------------------------------------------------------

def test_cross_process_publish_race(tmp_path, backend):
    path = str(tmp_path / "t")
    _seed_table(path)
    ctx = mp.get_context("spawn")
    out = ctx.Queue()
    n_writers, n_commits = 4, 6
    procs = [ctx.Process(target=_publish_racer,
                         args=(path, f"w{i}", n_commits, backend, out))
             for i in range(n_writers)]
    for p in procs:
        p.start()
    results = [out.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    assert all(r[0] == "ok" for r in results), results
    t = ManagedTable(None, path)
    head = t.current_version()
    # dense chain: every version 1..head committed by EXACTLY one writer
    assert head == n_writers * n_commits
    owners = {}
    for v in range(1, head + 1):
        meta = t._commit(v)
        assert meta["op"] == "APPEND" and meta["live_base"] == v - 1
        owners[v] = (meta["writer"], meta["batch"])
    # no writer lost a batch, no version double-owned (dict keys dense)
    assert sorted(owners.values()) == sorted(
        (f"w{i}", b) for i in range(n_writers) for b in range(n_commits))
    # every winner's claimed version matches the log
    for _, w, won in results:
        assert [owners[v][0] for v in won] == [w] * n_commits


def test_cross_process_identity_reservation(tmp_path, backend):
    path = str(tmp_path / "t")
    os.makedirs(path, exist_ok=True)
    ctx = mp.get_context("spawn")
    out = ctx.Queue()
    n_procs, n_calls, per_call = 6, 20, 7
    procs = [ctx.Process(target=_identity_racer,
                         args=(path, i, n_calls, per_call, backend, out))
             for i in range(n_procs)]
    for p in procs:
        p.start()
    results = [out.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    slots = []
    for _w, got in results:
        for base, n in got:
            slots.extend(range(base, base + n))
    # disjoint (no slot handed to two reservations) and DENSE (the
    # counter never skipped: crashes aside, ranges tile 0..N)
    assert len(slots) == len(set(slots))
    assert sorted(slots) == list(range(n_procs * n_calls * per_call))


def test_cross_process_crash_heal(tmp_path, backend, monkeypatch):
    path = str(tmp_path / "t")
    _seed_table(path)
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_crashing_publisher, args=(path, backend))
    p.start()
    # wait until the orphan commit file exists, then SIGKILL mid-commit
    t = ManagedTable(None, path)
    deadline = time.time() + 60
    while not os.path.isfile(t._commit_file(1)):
        assert time.time() < deadline, "crasher never published"
        time.sleep(0.02)
    os.kill(p.pid, signal.SIGKILL)
    p.join(timeout=30)
    assert t.current_version() == 0      # pointer never moved
    # a later writer from THIS process heals the stale orphan and lands
    monkeypatch.setattr(ManagedTable, "ORPHAN_GRACE_SECONDS", 0.2)
    time.sleep(0.3)
    out: "mp.Queue" = ctx.Queue()
    _publish_racer(path, "late", 1, backend, out)
    status, _w, won = out.get(timeout=10)
    assert status == "ok"
    healed = ManagedTable(None, path)._commit(1)
    assert healed.get("healed") and healed["op"] == "HEALED ORPHAN"
    assert won == [2]
    assert ManagedTable(None, path).current_version() == 2


def test_cross_process_crash_inside_pointer_mutex(tmp_path, backend,
                                                  monkeypatch):
    """A writer SIGKILLed while HOLDING the pointer mutex (inside the
    verify+emit+flip critical section).  POSIX: the flock dies with
    the process.  Objectstore: the dead writer leaves an unexpired
    lease — the next writer's heal must wait out the TTL, break the
    lease via conditional DELETE, reclaim, and heal the orphan."""
    from tb_lakehouse_enhanced_spark.sources.logstore import (
        ObjectStoreCommitStore,
    )
    ttl = 1.0
    monkeypatch.setattr(ObjectStoreCommitStore, "LEASE_TTL_SECONDS", ttl)
    path = str(tmp_path / "t")
    _seed_table(path)
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_crashing_in_mutex_publisher,
                    args=(path, backend, ttl))
    p.start()
    t = ManagedTable(None, path)
    marker = os.path.join(path, "_in_mutex")
    deadline = time.time() + 60
    while not os.path.isfile(marker):
        assert time.time() < deadline, "crasher never entered the mutex"
        time.sleep(0.02)
    os.kill(p.pid, signal.SIGKILL)
    p.join(timeout=30)
    assert t.current_version() == 0      # pointer never moved
    if backend == "objectstore":
        assert os.path.isfile(t._pointer + ".lock.lease"), \
            "crasher should have died holding the lease"
    monkeypatch.setattr(ManagedTable, "ORPHAN_GRACE_SECONDS", 0.2)
    time.sleep(0.3)
    out: "mp.Queue" = ctx.Queue()
    _publish_racer(path, "late", 1, backend, out)
    status, _w, won = out.get(timeout=30)
    assert status == "ok"
    healed = ManagedTable(None, path)._commit(1)
    assert healed.get("healed") and healed["op"] == "HEALED ORPHAN"
    assert won == [2]
    assert ManagedTable(None, path).current_version() == 2


SPARK_CHILD = r"""
import os, sys
path, writer, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1g"
sys.path.insert(0, {repo!r})
from tb_lakehouse_enhanced_spark.session import get_session
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
spark = get_session(f"xproc-{{writer}}", cpus=2)
t = ManagedTable(spark, path)
for i in range(n):
    t.append(spark.createDataFrame([(int(writer[1:]), i)], "w long, b long"),
             extra_meta={{"writer": writer, "batch": i}})
print("DONE", writer)
"""


def test_cross_process_spark_appends(tmp_path):
    """Three real SparkSession processes blind-append concurrently
    (POSIX backend; the heavier of the two profiles is covered by the
    file-plane races above)."""
    path = str(tmp_path / "t")
    from tb_lakehouse_enhanced_spark.session import get_session
    spark = get_session("tb-lakehouse-tests", cpus=8)
    t = ManagedTable(spark, path)
    t.overwrite(spark.createDataFrame([(99, -1)], "w long, b long"))
    script = SPARK_CHILD.format(repo=REPO)
    n_writers, n_batches = 3, 3
    env = dict(os.environ, TB_LAKEHOUSE_COMMIT_STORE="posix")
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, path, f"w{i}", str(n_batches)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(n_writers)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    head = t.current_version()
    assert head == n_writers * n_batches
    seen = set()
    for v in range(1, head + 1):
        meta = t._commit(v)
        assert meta["op"] == "APPEND" and meta["live_base"] == v - 1
        seen.add((meta["writer"], meta["batch"]))
    assert seen == {(f"w{i}", b)
                    for i in range(n_writers) for b in range(n_batches)}
    # every batch's row is in the final read — nothing lost
    rows = sorted(map(tuple, t.read().collect()))
    assert rows == sorted([(99, -1)] + [(i, b) for i in range(n_writers)
                                        for b in range(n_batches)])
