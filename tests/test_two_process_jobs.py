"""Two-process async job layer: this process submits to a shared file
store; a SEPARATE worker process (own SparkSession) claims, executes, and
persists results; the submitter polls the Queued → InProgress → Complete
status machine and reads results back from the store — the
``query_runner`` worker topology (``query_runner/src/lib.rs:117-221``,
``rest_server/src/query/route.rs:110-137``) run for real."""

import os
import subprocess
import sys
import time

import pytest

from dataweb_spark.jobs.manager import COMPLETE, FAILED, IN_PROGRESS, QUEUED
from dataweb_spark.jobs.store import FileJobQueue
from dataweb_spark.plans.resolve import PROVENANCE_SOURCE


@pytest.fixture(scope="module")
def store(tmp_path_factory, sf_dir):
    d = str(tmp_path_factory.mktemp("jobstore"))
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "run_job_worker.py")
    proc = subprocess.Popen([sys.executable, script, d, sf_dir],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    deadline = time.time() + 300
    ready = False
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.startswith("READY"):
            ready = True
            break
        if proc.poll() is not None:
            raise RuntimeError("worker died during startup")
    assert ready, "worker startup timed out"
    yield FileJobQueue(d)
    open(os.path.join(d, "STOP"), "w").close()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_status_machine_and_results(spark, store):
    job_id = store.submit(
        "select returnflag, count(*) as n from lineitem group by returnflag")
    # submitted state is QUEUED before any worker touches it
    assert store.read_status(job_id)["status"] == QUEUED
    st = store.wait(job_id, timeout=180)
    assert st["status"] == COMPLETE
    # the full machine was traversed, recorded worker-side so a slow
    # poller cannot miss a transition
    assert st["history"][0] == QUEUED
    assert IN_PROGRESS in st["history"]
    assert st["history"][-1] == COMPLETE
    # template mode: one task per mapped source, each with a result
    assert {t["source"] for t in st["tasks"]} == \
        {"lineitem_trino", "lineitem_csv"}
    assert all(t["status"] == COMPLETE and t["n_rows"] > 0
               for t in st["tasks"])
    # read the partials back from the store and merge client-side
    df = store.result(spark, job_id)
    merged = {}
    for r in df.collect():
        merged[r["returnflag"]] = merged.get(r["returnflag"], 0) + r["n"]
    assert set(merged) == {"A", "N", "R"} and all(
        v > 0 for v in merged.values())
    assert PROVENANCE_SOURCE in df.columns


def test_allow_partial_polling(spark, store):
    """One broken source: strict result raises until/unless all tasks
    landed; allow_partial returns the completed tasks' rows
    (route.rs:110-127 / flight.rs:273-306)."""
    from dataweb_spark.jobs.manager import JobNotReady
    job_id = store.submit(
        "select count(*) as n from lineitem_flaky")
    st = store.wait(job_id, timeout=180)
    by_src = {t["source"]: t["status"] for t in st["tasks"]}
    assert by_src["flaky_good"] == COMPLETE
    assert by_src["flaky_broken"] == FAILED
    with pytest.raises(JobNotReady):
        store.result(spark, job_id)
    rows = store.result(spark, job_id, allow_partial=True).collect()
    assert len(rows) == 1 and rows[0]["n"] > 0


def test_validation_failure_is_failed_job(store):
    job_id = store.submit("drop table lineitem")
    st = store.wait(job_id, timeout=120)
    assert st["status"] == FAILED
    assert "ValidationError" in st["tasks"][0]["error"]


# ---------------------------------------------------------------------------
# Flight do_put result push (flight.rs put path) — a worker that does NOT
# share the submitter's filesystem streams its task result back over gRPC.
# ---------------------------------------------------------------------------

def test_do_put_result_push_roundtrip(spark, demo_web, tmp_path):
    import pyarrow as pa

    from dataweb_spark.jobs.store import FileJobQueue
    from dataweb_spark.sources.flight_service import (
        flight_put_result,
        serve_in_background,
    )

    queue = FileJobQueue(str(tmp_path / "store"))
    server = serve_in_background(spark, demo_web, "na_us",
                                 tokens={"wtok": "worker"},
                                 job_store=queue)
    try:
        job_id = queue.submit("select 1 as x", mode="engine")
        table = pa.table({"x": [1, 2, 3], "y": ["a", "b", "c"]})
        flight_put_result(server.port, job_id, "t1", table,
                          relay="remote_worker", source="pushed_src",
                          token="wtok")
        st = queue.wait(job_id, timeout=10)
        assert st["status"] == "COMPLETE"
        (task,) = st["tasks"]
        assert task["n_rows"] == 3
        assert task["pushed_by"] == "worker"  # transport-derived principal
        df = queue.result(spark, job_id)
        rows = {(r["x"], r["y"]) for r in df.collect()}
        assert rows == {(1, "a"), (2, "b"), (3, "c")}
        assert df.select("_source_relay_").distinct().collect()[0][0] \
            == "remote_worker"
    finally:
        server.shutdown()


def test_do_put_unknown_job_refused(spark, demo_web, tmp_path):
    import pyarrow as pa
    import pyarrow.flight as flight

    from dataweb_spark.jobs.store import FileJobQueue
    from dataweb_spark.sources.flight_service import (
        flight_put_result,
        serve_in_background,
    )

    queue = FileJobQueue(str(tmp_path / "store2"))
    server = serve_in_background(spark, demo_web, "na_us", job_store=queue)
    try:
        with pytest.raises(flight.FlightError):
            flight_put_result(server.port, "no_such_job", "t1",
                              pa.table({"x": [1]}))
    finally:
        server.shutdown()


def test_do_put_disabled_without_store(spark, demo_web):
    import pyarrow as pa
    import pyarrow.flight as flight

    from dataweb_spark.sources.flight_service import (
        flight_put_result,
        serve_in_background,
    )

    server = serve_in_background(spark, demo_web, "na_us")
    try:
        with pytest.raises(flight.FlightError):
            flight_put_result(server.port, "j", "t", pa.table({"x": [1]}))
    finally:
        server.shutdown()


def test_do_put_path_traversal_refused(spark, demo_web, tmp_path):
    """task_id/job_id reach the filesystem path — traversal attempts must
    be rejected before any directory is created (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.flight as flight

    from dataweb_spark.jobs.store import FileJobQueue
    from dataweb_spark.sources.flight_service import (
        flight_put_result,
        serve_in_background,
    )

    queue = FileJobQueue(str(tmp_path / "store3"))
    server = serve_in_background(spark, demo_web, "na_us", job_store=queue)
    try:
        job_id = queue.submit("select 1 as x", mode="engine")
        evil = "x/../../../../tmp/evil"
        with pytest.raises(flight.FlightError, match="invalid task_id"):
            flight_put_result(server.port, job_id, evil, pa.table({"x": [1]}))
        assert not os.path.exists("/tmp/evil")
        with pytest.raises(flight.FlightError, match="invalid job_id"):
            flight_put_result(server.port, "../other", "t1",
                              pa.table({"x": [1]}))
    finally:
        server.shutdown()


def test_do_put_cross_principal_refused(spark, demo_web, tmp_path):
    """A job submitted under one principal must not accept result pushes
    from a different authenticated principal (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.flight as flight

    from dataweb_spark.jobs.store import FileJobQueue
    from dataweb_spark.sources.flight_service import (
        flight_put_result,
        serve_in_background,
    )

    queue = FileJobQueue(str(tmp_path / "store4"))
    server = serve_in_background(spark, demo_web, "na_us",
                                 tokens={"tok_a": "alice", "tok_b": "bob"},
                                 job_store=queue)
    try:
        job_id = queue.submit("select 1 as x", mode="engine",
                              principal="alice")
        with pytest.raises(flight.FlightError, match="belongs to principal"):
            flight_put_result(server.port, job_id, "t1",
                              pa.table({"x": [1]}), token="tok_b")
        # the rightful principal still succeeds
        flight_put_result(server.port, job_id, "t1",
                          pa.table({"x": [1]}), token="tok_a")
        st = queue.read_status(job_id)
        assert st["tasks"][0]["pushed_by"] == "alice"
    finally:
        server.shutdown()
