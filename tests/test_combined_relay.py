"""Single-process combined relay (the reference's one-binary mode,
``single_binary_deployment/src/main.rs:9-40``): Flight face + REST face
+ in-memory-queue workers booted together over one SparkSession and one
catalog, round-tripping queries through every face."""

import json
import time
import urllib.request

import pytest

from dataweb_spark.jobs.combined import CombinedRelay
from dataweb_spark.jobs.manager import COMPLETE
from dataweb_spark.sources.flight_service import (flight_list_entities,
                                                  flight_query)

SQL = ("select returnflag, count(*) as n from lineitem "
       "group by returnflag")


@pytest.fixture(scope="module")
def combined(spark, sf_dir):
    # A PRIVATE web: test_faces_share_one_catalog mutates the catalog
    # (that mutation IS the behavior under test), so it must never touch
    # the session-scoped demo_web shared with every other test module.
    from dataweb_spark.demo import build_demo_web
    c = CombinedRelay(spark, build_demo_web(sf_dir), "na_us",
                      n_workers=2).start()
    yield c
    c.shutdown()


def _rest_json(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, r.read().decode()


def test_flight_face_roundtrip(combined):
    tbl = flight_query(combined.flight_port, SQL)
    got = dict(zip(tbl.column("returnflag").to_pylist(),
                   tbl.column("n").to_pylist()))
    assert set(got) == {"A", "N", "R"} and all(v > 0 for v in got.values())
    # the catalog face serves too (same web object)
    assert "lineitem" in flight_list_entities(combined.flight_port)


def test_rest_face_roundtrip(combined):
    req = urllib.request.Request(
        f"http://127.0.0.1:{combined.rest_port}/query",
        data=json.dumps({"sql": SQL, "mode": "engine"}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 202
        job_id = json.loads(r.read())["job_id"]
    deadline = time.time() + 300
    while time.time() < deadline:
        _, body = _rest_json(combined.rest_port, f"/query/{job_id}")
        if json.loads(body)["status"] == COMPLETE:
            break
        time.sleep(0.2)
    _, nd = _rest_json(combined.rest_port, f"/query/{job_id}/results")
    rows = [json.loads(line) for line in nd.strip().splitlines()]
    got = {r["returnflag"]: r["n"] for r in rows}
    assert set(got) == {"A", "N", "R"} and all(v > 0 for v in got.values())
    # the reference's NDJSON contract: provenance rides in an injected
    # _relay_metadata_ object on every record
    assert all("_relay_metadata_" in r for r in rows)


def test_worker_queue_roundtrip(combined, spark):
    """The query-runner face: submit to the shared in-memory queue, a
    worker THREAD claims and executes, results read back from the
    store — and both workers survive to drain a second job."""
    for _ in range(2):
        job_id = combined.queue.submit(SQL, mode="engine")
        st = combined.queue.wait(job_id, timeout=300)
        assert st["status"] == COMPLETE, st
        df = combined.queue.result(spark, job_id)
        got = {r["returnflag"]: r["n"] for r in df.collect()}
        assert set(got) == {"A", "N", "R"}


def test_faces_share_one_catalog(combined):
    """An entity added to the SHARED web object is immediately visible
    through the Flight catalog listing — the one-process sharing the
    reference's single binary gets from process-wide config."""
    from dataweb_spark.catalog.model import (DataSource, Entity,
                                             Information, Mapping)
    relay = combined.web.relay("na_us")
    if "combined_probe" not in relay.entities:
        relay.add_entity(Entity("combined_probe",
                                [Information("flag", "string")]))
        relay.add_source(DataSource(
            name="probe_src", connection="files",
            entity="combined_probe",
            source_sql="select l_returnflag from {table}",
            mappings=[Mapping("flag", "l_returnflag")],
            options={"table": "lineitem.parquet"}))
    assert "combined_probe" in flight_list_entities(combined.flight_port)
    tbl = flight_query(combined.flight_port,
                       "select flag, count(*) as n from combined_probe "
                       "group by flag", mode="engine")
    assert tbl.num_rows == 3
