"""HTTP entry point: POST /query → poll GET /query/{id} → NDJSON results
with ``_relay_metadata_`` — the reference's REST path
(``rest_server/src/query/route.rs:149-268``, client polling
``test/rest_utils.py:32-51``) driven through a real network socket."""

import json
import time
import urllib.request

import pytest

from dataweb_spark.sources.rest_server import RestRelayServer


@pytest.fixture(scope="module")
def rest(spark, demo_web):
    s = RestRelayServer(spark, demo_web, "na_us").start()
    yield s
    s.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query",
        data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_post_poll_ndjson_roundtrip(rest):
    code, body = _post(rest.port, {
        "sql": "select returnflag, count(*) as n from lineitem "
               "group by returnflag"})
    assert code == 202
    job_id = body["job_id"]

    deadline = time.time() + 120
    while time.time() < deadline:
        code, raw = _get(rest.port, f"/query/{job_id}")
        st = json.loads(raw)
        assert code == 200
        if st["status"] == "COMPLETE":
            break
        time.sleep(0.1)
    assert st["status"] == "COMPLETE"
    assert {t["source"] for t in st["tasks"]} == \
        {"lineitem_trino", "lineitem_csv"}

    code, raw = _get(rest.port, f"/query/{job_id}/results")
    assert code == 200
    recs = [json.loads(x) for x in raw.decode().splitlines()]
    # partials, unmerged: trino source has 3 flags; csv source is
    # permission-filtered to returnflag='N' → 1 group
    assert len(recs) == 4
    merged = {}
    for r in recs:
        assert r["_relay_metadata_"]["_source_relay_"] == "na_us"
        merged[r["returnflag"]] = merged.get(r["returnflag"], 0) + r["n"]
    assert set(merged) == {"A", "N", "R"}


def test_results_409_while_pending(rest):
    """The poll contract: /results returns status (409), not data, until
    the job lands — unless allow_partial."""
    code, body = _post(rest.port, {
        "sql": "select count(*) as n from lineitem"})
    job_id = body["job_id"]
    code, raw = _get(rest.port, f"/query/{job_id}/results")
    # immediately after submit: either still pending (409+status) or, if
    # the pool was idle and finished already, 200 with data
    assert code in (409, 200)
    if code == 409:
        assert json.loads(raw)["status"] in ("QUEUED", "IN_PROGRESS")


def test_bad_sql_is_400(rest):
    code, body = _post(rest.port, {"sql": "drop table lineitem"})
    assert code == 400 and "error" in body


def test_unknown_job_404(rest):
    code, _ = _get(rest.port, "/query/deadbeef0000")
    assert code == 404
