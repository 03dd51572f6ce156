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


# ---------------------------------------------------------------------------
# POST /admin/apply — live reconfiguration (relayctl apply analog)
# ---------------------------------------------------------------------------

def _post_yaml(port, path, body, token=None):
    headers = {"Content-Type": "application/x-yaml"}
    if token is not None:
        headers["X-Admin-Token"] = token
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=body.encode(), method="POST", headers=headers)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def admin_rest(spark, sf_dir):
    """A mutable single-relay web (separate from the shared demo_web so
    apply tests don't reconfigure other modules' fixtures)."""
    from dataweb_spark.demo import build_demo_web
    web = build_demo_web(sf_dir)
    s = RestRelayServer(spark, web, "na_us",
                        admin_token="secret-admin").start()
    yield s
    s.shutdown()


def _query_rows(port, sql):
    code, body = _post(port, {"sql": sql, "mode": "engine"})
    assert code == 202, body
    job_id = body["job_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        code, raw = _get(port, f"/query/{job_id}")
        st = json.loads(raw)
        if st["status"] in ("COMPLETE", "FAILED"):
            break
        time.sleep(0.1)
    assert st["status"] == "COMPLETE", st
    code, raw = _get(port, f"/query/{job_id}/results")
    assert code == 200
    return [json.loads(x) for x in raw.decode().splitlines()]


def test_admin_apply_reconfigures_live_relay(admin_rest, sf_dir):
    """Apply a new Entity + DataSource to a RUNNING relay; the next query
    resolves it — no restart (rest_server/src/admin/utils.rs:28-120)."""
    doc = f"""
kind: Entity
name: regions_admin
informations:
  - {{name: region_name, data_type: string}}
  - {{name: region_key, data_type: bigint}}
---
kind: DataSource
name: regions_admin_src
connection: files
entity: regions_admin
source_sql: "select * from {{table}}"
options: {{table: region.parquet}}
mappings:
  - {{information: region_name, field: r_name}}
  - {{information: region_key, field: r_regionkey}}
"""
    # before: unknown entity
    code, body = _post(admin_rest.port,
                       {"sql": "select * from regions_admin",
                        "mode": "engine"})
    assert code == 400

    code, body = _post_yaml(admin_rest.port, "/admin/apply", doc,
                            token="secret-admin")
    assert code == 200, body
    assert body["applied"] == ["Entity/regions_admin",
                               "DataSource/regions_admin_src"]

    rows = _query_rows(admin_rest.port,
                       "select region_name from regions_admin "
                       "order by region_key")
    assert len(rows) == 5  # TPC-H regions


def test_admin_apply_upserts_existing_source(admin_rest):
    """Re-applying a same-name DataSource replaces it: narrow the trino
    source's row permission and the next query sees fewer rows."""
    before = sum(r["n"] for r in _query_rows(
        admin_rest.port, "select count(*) as n from lineitem"))
    doc = """
kind: DataSource
name: lineitem_trino
connection: files
entity: lineitem
source_sql: "select * from {table}"
options: {table: lineitem.parquet}
fields:
  - {name: l_linenumber, path: l_linenumber}
  - {name: l_quantity, path: l_quantity}
  - {name: l_returnflag, path: l_returnflag}
default_permission:
  allowed_columns: "*"
  allowed_rows: "l_returnflag = 'A'"
mappings:
  - {information: linenumber, field: l_linenumber}
  - {information: quantity, field: l_quantity}
  - {information: returnflag, field: l_returnflag}
"""
    code, body = _post_yaml(admin_rest.port, "/admin/apply", doc,
                            token="secret-admin")
    assert code == 200, body
    after = sum(r["n"] for r in _query_rows(
        admin_rest.port, "select count(*) as n from lineitem"))
    assert 0 < after < before


def test_admin_apply_requires_token(admin_rest):
    code, body = _post_yaml(admin_rest.port, "/admin/apply",
                            "kind: Entity\nname: x\ninformations: []",
                            token="wrong")
    assert code == 403
    code, body = _post_yaml(admin_rest.port, "/admin/apply",
                            "kind: Entity\nname: x\ninformations: []")
    assert code == 403


def test_admin_apply_disabled_without_server_token(rest):
    code, body = _post_yaml(rest.port, "/admin/apply",
                            "kind: Entity\nname: x\ninformations: []",
                            token="anything")
    assert code == 403 and body["error"] == "admin disabled"


def test_admin_apply_bad_yaml_is_400(admin_rest):
    code, body = _post_yaml(admin_rest.port, "/admin/apply",
                            "kind: Nonsense\nname: x", token="secret-admin")
    assert code == 400


def test_admin_config_export_roundtrip(admin_rest):
    """GET /admin/config returns the live catalog as YAML documents;
    applying a mutation first must be visible in the export, and the
    export must re-load into an equivalent catalog."""
    import yaml

    from dataweb_spark.catalog.loader import apply_config_documents
    from dataweb_spark.catalog.model import RelayCatalog

    # mutate the live relay through the apply path
    code, body = _post_yaml(admin_rest.port, "/admin/apply", """
kind: Entity
name: tiny
informations:
  - {name: k, data_type: bigint}
""", token="secret-admin")
    assert code == 200, body

    req = urllib.request.Request(
        f"http://127.0.0.1:{admin_rest.port}/admin/config",
        headers={"X-Admin-Token": "secret-admin"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        text = r.read().decode()
    docs = [d for d in yaml.safe_load_all(text) if d]
    names = {(d["kind"], d.get("name", d.get("local_entity")))
             for d in docs}
    assert ("Entity", "lineitem") in names
    assert ("Entity", "tiny") in names          # the live mutation exported
    assert ("DataSource", "lineitem_trino") in names

    rebuilt = RelayCatalog(name="rebuilt")
    apply_config_documents(rebuilt, docs)
    live = admin_rest.web.relay("na_us")
    assert set(rebuilt.entities) == set(live.entities)
    assert set(rebuilt.sources) == set(live.sources)
    for n, s in live.sources.items():
        assert rebuilt.sources[n].mappings == s.mappings
        assert rebuilt.sources[n].default_permission == s.default_permission


def test_admin_config_requires_token(admin_rest):
    req = urllib.request.Request(
        f"http://127.0.0.1:{admin_rest.port}/admin/config")
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 403")
    except urllib.error.HTTPError as e:
        assert e.code == 403


# -- HTTPS (the reference's rest tests hit https://localhost:844x) ----------

def test_rest_over_tls_end_to_end(spark, demo_web, tmp_path):
    """POST /query → poll → NDJSON over HTTPS: the client verifies the
    server cert (same PEM identity shape as the gRPC TLS surface), and a
    plaintext client must be rejected by the TLS layer."""
    import ssl
    import urllib.error
    from dataweb_spark.sources.pki import generate_tls_identity
    cert_pem, key_pem = generate_tls_identity()
    s = RestRelayServer(spark, demo_web, "na_us",
                        tls=(cert_pem, key_pem)).start()
    try:
        ca = tmp_path / "ca.pem"
        ca.write_bytes(cert_pem)
        ctx = ssl.create_default_context(cafile=str(ca))

        def post(payload):
            req = urllib.request.Request(
                f"https://127.0.0.1:{s.port}/query",
                data=json.dumps(payload).encode(), method="POST",
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, context=ctx) as r:
                return r.status, json.loads(r.read())

        code, body = post({"sql": "select returnflag, count(*) as n "
                                  "from lineitem group by returnflag",
                           "mode": "engine"})
        assert code == 202
        job = body["job_id"]
        deadline = time.time() + 60
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"https://127.0.0.1:{s.port}/query/{job}",
                    context=ctx) as r:
                st = json.loads(r.read())
            if st["status"].upper() in ("COMPLETE", "FAILED"):
                break
            time.sleep(0.3)
        assert st["status"].upper() == "COMPLETE"
        with urllib.request.urlopen(
                f"https://127.0.0.1:{s.port}/query/{job}/results",
                context=ctx) as r:
            lines = [json.loads(x) for x in r.read().splitlines() if x]
        assert len(lines) == 3  # N/A/R
        assert all("_relay_metadata_" in x for x in lines)

        # plaintext client against the TLS port must fail at the transport
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{s.port}/query/{job}", timeout=5)
    finally:
        s.shutdown()


# ---------------------------------------------------------------------------
# DELETE /query/{id} — cancellation
# ---------------------------------------------------------------------------

def _delete(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="DELETE")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_delete_cancels_job(rest):
    code, body = _post(rest.port, {
        "sql": "select count(*) as n from lineitem"})
    assert code == 202
    job_id = body["job_id"]
    code, st = _delete(rest.port, f"/query/{job_id}")
    assert code == 200
    # the response is a snapshot: cancelled if still pending, complete if
    # the tiny query beat the DELETE, in-progress if the interrupt is
    # still propagating — but it must reach a terminal state, and never
    # FAILED (cancellation is not an error)
    assert st["status"] in ("CANCELLED", "COMPLETE", "IN_PROGRESS")
    for _ in range(100):
        code, raw = _get(rest.port, f"/query/{job_id}")
        if json.loads(raw)["status"] in ("CANCELLED", "COMPLETE", "FAILED"):
            break
        time.sleep(0.05)
    assert json.loads(raw)["status"] in ("CANCELLED", "COMPLETE")


def test_delete_unknown_job_404(rest):
    code, body = _delete(rest.port, "/query/deadbeef0000")
    assert code == 404


def test_delete_foreign_principal_403(rest):
    code, body = _post(rest.port, {
        "sql": "select count(*) as n from lineitem",
        "principal": "na_analyst"})
    assert code == 202
    job_id = body["job_id"]
    code, err = _delete(rest.port, f"/query/{job_id}")  # no principal
    assert code == 403 and "error" in err
    code, st = _delete(rest.port,
                       f"/query/{job_id}?principal=na_analyst")
    assert code == 200


# ---------------------------------------------------------------------------
# relayctl CLI (tools/relayctl.py — relayctl/src/main.rs analog)
# ---------------------------------------------------------------------------

@pytest.fixture()
def relayctl_env(admin_rest, monkeypatch):
    monkeypatch.setenv("RELAY_ENDPOINT",
                       f"http://127.0.0.1:{admin_rest.port}")
    monkeypatch.setenv("ADMIN_TOKEN", "secret-admin")
    import importlib
    import sys as _sys
    _sys.path.insert(0, "tools")
    try:
        yield importlib.import_module("relayctl")
    finally:
        _sys.path.remove("tools")


def test_relayctl_query_roundtrip(relayctl_env, capsys):
    rc = relayctl_env.main([
        "query", "select returnflag, count(*) as n from lineitem "
                 "group by returnflag", "--mode", "engine"])
    assert rc == 0
    out = capsys.readouterr().out
    recs = [json.loads(x) for x in out.splitlines()]
    assert {r["returnflag"] for r in recs} == {"A", "N", "R"}


def test_relayctl_apply_get_roundtrip(relayctl_env, tmp_path, capsys):
    (tmp_path / "ent.yaml").write_text("""
kind: Entity
name: ctl_regions
informations:
  - {name: rname, data_type: string}
---
kind: DataSource
name: ctl_regions_src
connection: files
entity: ctl_regions
source_sql: "select * from {table}"
options: {table: region.parquet}
mappings:
  - {information: rname, field: r_name}
""")
    assert relayctl_env.main(["apply", "-f", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "applied!" in out
    # the live catalog now exports the new entity
    assert relayctl_env.main(["get"]) == 0
    exported = capsys.readouterr().out
    assert "ctl_regions" in exported
    # and queries resolve it
    rc = relayctl_env.main([
        "query", "select rname from ctl_regions order by rname",
        "--mode", "engine"])
    assert rc == 0
    assert len(capsys.readouterr().out.splitlines()) == 5


def test_relayctl_status_and_cancel(relayctl_env, capsys):
    import os

    port = int(os.environ["RELAY_ENDPOINT"].rsplit(":", 1)[1])
    code, body = _post(port, {"sql": "select count(*) as n from lineitem"})
    assert code == 202
    job_id = body["job_id"]
    assert relayctl_env.main(["status", job_id]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["job_id"] == job_id
    assert relayctl_env.main(["cancel", job_id]) == 0
    st = json.loads(capsys.readouterr().out)
    # Every cancel-vs-execution race outcome is valid: already finished
    # (COMPLETE), cancelled while queued (CANCELLED), interrupted mid-run
    # (FAILED, or still IN_PROGRESS with the flag set for the worker).
    assert (st["status"] in ("CANCELLED", "COMPLETE", "FAILED")
            or st.get("cancel_requested"))
    assert relayctl_env.main(["cancel", "deadbeef0000"]) == 1


def test_list_jobs_endpoint(rest):
    code, body = _post(rest.port, {
        "sql": "select count(*) as n from lineitem"})
    assert code == 202
    job_id = body["job_id"]
    with urllib.request.urlopen(
            f"http://127.0.0.1:{rest.port}/query") as r:
        listing = json.loads(r.read())
    ids = [j["job_id"] for j in listing["jobs"]]
    assert job_id in ids
    row = next(j for j in listing["jobs"] if j["job_id"] == job_id)
    assert row["mode"] == "template" and row["n_tasks"] == 2


def test_relayctl_jobs_listing(relayctl_env, capsys):
    import os

    port = int(os.environ["RELAY_ENDPOINT"].rsplit(":", 1)[1])
    code, body = _post(port, {"sql": "select count(*) as n from lineitem"})
    assert code == 202
    assert relayctl_env.main(["jobs"]) == 0
    out = capsys.readouterr().out
    assert body["job_id"] in out


def test_explain_endpoint(rest):
    req = urllib.request.Request(
        f"http://127.0.0.1:{rest.port}/explain",
        data=json.dumps({"sql": "select count(*) as n from lineitem "
                                "where quantity < 5"}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert len(body["sources"]) == 2
    assert all(s["action"] == "scan" for s in body["sources"])
    # bad SQL → 400
    req = urllib.request.Request(
        f"http://127.0.0.1:{rest.port}/explain",
        data=json.dumps({"sql": "drop table lineitem"}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_relayctl_explain(relayctl_env, capsys):
    rc = relayctl_env.main([
        "explain", "select count(*) as n from lineitem where quantity < 5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "lineitem_csv" in out and "scan" in out


def test_admin_diff_dry_run(admin_rest):
    doc = """
kind: Entity
name: diff_probe
informations:
  - {name: x, data_type: bigint}
"""
    code, body = _post_yaml(admin_rest.port, "/admin/diff", doc,
                            token="secret-admin")
    assert code == 200
    assert body["diff"] == ["Entity/diff_probe: added"]
    # dry run: the entity is NOT queryable afterwards
    code, _ = _post(admin_rest.port, {"sql": "select * from diff_probe",
                                      "mode": "engine"})
    assert code == 400
    # same guard as apply
    code, _ = _post_yaml(admin_rest.port, "/admin/diff", doc, token="nope")
    assert code == 403


def test_admin_apply_warns_on_dangling_reference(admin_rest):
    """A source referencing a not-yet-applied connection applies (the
    missing half may come next) but the response carries the referential
    warning from validate_web."""
    doc = """
kind: Entity
name: warn_probe
informations:
  - {name: x, data_type: bigint}
---
kind: DataSource
name: warn_probe_src
connection: ghost_connection
entity: warn_probe
source_sql: "select * from {table}"
options: {table: region.parquet}
mappings:
  - {information: x, field: r_regionkey}
"""
    code, body = _post_yaml(admin_rest.port, "/admin/apply", doc,
                            token="secret-admin")
    assert code == 200
    assert any("ghost_connection" in w for w in body["warnings"])
    # a clean apply reports no warnings about itself
    doc2 = """
kind: DataConnection
name: ghost_connection
connection_kind: file
options: {path: /root/testdata/sf0.001}
"""
    code, body = _post_yaml(admin_rest.port, "/admin/apply", doc2,
                            token="secret-admin")
    assert code == 200
    assert not any("ghost_connection" in w for w in body["warnings"])
