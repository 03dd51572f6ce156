"""Single-process combined relay (the reference's one-binary mode,
``single_binary_deployment/src/main.rs:9-40``): Flight face + REST face
+ in-memory-queue workers booted together over one SparkSession and one
catalog, round-tripping queries through every face."""

import json
import time
import urllib.error
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


def test_combined_relay_one_identity_both_faces(spark, sf_dir, tmp_path):
    """Single-binary identity sharing: ONE enrolled certificate
    fingerprint drives BOTH network faces — the Flight handshake
    (possession-proven) and the REST mTLS listener resolve the same
    principal; a certless REST caller gets 401; token+x509 and
    x509-without-mtls configs are rejected."""
    import json
    import ssl

    from cryptography import x509 as cx
    from cryptography.hazmat.primitives.serialization import (
        Encoding,
        load_pem_private_key,
    )

    from dataweb_spark.demo import build_demo_web
    from dataweb_spark.sources import pki

    ca_pem, ca_key = pki.generate_ca()
    srv_tls = pki.generate_tls_identity()
    cert_pem, key_pem = pki.generate_client_identity(ca_pem, ca_key,
                                                     "reader")
    der = cx.load_pem_x509_certificate(cert_pem).public_bytes(Encoding.DER)
    key = load_pem_private_key(key_pem, password=None)
    users = [pki.X509User(pki.fingerprint_der(der), principal="reader")]

    with pytest.raises(ValueError, match="not both"):
        CombinedRelay(spark, build_demo_web(sf_dir), "na_us",
                      tokens={"t": "reader"}, x509_users=users,
                      tls=srv_tls, mtls_ca=ca_pem)
    with pytest.raises(ValueError, match="mtls_ca"):
        CombinedRelay(spark, build_demo_web(sf_dir), "na_us",
                      x509_users=users)

    c = CombinedRelay(spark, build_demo_web(sf_dir), "na_us",
                      n_workers=1, x509_users=users,
                      tls=srv_tls, mtls_ca=ca_pem).start()
    try:
        # Flight face: mTLS channel + possession-proven handshake
        tbl = flight_query(c.flight_port, SQL, principal="all_access",
                           cert=(der, key),
                           tls_root_certs=srv_tls[0],
                           client_tls=(cert_pem, key_pem))
        assert sum(tbl.column("n").to_pylist()) > 0

        # REST face: the SAME cert resolves the SAME principal
        cf, kf = tmp_path / "c.pem", tmp_path / "k.pem"
        cf.write_bytes(cert_pem); kf.write_bytes(key_pem)
        ctx = ssl.create_default_context(cadata=srv_tls[0].decode())
        ctx.check_hostname = False
        ctx.load_cert_chain(str(cf), str(kf))
        req = urllib.request.Request(
            f"https://127.0.0.1:{c.rest_port}/query",
            data=json.dumps({"sql": SQL,
                             "principal": "all_access"}).encode(),
            method="POST")
        with urllib.request.urlopen(req, context=ctx, timeout=60) as r:
            job = json.loads(r.read())["job_id"]
        with urllib.request.urlopen(
                f"https://127.0.0.1:{c.rest_port}/query/{job}",
                context=ctx, timeout=60) as r:
            assert json.loads(r.read())["principal"] == "reader"

        # certless REST caller: 401, not an identity fallback
        bare = ssl.create_default_context(cadata=srv_tls[0].decode())
        bare.check_hostname = False
        try:
            urllib.request.urlopen(
                f"https://127.0.0.1:{c.rest_port}/query/{job}",
                context=bare, timeout=60)
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
    finally:
        c.shutdown()
