"""Multi-process federation identity: relays present their OWN x509
identity on outbound hops and propagate the ORIGIN principal, which the
receiving relay accepts only from an enrolled peer relay.

Reference model: every relay holds a client cert/key + CA bundle and
presents them on every relay→relay channel
(``flight_server/src/flight.rs:127-167`` ``get_flight_client``); a
forwarded request carries origination info that the receiver honors only
when the transport fingerprint resolves to a trusted relay — a direct
user's request must carry none, and mixed forms are rejected
(``core/src/execute/utils.rs:62-126``
``verify_query_origination_information``).

Spoof suite here: executor-side possession-challenge auth on the
distributed scan path, JSON-principal override ignored for users,
delegation honored only for enrolled relay identities, relay hop without
an origin principal rejected, and the catalog-driven end-to-end hop over
mutual TLS with cert files (``ca_cert_file``/``client_cert_file``/
``client_key_file`` — the reference's conf names, ``conf.rs:16-46``).
"""

import pytest
import pyarrow.flight as flight

from dataweb_spark.sources import pki
from dataweb_spark.sources.flight_service import (
    flight_query,
    flight_read_distributed,
    serve_in_background,
)


@pytest.fixture(scope="module")
def identities():
    alice_der, alice_key = pki.generate_identity("alice")
    relay_der, relay_key = pki.generate_identity("edge-relay")
    return {"alice": (alice_der, alice_key),
            "edge": (relay_der, relay_key)}


@pytest.fixture(scope="module")
def delegating_server(spark, demo_web, identities):
    users = [pki.X509User(pki.fingerprint_der(identities["alice"][0]),
                          principal="reader")]
    relays = [pki.X509User(pki.fingerprint_der(identities["edge"][0]),
                           principal="edge")]
    s = serve_in_background(spark, demo_web, "na_us",
                            x509_users=users, x509_relays=relays)
    yield s
    s.shutdown()


@pytest.fixture(scope="module")
def view_counts(spark, demo_web):
    from dataweb_spark.plans.resolve import resolve_entity
    reader = resolve_entity(spark, demo_web, "na_us", "lineitem",
                            principal="reader").count()
    admin = resolve_entity(spark, demo_web, "na_us", "lineitem",
                           principal="all_access").count()
    assert admin > reader > 0
    return {"reader": reader, "all_access": admin}


Q = "select returnflag, quantity from lineitem"


def test_distributed_scan_authenticates_with_cert(spark, delegating_server,
                                                  identities, view_counts):
    """Executor tasks run the possession-challenge handshake themselves
    (the key travels as PEM bytes, re-loaded task-side) — the distributed
    path no longer needs an auth-free server."""
    df = flight_read_distributed(
        spark, "127.0.0.1", delegating_server.port, Q,
        mode="engine", cert=identities["alice"])
    assert df.count() == view_counts["reader"]


def test_distributed_json_principal_ignored_for_user(spark,
                                                     delegating_server,
                                                     identities,
                                                     view_counts):
    df = flight_read_distributed(
        spark, "127.0.0.1", delegating_server.port, Q,
        principal="all_access", mode="engine", cert=identities["alice"])
    assert df.count() == view_counts["reader"]


def test_enrolled_relay_delegates_origin_principal(delegating_server,
                                                   identities, view_counts):
    """A transport identity enrolled as a RELAY forwards on behalf of the
    origin principal named in the request — the verify-origination branch
    of ``utils.rs:70-94``."""
    n_admin = flight_query(delegating_server.port, Q,
                           principal="all_access", mode="engine",
                           cert=identities["edge"]).num_rows
    n_reader = flight_query(delegating_server.port, Q,
                            principal="reader", mode="engine",
                            cert=identities["edge"]).num_rows
    assert n_admin == view_counts["all_access"]
    assert n_reader == view_counts["reader"]


def test_relay_hop_without_origin_principal_rejected(delegating_server,
                                                     identities):
    """All-or-none origination (``utils.rs:116-124``): a peer relay that
    forwards no origin principal is malformed, not defaulted."""
    with pytest.raises(flight.FlightUnauthenticatedError):
        flight_query(delegating_server.port, Q, mode="engine",
                     cert=identities["edge"])


def test_distributed_scan_through_relay_delegation(spark, delegating_server,
                                                   identities, view_counts):
    """Ticket redemption is keyed on the DIRECT transport identity: the
    relay that planned the query redeems its own endpoints, streaming the
    origin principal's view."""
    df = flight_read_distributed(
        spark, "127.0.0.1", delegating_server.port, Q,
        principal="all_access", mode="engine", cert=identities["edge"])
    assert df.count() == view_counts["all_access"]


def test_relay_can_push_results_for_delegated_jobs(spark, demo_web,
                                                   identities, tmp_path):
    """Delegated jobs are recorded under the ORIGIN principal, which no
    transport identity maps to — an enrolled peer relay may push their
    results, but only by ASSERTING (and matching) that origin in the
    push command; a blind relay push and a mere user who isn't the
    job's principal are both refused."""
    import pyarrow as pa

    from dataweb_spark.jobs.store import FileJobQueue
    from dataweb_spark.sources.flight_service import flight_put_result
    queue = FileJobQueue(str(tmp_path / "store"))
    users = [pki.X509User(pki.fingerprint_der(identities["alice"][0]),
                          principal="reader")]
    relays = [pki.X509User(pki.fingerprint_der(identities["edge"][0]),
                           principal="edge")]
    server = serve_in_background(spark, demo_web, "na_us",
                                 x509_users=users, x509_relays=relays,
                                 job_store=queue)
    try:
        job_id = queue.submit("select 1 as x", mode="engine",
                              principal="all_access")
        # relay push WITHOUT asserting the origin: refused (a relay
        # never silently overwrites an arbitrary job)
        with pytest.raises(flight.FlightError,
                           match="belongs to principal"):
            flight_put_result(server.port, job_id, "t1",
                              pa.table({"x": [1]}),
                              cert=identities["edge"])
        # asserting the WRONG origin: refused
        with pytest.raises(flight.FlightError,
                           match="belongs to principal"):
            flight_put_result(server.port, job_id, "t1",
                              pa.table({"x": [1]}),
                              cert=identities["edge"],
                              origin_principal="reader")
        flight_put_result(server.port, job_id, "t1",
                          pa.table({"x": [1]}), cert=identities["edge"],
                          origin_principal="all_access")
        st = queue.read_status(job_id)
        assert {t["task_id"] for t in st["tasks"]} >= {"t1"}
        with pytest.raises(flight.FlightError,
                           match="belongs to principal"):
            flight_put_result(server.port, job_id, "t2",
                              pa.table({"x": [1]}),
                              cert=identities["alice"])
    finally:
        server.shutdown()


def test_fingerprint_cannot_enroll_as_user_and_relay(spark, demo_web,
                                                     identities):
    from dataweb_spark.sources.flight_service import RelayFlightServer
    fp = pki.fingerprint_der(identities["edge"][0])
    both = [pki.X509User(fp, principal="edge")]
    with pytest.raises(ValueError, match="both"):
        RelayFlightServer(spark, demo_web, "na_us",
                          x509_users=both, x509_relays=both)


# ---------------------------------------------------------------------------
# Catalog-driven end-to-end: an edge relay whose flight CONNECTION carries
# the identity files; the resolve-level principal propagates to the peer.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mtls_peer(spark, demo_web, identities, tmp_path_factory):
    ca_pem, ca_key = pki.generate_ca()
    tls_id = pki.generate_tls_identity()
    cert_pem, key_pem = pki.generate_client_identity(ca_pem, ca_key,
                                                     "edge-relay-box")
    der = pki.pem_cert_to_der(cert_pem)
    users = [pki.X509User(pki.fingerprint_der(identities["alice"][0]),
                          principal="reader")]
    relays = [pki.X509User(pki.fingerprint_der(der), principal="edge")]
    s = serve_in_background(spark, demo_web, "na_us",
                            x509_users=users, x509_relays=relays,
                            tls=tls_id, mtls_ca=ca_pem)
    d = tmp_path_factory.mktemp("fed_identity")
    paths = {}
    for name, blob in (("ca_cert_file", tls_id[0]),
                       ("client_cert_file", cert_pem),
                       ("client_key_file", key_pem)):
        p = d / f"{name}.pem"
        p.write_bytes(blob)
        paths[name] = str(p)
    yield s, paths
    s.shutdown()


def _edge_web(port: int, conn_opts: dict):
    from dataweb_spark.catalog.model import (
        DataConnection, DataSource, Entity, Mapping, RelayCatalog, Web,
    )
    from dataweb_spark.demo import LINEITEM_INFOS
    edge = RelayCatalog(name="edge")
    edge.add_entity(Entity("lineitem", list(LINEITEM_INFOS)))
    edge.add_connection(DataConnection(
        "peer_flight", "flight", {"port": str(port), **conn_opts}))
    edge.add_source(DataSource(
        name="lineitem_peer", connection="peer_flight", entity="lineitem",
        source_sql="select * from {table}",
        mappings=[Mapping(i.name, i.name) for i in LINEITEM_INFOS],
        options={"entity": "lineitem", "mode": "engine"}))
    web = Web()
    web.add_relay(edge)
    return web


def test_catalog_hop_propagates_resolve_principal(spark, mtls_peer,
                                                  view_counts):
    """resolve_entity(principal=P) → the flight hop presents the relay's
    cert files and names P as the origin — the peer answers P's view."""
    from dataweb_spark.plans.resolve import resolve_entity
    server, paths = mtls_peer
    web = _edge_web(server.port, paths)
    n_admin = resolve_entity(spark, web, "edge", "lineitem",
                             principal="all_access").count()
    n_reader = resolve_entity(spark, web, "edge", "lineitem",
                              principal="reader").count()
    assert n_admin == view_counts["all_access"]
    assert n_reader == view_counts["reader"]


def test_catalog_hop_falls_back_to_configured_principal(spark, mtls_peer,
                                                        view_counts):
    """No resolve-level principal → the connection's configured service
    principal is the origin (back-compat with catalog-static identity)."""
    from dataweb_spark.plans.resolve import resolve_entity
    server, paths = mtls_peer
    web = _edge_web(server.port, {**paths, "principal": "reader"})
    assert resolve_entity(spark, web, "edge", "lineitem").count() \
        == view_counts["reader"]


def test_gateway_template_forward_carries_identity(spark, mtls_peer,
                                                   view_counts):
    """The gateway's whole-template forward (``flight_forward_template``)
    presents the SAME connection identity as the engine read path — an
    aggregate over an identity flight peer forwards whole and still
    answers the delegated principal's view."""
    from dataweb_spark.plans.gateway import QueryGateway
    server, paths = mtls_peer
    web = _edge_web(server.port, paths)
    gw = QueryGateway(spark, web, "edge")
    q = "select count(*) as n from lineitem"
    n_admin = gw.query(q, principal="all_access").collect()[0]["n"]
    n_reader = gw.query(q, principal="reader").collect()[0]["n"]
    assert n_admin == view_counts["all_access"]
    assert n_reader == view_counts["reader"]


def test_origin_principal_propagates_across_two_hops(spark, demo_web,
                                                     tmp_path_factory,
                                                     view_counts):
    """user → relay B → relay C: the middle relay resolves the delegated
    origin principal and THREADS IT ONWARD into its own flight hop under
    its own identity — the reference's origin_user propagation when the
    local relay is not the originator (``flight.rs:132-141``,
    ``create_query_request``)."""
    from dataweb_spark.sources.flight_service import flight_query

    # C holds the permissioned data; trusts relay B.
    b_ident = pki.generate_tls_identity("relay-b")  # (cert_pem, key_pem)
    fp_b = pki.fingerprint_der(pki.pem_cert_to_der(b_ident[0]))
    relay_c = serve_in_background(
        spark, demo_web, "na_us",
        x509_relays=[pki.X509User(fp_b, principal="relay_b")])

    # B federates lineitem from C, presenting B's own identity files.
    d = tmp_path_factory.mktemp("hop_b")
    cert_p, key_p = d / "b.pem", d / "b.key"
    cert_p.write_bytes(b_ident[0])
    key_p.write_bytes(b_ident[1])
    web_b = _edge_web(relay_c.port, {"client_cert_file": str(cert_p),
                                     "client_key_file": str(key_p)})
    # B itself serves Flight, trusting the front relay A.
    a_der, a_key = pki.generate_identity("relay-a")
    relay_b = serve_in_background(
        spark, web_b, "edge",
        x509_relays=[pki.X509User(pki.fingerprint_der(a_der),
                                  principal="relay_a")])
    try:
        for origin, want in (("all_access", view_counts["all_access"]),
                             ("reader", view_counts["reader"])):
            n = flight_query(relay_b.port, Q, principal=origin,
                             mode="engine", cert=(a_der, a_key)).num_rows
            assert n == want, (origin, n, want)
    finally:
        relay_b.shutdown()
        relay_c.shutdown()


@pytest.fixture(scope="module")
def two_process_mtls_peer(sf_dir, identities, tmp_path_factory):
    """A peer relay in a SEPARATE process serving mTLS + x509 identity
    via the reference env contract (``conf.rs:33-75``): its own
    SparkSession, JVM, and trust tables, reachable only over gRPC."""
    import os
    import subprocess
    import sys
    import time

    d = tmp_path_factory.mktemp("proc_pki")
    ca_pem, ca_key = pki.generate_ca()
    srv = pki.generate_tls_identity()
    edge_pem, edge_key = pki.generate_client_identity(ca_pem, ca_key,
                                                      "edge-proc")
    fp_edge = pki.fingerprint_der(pki.pem_cert_to_der(edge_pem))
    fp_alice = pki.fingerprint_der(identities["alice"][0])
    files = {"SERVER_CERT_FILE": srv[0], "SERVER_KEY_FILE": srv[1],
             "CA_CERT_FILE": ca_pem}
    env = dict(os.environ)
    for name, blob in files.items():
        p = d / f"{name}.pem"
        p.write_bytes(blob)
        env[name] = str(p)
    import json as _json
    for name, table in (("X509_USERS_FILE", {fp_alice: "reader"}),
                        ("X509_RELAYS_FILE", {fp_edge: "edge"})):
        p = d / f"{name}.json"
        p.write_text(_json.dumps(table))
        env[name] = str(p)
    client_paths = {}
    for name, blob in (("ca_cert_file", srv[0]),
                       ("client_cert_file", edge_pem),
                       ("client_key_file", edge_key)):
        p = d / f"client_{name}.pem"
        p.write_bytes(blob)
        client_paths[name] = str(p)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools/run_flight_relay.py"),
         sf_dir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    port = None
    deadline = time.time() + 180
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.startswith("PORT "):
            port = int(line.split()[1])
            break
        if proc.poll() is not None:
            raise RuntimeError("relay process died during startup")
    assert port is not None, "peer relay never printed PORT"
    yield port, client_paths
    proc.terminate()
    proc.wait(timeout=30)


def test_two_process_delegated_federation(spark, two_process_mtls_peer,
                                          view_counts):
    """End-to-end across a REAL process boundary: the local relay
    presents its cert files to the subprocess peer (mTLS + possession
    challenge) and the delegated origin principal picks the permission
    view — the reference's deploy topology with transport identity on."""
    from dataweb_spark.plans.resolve import resolve_entity
    port, paths = two_process_mtls_peer
    web = _edge_web(port, paths)
    n_admin = resolve_entity(spark, web, "edge", "lineitem",
                             principal="all_access").count()
    n_reader = resolve_entity(spark, web, "edge", "lineitem",
                              principal="reader").count()
    assert n_admin == view_counts["all_access"]
    assert n_reader == view_counts["reader"]


def test_two_process_certless_caller_rejected(spark, two_process_mtls_peer):
    """No client certificate → the subprocess peer's TLS handshake
    itself refuses (CA_CERT_FILE gates the transport)."""
    import pyarrow.flight as fl

    from dataweb_spark.sources.flight_service import flight_query
    port, paths = two_process_mtls_peer
    with open(paths["ca_cert_file"], "rb") as f:
        server_pem = f.read()
    with pytest.raises(fl.FlightError):
        flight_query(port, "select 1 as x", mode="engine",
                     principal="reader", tls_root_certs=server_pem)


def test_cert_and_key_files_must_pair(spark, mtls_peer):
    from dataweb_spark.plans.resolve import resolve_entity
    server, paths = mtls_peer
    web = _edge_web(server.port,
                    {"ca_cert_file": paths["ca_cert_file"],
                     "client_cert_file": paths["client_cert_file"]})
    with pytest.raises(ValueError, match="together"):
        resolve_entity(spark, web, "edge", "lineitem",
                       principal="reader")
