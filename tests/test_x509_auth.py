"""x509-fingerprint principal identity over the Flight surface.

Mirrors the reference's PKI model (``core/src/pki/mod.rs:12-25``,
``core/src/model/user.rs:17-28``, origin-user re-check
``flight_server/src/flight.rs:396-447``): principals are SHA-256
fingerprints of DER certificates, proven by key possession in the
handshake. Spoof suite: stolen-cert-without-key, unregistered cert,
request-JSON principal override, cross-principal ticket redemption."""

import hashlib

import pytest
import pyarrow.flight as flight

from dataweb_spark.sources import pki
from dataweb_spark.sources.flight_service import (
    flight_query,
    serve_in_background,
)


@pytest.fixture(scope="module")
def identities():
    reader_der, reader_key = pki.generate_identity("reader")
    admin_der, admin_key = pki.generate_identity("all-access")
    rogue_der, rogue_key = pki.generate_identity("rogue")
    return {"reader": (reader_der, reader_key),
            "admin": (admin_der, admin_key),
            "rogue": (rogue_der, rogue_key)}


@pytest.fixture(scope="module")
def x509_server(spark, demo_web, identities):
    users = [
        pki.X509User(pki.fingerprint_der(identities["reader"][0]),
                     principal="reader"),
        pki.X509User(pki.fingerprint_der(identities["admin"][0]),
                     principal="all_access"),
    ]
    s = serve_in_background(spark, demo_web, "na_us", x509_users=users)
    yield s
    s.shutdown()


def test_parse_certificate_matches_reference_shape(identities):
    der, _ = identities["reader"]
    fp, subject, issuer = pki.parse_certificate(der)
    assert fp == hashlib.sha256(der).hexdigest().upper()  # pki/mod.rs:12-16
    assert "CN=reader" in subject
    assert subject == issuer  # self-signed


def test_fingerprint_identity_resolves_permissions(x509_server, identities):
    """Same query, two certificates → the cert's principal decides what is
    visible (all_access sees policy-hidden rows)."""
    q = "select count(*) as n from lineitem"
    n_reader = sum(flight_query(x509_server.port, q,
                                cert=identities["reader"])["n"].to_pylist())
    n_admin = sum(flight_query(x509_server.port, q,
                               cert=identities["admin"])["n"].to_pylist())
    assert n_admin > n_reader > 0


def test_request_json_principal_is_ignored(x509_server, identities):
    """Transport-derived identity: naming all_access in the request JSON
    while presenting the reader cert must NOT escalate."""
    q = "select count(*) as n from lineitem"
    n = sum(flight_query(x509_server.port, q, principal="all_access",
                         cert=identities["reader"])["n"].to_pylist())
    n_reader = sum(flight_query(x509_server.port, q,
                                cert=identities["reader"])["n"].to_pylist())
    assert n == n_reader


def test_unregistered_fingerprint_rejected(x509_server, identities):
    with pytest.raises(flight.FlightUnauthenticatedError):
        flight_query(x509_server.port, "select 1",
                     cert=identities["rogue"])


def test_stolen_cert_without_key_rejected(x509_server, identities):
    """Replaying a registered certificate signed with the WRONG private
    key fails the possession proof."""
    reader_der, _ = identities["reader"]
    _, rogue_key = identities["rogue"]
    with pytest.raises(flight.FlightUnauthenticatedError):
        flight_query(x509_server.port, "select 1",
                     cert=(reader_der, rogue_key))


def test_no_auth_without_certificate(x509_server):
    with pytest.raises((flight.FlightUnauthenticatedError,
                        flight.FlightServerError)):
        flight_query(x509_server.port, "select count(*) as n from lineitem")


def test_origin_user_recheck_across_principals(x509_server, identities):
    """A ticket planned for one fingerprint-principal cannot be redeemed
    by another (flight.rs:396-447)."""
    import json

    from dataweb_spark.sources.flight_service import (
        _CertClientAuth,
        _connect,
    )
    c_admin = _connect("127.0.0.1", x509_server.port, None,
                       identities["admin"])
    cmd = json.dumps({"sql": "select count(*) as n from lineitem",
                      "mode": "engine"}).encode()
    info = c_admin.get_flight_info(flight.FlightDescriptor.for_command(cmd))
    c_reader = flight.connect(f"grpc://127.0.0.1:{x509_server.port}")
    c_reader.authenticate(_CertClientAuth(*identities["reader"]))
    with pytest.raises((flight.FlightUnauthorizedError,
                        flight.FlightServerError)):
        c_reader.do_get(info.endpoints[0].ticket).read_all()


# ---------------------------------------------------------------------------
# TLS transport (the reference runs mTLS on the channel itself — the
# possession-challenge handshake must ride an encrypted gRPC connection).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tls_identity():
    return pki.generate_tls_identity("localhost")


@pytest.fixture(scope="module")
def tls_x509_server(spark, demo_web, identities, tls_identity):
    users = [
        pki.X509User(pki.fingerprint_der(identities["reader"][0]),
                     principal="reader"),
        pki.X509User(pki.fingerprint_der(identities["admin"][0]),
                     principal="all_access"),
    ]
    s = serve_in_background(spark, demo_web, "na_us", x509_users=users,
                            tls=tls_identity)
    yield s
    s.shutdown()


def test_auth_suite_over_tls(tls_x509_server, identities, tls_identity):
    """The full fingerprint-identity flow over an encrypted channel:
    per-principal visibility, JSON-principal spoof ignored, stolen cert
    refused — same outcomes as plaintext, now on grpc+tls."""
    root = tls_identity[0]
    q = "select count(*) as n from lineitem"
    n_reader = sum(flight_query(
        tls_x509_server.port, q, cert=identities["reader"],
        tls_root_certs=root)["n"].to_pylist())
    n_admin = sum(flight_query(
        tls_x509_server.port, q, cert=identities["admin"],
        tls_root_certs=root)["n"].to_pylist())
    assert n_admin > n_reader > 0
    n_spoof = sum(flight_query(
        tls_x509_server.port, q, principal="all_access",
        cert=identities["reader"], tls_root_certs=root)["n"].to_pylist())
    assert n_spoof == n_reader
    stolen = (identities["admin"][0], identities["rogue"][1])
    with pytest.raises(flight.FlightError):
        flight_query(tls_x509_server.port, q, cert=stolen,
                     tls_root_certs=root)


def test_plaintext_client_cannot_reach_tls_server(tls_x509_server,
                                                  identities):
    with pytest.raises(flight.FlightError):
        flight_query(tls_x509_server.port, "select 1 as x",
                     cert=identities["reader"])


def test_wrong_root_cert_rejected(tls_x509_server, identities):
    other_root, _ = pki.generate_tls_identity("localhost")
    with pytest.raises(flight.FlightError):
        flight_query(tls_x509_server.port, "select 1 as x",
                     cert=identities["reader"], tls_root_certs=other_root)


def test_distributed_scan_over_tls(spark, tls_x509_server, demo_web,
                                   tls_identity, identities):
    """The executor-side mapInArrow path must also carry TLS (each task
    opens its own encrypted channel)."""
    from dataweb_spark.plans.resolve import resolve_entity
    from dataweb_spark.sources.flight_service import flight_read_distributed

    # token-free TLS server (no auth) so executor tasks need no handshake
    s2 = serve_in_background(spark, demo_web, "na_us", tls=tls_identity)
    try:
        df = flight_read_distributed(
            spark, "127.0.0.1", s2.port,
            "select returnflag, quantity from lineitem",
            mode="template", tls_root_certs=tls_identity[0])
        want = resolve_entity(spark, demo_web, "na_us", "lineitem").count()
        assert df.count() == want
    finally:
        s2.shutdown()


# ---------------------------------------------------------------------------
# Handshake-level mutual TLS (r6): the gRPC channel itself rejects clients
# whose certificate doesn't chain to the server's CA — the reference's
# transport model (pki/mod.rs:12-25) — composing with the fingerprint
# principal layer above.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mtls_setup(spark, demo_web, identities, tls_identity):
    ca_pem, ca_key = pki.generate_ca()
    client_tls = pki.generate_client_identity(ca_pem, ca_key, "reader-box")
    users = [
        pki.X509User(pki.fingerprint_der(identities["reader"][0]),
                     principal="reader"),
    ]
    s = serve_in_background(spark, demo_web, "na_us", x509_users=users,
                            tls=tls_identity, mtls_ca=ca_pem)
    yield s, client_tls
    s.shutdown()


def test_mtls_client_with_ca_cert_admitted(mtls_setup, identities,
                                           tls_identity):
    """A CA-signed client passes the TLS handshake AND the possession
    challenge; per-principal permissions apply as usual."""
    server, client_tls = mtls_setup
    from dataweb_spark.sources.flight_service import _connect
    client = _connect("127.0.0.1", server.port, None,
                      cert=identities["reader"],
                      tls_root_certs=tls_identity[0],
                      client_tls=client_tls)
    flights = list(client.list_flights())
    assert flights  # catalog listing works over the mutual channel


def test_mtls_client_without_cert_rejected(mtls_setup, identities,
                                           tls_identity):
    """No client certificate → the TLS handshake itself fails; no RPC
    (not even the auth handshake) ever runs."""
    server, _ = mtls_setup
    with pytest.raises(flight.FlightError):
        flight_query(server.port, "select 1 as x",
                     cert=identities["reader"],
                     tls_root_certs=tls_identity[0])


def test_mtls_foreign_ca_cert_rejected(mtls_setup, identities,
                                       tls_identity):
    """A certificate from a DIFFERENT CA is refused at the handshake."""
    server, _ = mtls_setup
    other_ca, other_key = pki.generate_ca("other-ca")
    foreign = pki.generate_client_identity(other_ca, other_key, "intruder")
    from dataweb_spark.sources.flight_service import _connect
    with pytest.raises(flight.FlightError):
        client = _connect("127.0.0.1", server.port, None,
                          cert=identities["reader"],
                          tls_root_certs=tls_identity[0],
                          client_tls=foreign)
        list(client.list_flights())


def test_mtls_requires_server_tls(spark, demo_web):
    ca_pem, _ = pki.generate_ca()
    with pytest.raises(ValueError, match="mtls_ca requires tls"):
        from dataweb_spark.sources.flight_service import RelayFlightServer
        RelayFlightServer(spark, demo_web, "na_us", mtls_ca=ca_pem)
