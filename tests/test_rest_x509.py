"""Transport-bound REST identity + streamed NDJSON results.

Mirrors ``test_x509_auth.py`` over HTTPS: the reference resolves the REST
principal from the client x509 certificate — direct TLS
(``rest_server/src/lib.rs:48-71``) or a TLS-terminating-proxy cert header
(``rest_server/src/utils.rs:8-38``, used at ``query/route.rs:62-68``) —
and ignores any identity claimed in the request body. Spoof suite:
JSON-principal override, missing cert, unregistered cert, cross-principal
cancel/status/results, proxy-header mode, is_admin certificate attribute.
Plus the memory-bound contract of the results route: chunked transfer
straight off the row iterator, never a driver-side join of the full
result (``query/utils.rs:81-169``)."""

import json
import ssl
import threading
import time
import urllib.error
import urllib.request
from urllib.parse import quote

import pytest

from dataweb_spark.sources import pki
from dataweb_spark.sources.rest_server import RestRelayServer


def _der(cert_pem: bytes) -> bytes:
    from cryptography import x509
    from cryptography.hazmat.primitives.serialization import Encoding
    return x509.load_pem_x509_certificate(cert_pem).public_bytes(
        Encoding.DER)


@pytest.fixture(scope="module")
def pki_env(tmp_path_factory):
    """CA + server identity + three CA-signed client identities, written
    to disk for ssl contexts."""
    d = tmp_path_factory.mktemp("rest_pki")
    ca_pem, ca_key = pki.generate_ca()
    srv_cert, srv_key = pki.generate_tls_identity()
    out = {"ca_pem": ca_pem, "tls": (srv_cert, srv_key), "dir": d}
    (d / "server_ca.pem").write_bytes(srv_cert)
    for name in ("reader", "admin", "rogue", "peer"):
        cert, key = pki.generate_client_identity(ca_pem, ca_key, name)
        (d / f"{name}.pem").write_bytes(cert)
        (d / f"{name}.key").write_bytes(key)
        out[name] = cert
    return out


@pytest.fixture(scope="module")
def users(pki_env):
    return [
        pki.X509User(pki.fingerprint_der(_der(pki_env["reader"])),
                     principal="reader"),
        pki.X509User(pki.fingerprint_der(_der(pki_env["admin"])),
                     principal="all_access",
                     attributes={"is_admin": True}),
    ]


@pytest.fixture(scope="module")
def mtls_rest(spark, demo_web, pki_env, users):
    relays = [pki.X509User(pki.fingerprint_der(_der(pki_env["peer"])),
                           principal="edge")]
    s = RestRelayServer(spark, demo_web, "na_us",
                        admin_token=None,
                        tls=pki_env["tls"],
                        mtls_ca=pki_env["ca_pem"],
                        x509_users=users,
                        x509_relays=relays).start()
    yield s
    s.shutdown()


def _ctx(pki_env, client: str | None = None) -> ssl.SSLContext:
    ctx = ssl.create_default_context(
        cafile=str(pki_env["dir"] / "server_ca.pem"))
    ctx.check_hostname = False
    if client is not None:
        ctx.load_cert_chain(str(pki_env["dir"] / f"{client}.pem"),
                            str(pki_env["dir"] / f"{client}.key"))
    return ctx


def _req(port, path, ctx, method="GET", payload=None, headers=None,
         scheme="https"):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(
        f"{scheme}://127.0.0.1:{port}{path}", data=data, method=method,
        headers={"Content-Type": "application/json", **(headers or {})})
    try:
        with urllib.request.urlopen(req, context=ctx, timeout=120) as r:
            return r.status, json.loads(r.read() or b"null"), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null"), dict(e.headers)


def _run_count(port, ctx, payload):
    """Submit the permission-sensitive count, poll, sum the partials."""
    code, body, _ = _req(port, "/query", ctx, "POST", payload)
    assert code == 202, body
    job = body["job_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        code, st, _ = _req(port, f"/query/{job}", ctx)
        assert code == 200, st
        if st["status"] in ("COMPLETE", "FAILED"):
            break
        time.sleep(0.2)
    assert st["status"] == "COMPLETE"
    req = urllib.request.Request(
        f"https://127.0.0.1:{port}/query/{job}/results")
    with urllib.request.urlopen(req, context=ctx, timeout=120) as r:
        rows = [json.loads(x) for x in r.read().splitlines() if x]
    return job, sum(r["n"] for r in rows)


Q = "select count(*) as n from lineitem"


def test_cert_principal_resolves_permissions(mtls_rest, pki_env):
    """Same query, two certificates → the cert's principal decides what
    is visible (all_access sees policy-hidden rows)."""
    _, n_reader = _run_count(mtls_rest.port, _ctx(pki_env, "reader"),
                             {"sql": Q})
    _, n_admin = _run_count(mtls_rest.port, _ctx(pki_env, "admin"),
                            {"sql": Q})
    assert n_admin > n_reader > 0


def test_request_json_principal_is_ignored(mtls_rest, pki_env):
    """Naming all_access in the body while presenting the reader cert
    must NOT escalate — and the job is recorded under the cert's
    principal."""
    ctx = _ctx(pki_env, "reader")
    job, n = _run_count(mtls_rest.port, ctx,
                        {"sql": Q, "principal": "all_access"})
    _, n_reader = _run_count(mtls_rest.port, ctx, {"sql": Q})
    assert n == n_reader
    code, body, _ = _req(mtls_rest.port, "/query", ctx)
    mine = {j["job_id"]: j["principal"] for j in body["jobs"]}
    assert mine[job] == "reader"


def test_no_certificate_is_401(mtls_rest, pki_env):
    code, body, _ = _req(mtls_rest.port, "/query", _ctx(pki_env), "POST",
                         {"sql": Q, "principal": "reader"})
    assert code == 401
    assert "certificate required" in body["error"]


def test_unregistered_fingerprint_is_403(mtls_rest, pki_env):
    """CA-signed (handshake passes) but not in the users table."""
    code, body, _ = _req(mtls_rest.port, "/query", _ctx(pki_env, "rogue"),
                         "POST", {"sql": Q})
    assert code == 403
    assert "unregistered" in body["error"]


def test_cross_principal_cancel_and_reads_are_403(mtls_rest, pki_env):
    """reader's job: admin's cert can neither cancel nor read it, and a
    query-string principal cannot override the cert (route.rs:62-68)."""
    reader, admin = _ctx(pki_env, "reader"), _ctx(pki_env, "admin")
    code, body, _ = _req(mtls_rest.port, "/query", reader, "POST",
                         {"sql": Q})
    job = body["job_id"]
    code, body, _ = _req(
        mtls_rest.port, f"/query/{job}?principal=reader", admin, "DELETE")
    assert code == 403
    for path in (f"/query/{job}", f"/query/{job}/results"):
        code, _, _ = _req(mtls_rest.port, path, admin)
        assert code == 403
    # the owner can cancel (query-string principal ignored, cert rules)
    code, st, _ = _req(
        mtls_rest.port, f"/query/{job}?principal=all_access", reader,
        "DELETE")
    assert code == 200


def test_relay_identity_delegates_origin_principal(mtls_rest, pki_env):
    """A fingerprint enrolled in x509_relays forwards on behalf of the
    origin principal named in the request (the REST face of the Flight
    delegation — ``query/route.rs:167`` → ``utils.rs:62-126``): the job
    runs and reads back under the ORIGIN's permission view."""
    peer = _ctx(pki_env, "peer")

    def via_relay(origin):
        code, body, _ = _req(mtls_rest.port, "/query", peer, "POST",
                             {"sql": Q, "principal": origin})
        assert code == 202, body
        job = body["job_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            code, st, _ = _req(
                mtls_rest.port, f"/query/{job}?principal={origin}", peer)
            assert code == 200, st
            if st["status"] in ("COMPLETE", "FAILED"):
                break
            time.sleep(0.2)
        assert st["status"] == "COMPLETE"
        req = urllib.request.Request(
            f"https://127.0.0.1:{mtls_rest.port}/query/{job}/results"
            f"?principal={origin}")
        with urllib.request.urlopen(req, context=peer, timeout=120) as r:
            rows = [json.loads(x) for x in r.read().splitlines() if x]
        return job, sum(r["n"] for r in rows)

    _, n_reader_direct = _run_count(mtls_rest.port,
                                    _ctx(pki_env, "reader"), {"sql": Q})
    _, n_admin_direct = _run_count(mtls_rest.port,
                                   _ctx(pki_env, "admin"), {"sql": Q})
    job_a, n_admin = via_relay("all_access")
    _, n_reader = via_relay("reader")
    assert n_admin == n_admin_direct
    assert n_reader == n_reader_direct
    # the job is recorded under the ORIGIN principal
    code, body, _ = _req(mtls_rest.port,
                         "/query?principal=all_access", peer)
    assert job_a in {j["job_id"] for j in body["jobs"]}
    assert all(j["principal"] == "all_access" for j in body["jobs"])


def test_relay_without_origin_principal_is_401(mtls_rest, pki_env):
    """All-or-none origination (``utils.rs:116-124``): a relay hop naming
    no origin principal is malformed — submit, poll, and results all
    refuse rather than default."""
    peer = _ctx(pki_env, "peer")
    code, body, _ = _req(mtls_rest.port, "/query", peer, "POST",
                         {"sql": Q})
    assert code == 401
    assert "no origin principal" in body["error"]
    # a delegated job polled WITHOUT the origin principal refuses too,
    # and a wrong origin is a cross-principal 403
    code, body, _ = _req(mtls_rest.port, "/query", peer, "POST",
                         {"sql": Q, "principal": "reader"})
    job = body["job_id"]
    code, _, _ = _req(mtls_rest.port, f"/query/{job}", peer)
    assert code == 401
    code, _, _ = _req(mtls_rest.port,
                      f"/query/{job}?principal=all_access", peer)
    assert code == 403


def test_user_and_relay_enrollment_disjoint(spark, demo_web, pki_env,
                                            users):
    """One fingerprint cannot be both a user and a relay."""
    fp = pki.fingerprint_der(_der(pki_env["reader"]))
    with pytest.raises(ValueError, match="both"):
        RestRelayServer(spark, demo_web, "na_us",
                        tls=pki_env["tls"], mtls_ca=pki_env["ca_pem"],
                        x509_users=users,
                        x509_relays=[pki.X509User(fp, principal="edge")])


def test_admin_routes_keyed_on_is_admin_attribute(mtls_rest, pki_env):
    """No admin token configured: the is_admin certificate attribute is
    the admin credential (user.rs:17-28); a plain principal is refused."""
    code, _, _ = _req(mtls_rest.port, "/admin/config", _ctx(pki_env,
                                                            "reader"))
    assert code == 403
    req = urllib.request.Request(
        f"https://127.0.0.1:{mtls_rest.port}/admin/config")
    with urllib.request.urlopen(req, context=_ctx(pki_env, "admin"),
                                timeout=60) as r:
        assert r.status == 200
        assert b"kind:" in r.read()


# -- proxy cert-header face (rest_server/src/utils.rs:8-38) -----------------

@pytest.fixture(scope="module")
def header_rest(spark, demo_web, pki_env, users):
    s = RestRelayServer(spark, demo_web, "na_us",
                        x509_users=users,
                        cert_header="x-client-cert").start()
    yield s
    s.shutdown()


def test_cert_header_mode_roundtrips(header_rest, pki_env):
    """Urlencoded PEM in the configured header (as a TLS-terminating
    proxy would inject) resolves the principal; body claims are ignored;
    no header → 401; junk header → 400."""
    hdr = {"x-client-cert": quote(pki_env["reader"].decode())}
    code, body, _ = _req(header_rest.port, "/query", None, "POST",
                         {"sql": Q, "principal": "all_access"},
                         headers=hdr, scheme="http")
    assert code == 202
    job = body["job_id"]
    code, body, _ = _req(header_rest.port, "/query", None, headers=hdr,
                         scheme="http")
    assert {j["job_id"]: j["principal"] for j in body["jobs"]}[job] \
        == "reader"
    code, body, _ = _req(header_rest.port, "/query", None, "POST",
                         {"sql": Q}, scheme="http")
    assert code == 401
    code, body, _ = _req(header_rest.port, "/query", None, "POST",
                         {"sql": Q},
                         headers={"x-client-cert": "not-a-pem"},
                         scheme="http")
    assert code == 400


# -- streamed results (query/utils.rs:81-169) -------------------------------

def test_results_stream_is_chunked_not_buffered(spark, demo_web):
    """The results route must emit rows as the iterator yields them —
    chunked transfer, no driver-side join of the full result. The probe:
    a generator that BLOCKS after the first row; the first NDJSON line
    must reach the client while the generator is still blocked (a
    buffer-then-send implementation deadlocks here and times out)."""
    s = RestRelayServer(spark, demo_web, "na_us").start()
    try:
        code = None
        # a real (tiny) job so status says COMPLETE
        req = urllib.request.Request(
            f"http://127.0.0.1:{s.port}/query",
            data=json.dumps({"sql": "select count(*) as n from lineitem",
                             "mode": "engine"}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            job = json.loads(r.read())["job_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{s.port}/query/{job}",
                    timeout=120) as r:
                if json.loads(r.read())["status"] == "COMPLETE":
                    break
            time.sleep(0.2)

        release = threading.Event()
        exhausted = threading.Event()

        def slow_ndjson(job_id, allow_partial=False):
            yield '{"row": 1}'
            assert release.wait(timeout=60), "client never released"
            for i in range(2, 5):
                yield json.dumps({"row": i})
            exhausted.set()

        s.manager.result_ndjson = slow_ndjson
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{s.port}/query/{job}/results", timeout=60)
        assert r.headers.get("Transfer-Encoding") == "chunked"
        assert r.headers.get("Content-Length") is None
        first = r.readline()
        assert json.loads(first) == {"row": 1}
        # first line arrived while the generator is still blocked ⇒ the
        # server streamed it; a full-result join could not have produced
        # bytes yet
        assert not exhausted.is_set()
        release.set()
        rest = [json.loads(x) for x in r.read().splitlines() if x]
        assert rest == [{"row": i} for i in range(2, 5)]
        assert exhausted.is_set()
    finally:
        s.shutdown()


def test_combined_cert_faces_rejected(spark, demo_web, pki_env, users):
    """mtls_ca + cert_header on one listener is refused outright: a
    certless direct-TLS caller could otherwise forge the proxy header
    with anyone's PUBLIC certificate and impersonate them."""
    with pytest.raises(ValueError, match="mutually exclusive"):
        RestRelayServer(spark, demo_web, "na_us",
                        tls=pki_env["tls"], mtls_ca=pki_env["ca_pem"],
                        x509_users=users, cert_header="x-client-cert")


def test_keepalive_connection_survives_unread_body_errors(spark, demo_web):
    """HTTP/1.1 keep-alive: an early-return response (403 admin, 404
    route) must still drain the request body, or the leftover bytes
    desynchronize the persistent connection and corrupt the NEXT
    request on it."""
    import http.client
    s = RestRelayServer(spark, demo_web, "na_us").start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", s.port, timeout=60)
        body = b"kind: not-yaml-that-matters\n" * 50
        # 403 before the body was ever needed
        c.request("POST", "/admin/apply", body=body,
                  headers={"Content-Type": "application/yaml"})
        assert c.getresponse().read() is not None
        # 404 route with a body
        c.request("POST", "/nope", body=b'{"x": 1}')
        r = c.getresponse()
        assert r.status == 404 and r.read()
        # the SAME socket must still serve a clean request
        c.request("GET", "/query")
        r = c.getresponse()
        assert r.status == 200
        assert "jobs" in json.loads(r.read())
    finally:
        s.shutdown()


def test_http10_results_are_not_chunked(spark, demo_web):
    """An HTTP/1.0 client cannot parse chunked framing (RFC 7230
    §3.3.1): the results route must fall back to a close-delimited
    stream with no chunk-size lines in the body."""
    import socket
    s = RestRelayServer(spark, demo_web, "na_us").start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{s.port}/query",
            data=json.dumps({"sql": "select count(*) as n from lineitem",
                             "mode": "engine"}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            job = json.loads(r.read())["job_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{s.port}/query/{job}",
                    timeout=120) as r:
                if json.loads(r.read())["status"] == "COMPLETE":
                    break
            time.sleep(0.2)
        sock = socket.create_connection(("127.0.0.1", s.port), timeout=60)
        sock.sendall(f"GET /query/{job}/results HTTP/1.0\r\n"
                     f"Host: x\r\n\r\n".encode())
        buf = b""
        while True:
            got = sock.recv(65536)
            if not got:
                break
            buf += got
        sock.close()
        head, _, body = buf.partition(b"\r\n\r\n")
        assert b"Transfer-Encoding" not in head
        assert b"Connection: close" in head
        rows = [json.loads(x) for x in body.splitlines() if x]
        assert rows and all("n" in r for r in rows)
    finally:
        s.shutdown()


def test_relayctl_drives_mtls_identity_relay(mtls_rest, pki_env,
                                             monkeypatch, capsys):
    """The CLI speaks the reference env contract
    (relayctl/src/main.rs:30-56): CLIENT_CERT_FILE + CLIENT_KEY_FILE
    present the client identity at the TLS handshake, so a
    transport-identity relay serves relayctl as the cert's principal;
    mismatched env (cert without key) exits with a clear error."""
    import importlib
    import sys as _sys
    d = pki_env["dir"]
    monkeypatch.setenv("RELAY_ENDPOINT",
                       f"https://127.0.0.1:{mtls_rest.port}")
    monkeypatch.setenv("CA_CERT_FILE", str(d / "server_ca.pem"))
    monkeypatch.setenv("CLIENT_CERT_FILE", str(d / "reader.pem"))
    monkeypatch.setenv("CLIENT_KEY_FILE", str(d / "reader.key"))
    _sys.path.insert(0, "tools")
    try:
        ctl = importlib.import_module("relayctl")
        rc = ctl.main(["query", Q, "--mode", "engine",
                       "--principal", "all_access"])  # claim ignored
        assert rc == 0
        rows = [json.loads(x) for x in capsys.readouterr().out.splitlines()
                if x]
        n = sum(r["n"] for r in rows)
        _, n_reader = _run_count(mtls_rest.port, _ctx(pki_env, "reader"),
                                 {"sql": Q})
        assert n == n_reader  # served as the CERT's principal
        monkeypatch.delenv("CLIENT_KEY_FILE")
        with pytest.raises(SystemExit, match="together"):
            ctl.main(["query", Q])
    finally:
        _sys.path.remove("tools")
