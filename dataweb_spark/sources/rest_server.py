"""Thin HTTP entry point over the async jobs layer — the rest_server analog.

Routes (``rest_server/src/query/route.rs:149-268`` / ``:57-147``):

* ``POST /query``          body ``{"sql": ..., "principal": ..., "mode": ...}``
                           → ``202 {"job_id": ...}`` (enqueued)
* ``GET  /query/{id}``     → job status JSON (the poll target); add
                           ``?allow_partial=true`` to mark partial reads OK
* ``GET  /query/{id}/results[?allow_partial=true]``
                           → ``application/x-ndjson`` stream, one record per
                           row with ``_relay_metadata_`` injected — or
                           ``409`` + status JSON while tasks are pending
                           (unless ``allow_partial``), matching the
                           reference's "status until everything lands"
                           polling contract.
* ``POST /admin/apply``    body: YAML config documents (the kinds
                           ``catalog/loader.py`` parses) — upserted into the
                           LIVE relay catalog; the next query sees the new
                           mapping. The ``relayctl apply -f`` server side
                           (``rest_server/src/admin/utils.rs:28-120``).
                           Guarded by the ``X-Admin-Token`` header (the
                           in-container stand-in for the reference's
                           ``is_admin`` x509 principal attribute,
                           ``core/src/model/user.rs:17-28``) — or, with
                           transport identity on, a certificate whose
                           registered user carries ``is_admin``; disabled
                           entirely when neither is configured.
* ``GET  /admin/config``   the LIVE catalog exported as YAML config
                           documents (``relayctl get`` analog) — apply ∘
                           export round-trips; same admin-token guard.

Transport-bound identity (``x509_users=...``): the reference resolves the
REST principal from the client x509 certificate — direct TLS
(``rest_server/src/lib.rs:48-71`` ``get_client_cert``) or a
TLS-terminating-proxy certificate header (urlencoded PEM,
``rest_server/src/utils.rs:8-38``, used at ``query/route.rs:62-68``) — and
IGNORES any identity claimed in the request body. This server does the
same once ``x509_users`` is set: the effective principal is the SHA-256
fingerprint lookup of the presented certificate (handshake-verified
against ``mtls_ca`` on the direct-TLS face; proxy-attested on the
``cert_header`` face — one face per listener, the combination is
rejected so a certless caller can never forge the header with someone's
public certificate), request-JSON / query-string principals are
ignored for USER identities, no certificate → 401, an unregistered one
→ 403, and status/results/cancel are only served to the job's own
principal — exactly the contract the Flight face already enforces
(``test_x509_auth.py``). ``x509_relays`` enrolls trusted PEER RELAY
fingerprints whose requests MUST name the origin principal they forward
for (and get exactly that principal's view) — the REST face of the
Flight delegation, mirroring the reference's shared origination check
(``query/route.rs:167`` → ``core/src/execute/utils.rs:62-126``).
Without ``x509_users`` the caller-supplied principal is trusted — dev
mode only, like the Flight face's no-auth mode.

Results are streamed with chunked transfer encoding straight off
``toLocalIterator`` — the relay process never materializes a full result
(the reference interleaves record-batch streams the same way,
``rest_server/src/query/utils.rs:81-169``).

Built on stdlib ``http.server`` (nothing to install); each request is
handled on its own thread (``ThreadingHTTPServer``) and execution is the
``JobManager`` thread pool — the HTTP layer never blocks on Spark actions.
A production deployment would put any WSGI front on the same JobManager;
this shim exists so network clients can drive the engine end-to-end.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from dataweb_spark.catalog.model import Web
from dataweb_spark.jobs.manager import (
    COMPLETE,
    FAILED,
    JobManager,
    JobNotReady,
)
from dataweb_spark.plans.validation import ValidationError

_QUERY = re.compile(r"^/query/([0-9a-f]+)$")
_RESULTS = re.compile(r"^/query/([0-9a-f]+)/results$")


class _AuthError(Exception):
    """Transport-identity failure → (http status, message)."""

    def __init__(self, code: int, msg: str):
        super().__init__(msg)
        self.code = code


class RestRelayServer:
    """HTTP facade over a :class:`JobManager`. ``start()`` → ``.port``.

    ``x509_users`` turns on transport-bound identity (see module
    docstring): an iterable of :class:`pki.X509User` or a dict keyed by
    fingerprint (``RelayCatalog.users``). ``mtls_ca`` (CA cert PEM)
    makes the TLS listener request and handshake-verify client
    certificates — the direct-TLS face; ``cert_header`` names a header
    carrying a urlencoded client-cert PEM attested by a TLS-terminating
    proxy — the reference's ``utils.rs:8-38`` mode. The two faces are
    MUTUALLY EXCLUSIVE per listener (a shared listener would let a
    certless direct-TLS caller forge the header with anyone's public
    certificate); run one server per face over a shared job store if
    both are needed."""

    def __init__(self, spark: SparkSession, web: Web, relay_name: str,
                 host: str = "127.0.0.1", port: int = 0,
                 admin_token: str | None = None,
                 tls: tuple[bytes, bytes] | None = None,
                 mtls_ca: bytes | None = None,
                 x509_users=None,
                 x509_relays=None,
                 cert_header: str | None = None):
        self.manager = JobManager(spark, web, relay_name)
        self.web = web
        self.relay_name = relay_name
        self._admin_token = admin_token
        self._cert_header = cert_header
        # fingerprint → (principal, is_admin); table merge + user/relay
        # disjointness live in ONE pki helper shared with the Flight face
        # so the two transports cannot drift on what the tables mean.
        # ``x509_relays`` enrolls trusted PEER RELAYS by fingerprint —
        # the REST face of the same delegation the Flight face runs
        # (``verify_query_origination_information`` guards the reference's
        # REST route too, ``rest_server/src/query/route.rs:167``): a
        # request under a relay identity must NAME the origin principal
        # and gets that principal's view; user identities keep ignoring
        # claimed principals.
        self._by_fp: dict[str, tuple[str, bool]] | None = None
        self._relay_principals: frozenset[str] = frozenset()
        if x509_users is not None or x509_relays is not None:
            from dataweb_spark.sources.pki import merge_identity_tables
            merged, self._relay_principals = merge_identity_tables(
                x509_users, x509_relays)
            self._by_fp = {
                fp: (u.principal,
                     u.principal not in self._relay_principals
                     and bool(u.attributes.get("is_admin", False)))
                for fp, u in merged.items()}
        if mtls_ca is not None and tls is None:
            raise ValueError("mtls_ca requires tls (an HTTPS listener)")
        if mtls_ca is not None and cert_header is not None:
            # One listener must expose ONE certificate face. A shared
            # listener would let a certless direct-TLS caller FORGE the
            # proxy header with anyone's public certificate PEM and
            # impersonate them — the header is only trustworthy when
            # every request provably traversed the proxy, which a
            # combined listener cannot guarantee. Run two servers over
            # one JobManager-backed web if both faces are needed.
            raise ValueError(
                "mtls_ca and cert_header are mutually exclusive per "
                "listener: a direct-TLS caller could forge the proxy "
                "header (certificates are public material)")
        if self._by_fp is not None and mtls_ca is None and cert_header is None:
            raise ValueError(
                "x509_users needs a transport face: mtls_ca (direct TLS) "
                "or cert_header (TLS-terminating proxy)")
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # chunked responses (streamed results) require HTTP/1.1;
            # every other response carries Content-Length so persistent
            # connections stay in sync
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # quiet test output
                pass

            # -- transport identity ------------------------------------

            def _transport_der(self) -> bytes | None:
                """DER client certificate from the transport: the
                handshake-verified TLS peer cert first (lib.rs:48-71),
                else the proxy header's urlencoded PEM (utils.rs:8-38)."""
                getpeercert = getattr(self.connection, "getpeercert", None)
                if getpeercert is not None:
                    der = getpeercert(binary_form=True)
                    if der:
                        return der
                if outer._cert_header:
                    raw = self.headers.get(outer._cert_header)
                    if raw:
                        from urllib.parse import unquote

                        from cryptography import x509 as cx509
                        try:
                            cert = cx509.load_pem_x509_certificate(
                                unquote(raw).encode("utf-8"))
                        except ValueError as e:
                            raise _AuthError(
                                400, f"bad {outer._cert_header} header: {e}")
                        from cryptography.hazmat.primitives.serialization \
                            import Encoding
                        return cert.public_bytes(Encoding.DER)
                return None

            def _principal(self, claimed: str | None) -> str | None:
                """Effective principal. Transport mode: the certificate
                decides, a claimed identity is ignored (route.rs:62-68);
                no cert → 401, unregistered → 403. Dev mode (no
                x509_users): trust the caller's claim."""
                if outer._by_fp is None:
                    return claimed
                der = self._transport_der()
                if der is None:
                    raise _AuthError(401, "client certificate required")
                from dataweb_spark.sources.pki import fingerprint_der
                fp = fingerprint_der(der)
                if fp not in outer._by_fp:
                    raise _AuthError(
                        403, f"unregistered certificate fingerprint "
                             f"{fp[:16]}…")
                principal = outer._by_fp[fp][0]
                if principal in outer._relay_principals:
                    # Trusted-relay delegation (``utils.rs:70-94``): the
                    # claimed identity IS the origin principal the peer
                    # already authenticated; all-or-none — a relay hop
                    # naming none is malformed (``utils.rs:116-124``).
                    if claimed is None:
                        raise _AuthError(
                            401, f"peer relay {principal!r} forwarded "
                                 f"no origin principal")
                    return claimed
                return principal

            def _is_admin(self) -> bool:
                """Admin = valid X-Admin-Token, or (transport mode) a
                certificate whose registered user carries is_admin —
                the reference's ``is_admin`` x509 attribute."""
                if (outer._admin_token is not None
                        and self.headers.get("X-Admin-Token")
                        == outer._admin_token):
                    return True
                if outer._by_fp is not None:
                    try:
                        der = self._transport_der()
                    except _AuthError:
                        return False
                    if der is not None:
                        from dataweb_spark.sources.pki import fingerprint_der
                        u = outer._by_fp.get(fingerprint_der(der))
                        return u is not None and u[1]
                return False

            def _own_job(self, job_id: str,
                         claimed: str | None = None) -> None:
                """Transport mode: a job is visible only to the principal
                that submitted it (the do_get origin-user re-check,
                ``flight_server/src/flight.rs:396-447``). ``claimed`` is
                the query-string origin principal — ignored for user
                identities, required and re-checked for relay ones."""
                if outer._by_fp is None:
                    return
                st = outer.manager.status(job_id)   # KeyError → 404
                me = self._principal(claimed)
                if st["principal"] != me:
                    raise _AuthError(
                        403, f"job {job_id} belongs to another principal")

            def _read_body(self) -> bytes:
                """Read (and thereby drain) the request body. MUST run
                before any response on every request that may carry a
                body: under HTTP/1.1 keep-alive an unread body would be
                parsed as the NEXT request line, desynchronizing the
                connection."""
                n = int(self.headers.get("Content-Length", "0"))
                return self.rfile.read(n) if n else b""

            def _send(self, code: int, payload, content_type: str
                      = "application/json") -> None:
                body = (payload if isinstance(payload, bytes)
                        else json.dumps(payload).encode("utf-8"))
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                raw = self._read_body()   # drain BEFORE any early return
                path = urlparse(self.path).path
                if path == "/admin/apply":
                    return self._admin_apply(raw)
                if path == "/admin/diff":
                    return self._admin_apply(raw, dry_run=True)
                if path == "/explain":
                    return self._explain(raw)
                if path != "/query":
                    return self._send(404, {"error": "not found"})
                try:
                    req = json.loads(raw.decode("utf-8"))
                    job_id = outer.manager.submit(
                        req["sql"], self._principal(req.get("principal")),
                        req.get("mode", "template"))
                except _AuthError as e:
                    return self._send(e.code, {"error": str(e)})
                except (ValidationError, ValueError, KeyError) as e:
                    return self._send(400, {"error": str(e)})
                self._send(202, {"job_id": job_id})

            def _explain(self, raw: bytes) -> None:
                """POST /explain {sql, principal?} → per-source resolution
                rows; metadata-only, no scan, no peer contact."""
                try:
                    req = json.loads(raw.decode("utf-8"))
                    df = outer.manager.gateway.explain(
                        req["sql"], self._principal(req.get("principal")))
                    # collect is fine HERE: explain rows are per-source
                    # resolution metadata, bounded by the mapping count
                    rows = [r.asDict() for r in df.collect()]
                except _AuthError as e:
                    return self._send(e.code, {"error": str(e)})
                except (ValidationError, ValueError, KeyError) as e:
                    return self._send(400, {"error": str(e)})
                self._send(200, {"sources": rows})

            def _admin_apply(self, raw: bytes, dry_run: bool = False
                             ) -> None:
                import yaml

                from dataweb_spark.catalog.loader import (
                    apply_config_documents,
                    diff_config_documents,
                )
                if outer._admin_token is None and outer._by_fp is None:
                    return self._send(403, {"error": "admin disabled"})
                if not self._is_admin():
                    return self._send(403, {"error": "admin denied"})
                try:
                    docs = list(yaml.safe_load_all(raw.decode("utf-8")))
                    relay = outer.web.relay(outer.relay_name)
                    if dry_run:  # /admin/diff: live catalog untouched
                        return self._send(
                            200, {"diff": diff_config_documents(relay,
                                                                docs)})
                    applied = apply_config_documents(relay, docs)
                    # post-apply referential check: dangling references
                    # are reported as warnings (the apply stands — the
                    # missing half may arrive in the next document, same
                    # as the reference's lazy resolution), scoped to this
                    # relay so cross-relay webs don't warn spuriously
                    from dataweb_spark.catalog.loader import validate_web
                    problems = [p for p in validate_web(outer.web)
                                if f"relay {outer.relay_name!r}" in p]
                except Exception as e:  # bad YAML / unknown kind / bad doc
                    return self._send(400, {"error": str(e)})
                self._send(200, {"applied": applied,
                                 "warnings": problems})

            def do_DELETE(self):
                """DELETE /query/{id}: best-effort cancel. Queued tasks
                never start; running stages are interrupted; finished work
                keeps its results (fetch with allow_partial=true)."""
                self._read_body()   # keep-alive: drain any body
                url = urlparse(self.path)
                m = _QUERY.match(url.path)
                if not m:
                    return self._send(404, {"error": "not found"})
                try:
                    principal = self._principal(
                        parse_qs(url.query).get("principal", [None])[0])
                    st = outer.manager.cancel(m.group(1), principal)
                except _AuthError as e:
                    return self._send(e.code, {"error": str(e)})
                except KeyError:
                    return self._send(404, {"error": "unknown job"})
                except PermissionError as e:
                    return self._send(403, {"error": str(e)})
                self._send(200, st)

            def do_GET(self):
                self._read_body()   # keep-alive: drain any body
                url = urlparse(self.path)
                qs = parse_qs(url.query)
                partial = qs.get(
                    "allow_partial", ["false"])[0].lower() == "true"
                claimed = qs.get("principal", [None])[0]
                m = _RESULTS.match(url.path)
                if m:
                    try:
                        self._own_job(m.group(1), claimed)
                    except _AuthError as e:
                        return self._send(e.code, {"error": str(e)})
                    except KeyError:
                        return self._send(404, {"error": "unknown job"})
                    return self._results(m.group(1), partial)
                m = _QUERY.match(url.path)
                if m:
                    try:
                        self._own_job(m.group(1), claimed)
                        return self._send(200, outer.manager.status(m.group(1)))
                    except _AuthError as e:
                        return self._send(e.code, {"error": str(e)})
                    except KeyError:
                        return self._send(404, {"error": "unknown job"})
                if url.path == "/query":
                    jobs = outer.manager.list_jobs()
                    if outer._by_fp is not None:
                        try:
                            me = self._principal(claimed)
                        except _AuthError as e:
                            return self._send(e.code, {"error": str(e)})
                        jobs = [j for j in jobs if j["principal"] == me]
                    return self._send(200, {"jobs": jobs})
                if url.path == "/admin/config":
                    return self._admin_config()
                self._send(404, {"error": "not found"})

            def _admin_config(self) -> None:
                """``relayctl get/export`` over HTTP: the live catalog as
                YAML config documents — what you apply is what you get
                back, including every /admin/apply mutation since start.
                Same guard as apply (the catalog embeds permission SQL and
                user registrations)."""
                import yaml

                from dataweb_spark.catalog.loader import relay_documents
                if outer._admin_token is None and outer._by_fp is None:
                    return self._send(403, {"error": "admin disabled"})
                if not self._is_admin():
                    return self._send(403, {"error": "admin denied"})
                docs = relay_documents(outer.web.relay(outer.relay_name))
                body = yaml.safe_dump_all(docs, sort_keys=False)
                self._send(200, body.encode("utf-8"),
                           content_type="application/yaml")

            def _results(self, job_id: str, partial: bool) -> None:
                try:
                    st = outer.manager.status(job_id)
                except KeyError:
                    return self._send(404, {"error": "unknown job"})
                if st["status"] not in (COMPLETE, FAILED) and not partial:
                    # poll contract: status, not data, until it all lands
                    return self._send(409, st)
                lines = outer.manager.result_ndjson(
                    job_id, allow_partial=partial)
                try:
                    # the generator touches the job store on first pull —
                    # surface JobNotReady as 409 before committing to 200
                    first = next(lines, None)
                except JobNotReady as e:
                    return self._send(409, {"error": str(e), **st})
                # Streamed straight off toLocalIterator: the full result
                # is NEVER joined into one driver-side string/list (a
                # SELECT *-shaped job would OOM the relay otherwise — the
                # reference streams record batches the same way,
                # query/utils.rs:81-169). Task parquet stays the durable
                # copy; this loop only serializes rows already landed.
                # HTTP/1.1 clients get chunked framing; an HTTP/1.0
                # client cannot parse chunked (RFC 7230 §3.3.1), so it
                # gets the same incremental stream close-delimited.
                http10 = self.request_version == "HTTP/1.0"
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                if http10:
                    self.send_header("Connection", "close")
                    self.close_connection = True
                else:
                    self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(data: bytes) -> None:
                    if http10:
                        self.wfile.write(data)
                        return
                    self.wfile.write(b"%x\r\n" % len(data))
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")

                if first is not None:
                    chunk(first.encode("utf-8") + b"\n")
                    for line in lines:
                        chunk(line.encode("utf-8") + b"\n")
                if not http10:
                    self.wfile.write(b"0\r\n\r\n")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.tls = tls is not None
        if tls is not None:
            # HTTPS like the reference's rest_server (its integration tests
            # hit https://localhost:844x): wrap the listening socket with
            # the same PEM identity shape the gRPC surface uses
            # (pki.generate_tls_identity); clients verify against the cert.
            import ssl
            import tempfile
            cert_pem, key_pem = tls
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            with tempfile.NamedTemporaryFile(suffix=".pem") as cf, \
                    tempfile.NamedTemporaryFile(suffix=".pem") as kf:
                cf.write(cert_pem); cf.flush()
                kf.write(key_pem); kf.flush()
                ctx.load_cert_chain(cf.name, kf.name)
            if mtls_ca is not None:
                # direct-TLS client-cert face (lib.rs:48-71): request a
                # client certificate and handshake-verify it against the
                # CA. OPTIONAL, not REQUIRED, so a certless caller gets a
                # clean 401 from _principal instead of an opaque
                # mid-handshake abort (the header face never coexists on
                # this listener — rejected in __init__).
                ctx.verify_mode = ssl.CERT_OPTIONAL
                ctx.load_verify_locations(cadata=mtls_ca.decode("utf-8"))
            self._httpd.socket = ctx.wrap_socket(self._httpd.socket,
                                                 server_side=True)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "RestRelayServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self.manager.shutdown()
