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
                           ``core/src/model/user.rs:17-28``); disabled
                           entirely when the server has no admin token.
* ``GET  /admin/config``   the LIVE catalog exported as YAML config
                           documents (``relayctl get`` analog) — apply ∘
                           export round-trips; same admin-token guard.

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


class RestRelayServer:
    """HTTP facade over a :class:`JobManager`. ``start()`` → ``.port``."""

    def __init__(self, spark: SparkSession, web: Web, relay_name: str,
                 host: str = "127.0.0.1", port: int = 0,
                 admin_token: str | None = None,
                 tls: tuple[bytes, bytes] | None = None):
        self.manager = JobManager(spark, web, relay_name)
        self.web = web
        self.relay_name = relay_name
        self._admin_token = admin_token
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet test output
                pass

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
                path = urlparse(self.path).path
                if path == "/admin/apply":
                    return self._admin_apply()
                if path == "/admin/diff":
                    return self._admin_apply(dry_run=True)
                if path == "/explain":
                    return self._explain()
                if path != "/query":
                    return self._send(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n).decode("utf-8"))
                    job_id = outer.manager.submit(
                        req["sql"], req.get("principal"),
                        req.get("mode", "template"))
                except (ValidationError, ValueError, KeyError) as e:
                    return self._send(400, {"error": str(e)})
                self._send(202, {"job_id": job_id})

            def _explain(self) -> None:
                """POST /explain {sql, principal?} → per-source resolution
                rows; metadata-only, no scan, no peer contact."""
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n).decode("utf-8"))
                    df = outer.manager.gateway.explain(
                        req["sql"], req.get("principal"))
                    rows = [r.asDict() for r in df.collect()]
                except (ValidationError, ValueError, KeyError) as e:
                    return self._send(400, {"error": str(e)})
                self._send(200, {"sources": rows})

            def _admin_apply(self, dry_run: bool = False) -> None:
                import yaml

                from dataweb_spark.catalog.loader import (
                    apply_config_documents,
                    diff_config_documents,
                )
                if outer._admin_token is None:
                    return self._send(403, {"error": "admin disabled"})
                if self.headers.get("X-Admin-Token") != outer._admin_token:
                    return self._send(403, {"error": "bad admin token"})
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(n).decode("utf-8")
                    docs = list(yaml.safe_load_all(body))
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
                url = urlparse(self.path)
                m = _QUERY.match(url.path)
                if not m:
                    return self._send(404, {"error": "not found"})
                principal = parse_qs(url.query).get(
                    "principal", [None])[0]
                try:
                    st = outer.manager.cancel(m.group(1), principal)
                except KeyError:
                    return self._send(404, {"error": "unknown job"})
                except PermissionError as e:
                    return self._send(403, {"error": str(e)})
                self._send(200, st)

            def do_GET(self):
                url = urlparse(self.path)
                partial = parse_qs(url.query).get(
                    "allow_partial", ["false"])[0].lower() == "true"
                m = _RESULTS.match(url.path)
                if m:
                    return self._results(m.group(1), partial)
                m = _QUERY.match(url.path)
                if m:
                    try:
                        return self._send(200, outer.manager.status(m.group(1)))
                    except KeyError:
                        return self._send(404, {"error": "unknown job"})
                if url.path == "/query":
                    return self._send(
                        200, {"jobs": outer.manager.list_jobs()})
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
                if outer._admin_token is None:
                    return self._send(403, {"error": "admin disabled"})
                if self.headers.get("X-Admin-Token") != outer._admin_token:
                    return self._send(403, {"error": "bad admin token"})
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
                try:
                    lines = outer.manager.result_ndjson(
                        job_id, allow_partial=partial)
                    body = ("\n".join(lines) + "\n").encode("utf-8")
                except JobNotReady as e:
                    return self._send(409, {"error": str(e), **st})
                self._send(200, body, content_type="application/x-ndjson")

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
