#!/usr/bin/env python
"""relayctl — CLI client for a running relay's REST surface.

Counterpart of the reference's ``relayctl`` binary (``relayctl/src/main.rs``,
whose only subcommand is ``apply``), extended with the rest of the REST
surface this repo serves:

    relayctl apply -f <file-or-dir>      POST /admin/apply (YAML upsert)
    relayctl get                         GET  /admin/config (catalog as YAML)
    relayctl query "<sql>" [--mode ...]  POST /query → poll → NDJSON
    relayctl cancel <job_id>             DELETE /query/{id}
    relayctl status <job_id>             GET  /query/{id}

Environment (same contract as the reference binary,
``relayctl/src/main.rs:30-56``):
    RELAY_ENDPOINT    e.g. https://127.0.0.1:8443 (required unless
                      --endpoint)
    CA_CERT_FILE      root cert for HTTPS verification (optional on
                      http://)
    CLIENT_CERT_FILE  client certificate PEM — presented at the TLS
    CLIENT_KEY_FILE   handshake so a transport-identity relay
                      (``x509_users``/``mtls_ca``) resolves the
                      principal from the cert; both or neither
    ADMIN_TOKEN       sent as X-Admin-Token on admin routes

Directories given to ``apply`` are walked recursively; every ``*.yaml`` /
``*.yml`` file is POSTed in sorted path order (the server resolves apply
precedence per document kind, ``process.rs:parse_directory`` analog).
"""

from __future__ import annotations

import argparse
import json
import os
import ssl
import sys
import time
import urllib.error
import urllib.request


_CTX_CACHE: dict[tuple, ssl.SSLContext | None] = {}


def _context(endpoint: str) -> ssl.SSLContext | None:
    # Built once per (endpoint, identity) and cached: a polling query
    # otherwise re-reads the CA and client cert/key files every 0.2 s
    # iteration. Keyed on env values AND file mtimes, so an in-process
    # env change (tests) or an in-place cert ROTATION (long-lived
    # importers) rebuilds instead of serving a stale identity — one
    # stat per file per request instead of a read+parse.
    cafile = os.environ.get("CA_CERT_FILE")
    cert = os.environ.get("CLIENT_CERT_FILE")
    key = os.environ.get("CLIENT_KEY_FILE")

    def _ver(p):
        try:
            return (p, os.path.getmtime(p)) if p else None
        except OSError:
            return (p, None)

    cache_key = (endpoint, _ver(cafile), _ver(cert), _ver(key))
    if cache_key in _CTX_CACHE:
        return _CTX_CACHE[cache_key]
    if not endpoint.startswith("https://"):
        _CTX_CACHE[cache_key] = None
        return None
    if bool(cert) != bool(key):
        raise SystemExit(
            "CLIENT_CERT_FILE and CLIENT_KEY_FILE must be set together")
    ctx = ssl.create_default_context(cafile=cafile)
    if cert and key:
        ctx.load_cert_chain(cert, key)
    _CTX_CACHE[cache_key] = ctx
    return ctx


def _call(endpoint: str, method: str, path: str, body: bytes | None = None,
          headers: dict[str, str] | None = None) -> tuple[int, bytes]:
    req = urllib.request.Request(endpoint + path, data=body, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, context=_context(endpoint)) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _admin_headers() -> dict[str, str]:
    h = {"Content-Type": "application/yaml"}
    token = os.environ.get("ADMIN_TOKEN")
    if token:
        h["X-Admin-Token"] = token
    return h


def _yaml_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith((".yaml", ".yml")))
    return sorted(out)


def cmd_apply(endpoint: str, args: argparse.Namespace) -> int:
    files = _yaml_files(args.filepath)
    if not files:
        print(f"no YAML files under {args.filepath}", file=sys.stderr)
        return 1
    rc = 0
    for f in files:
        with open(f, "rb") as fh:
            code, body = _call(endpoint, "POST", "/admin/apply", fh.read(),
                               _admin_headers())
        if code == 200:
            print(f"{f} applied!")
            for w in json.loads(body).get("warnings", []):
                print(f"  warning: {w}", file=sys.stderr)
        else:  # keep going, like the reference CLI
            print(f"Unable to apply {f}: {body.decode(errors='replace')}",
                  file=sys.stderr)
            rc = 1
    return rc


def cmd_diff(endpoint: str, args: argparse.Namespace) -> int:
    """Dry-run apply: POST each YAML file to /admin/diff, print what
    WOULD change (kubectl-diff analog; live catalog untouched)."""
    files = _yaml_files(args.filepath)
    if not files:
        print(f"no YAML files under {args.filepath}", file=sys.stderr)
        return 1
    rc = 0
    for f in files:
        with open(f, "rb") as fh:
            code, body = _call(endpoint, "POST", "/admin/diff", fh.read(),
                               _admin_headers())
        if code == 200:
            changes = json.loads(body)["diff"]
            for c in changes:
                print(f"{f}: {c}")
            if not changes:
                print(f"{f}: no changes")
        else:
            print(f"Unable to diff {f}: {body.decode(errors='replace')}",
                  file=sys.stderr)
            rc = 1
    return rc


def cmd_get(endpoint: str, _args: argparse.Namespace) -> int:
    code, body = _call(endpoint, "GET", "/admin/config",
                       headers=_admin_headers())
    sys.stdout.write(body.decode(errors="replace"))
    return 0 if code == 200 else 1


def cmd_query(endpoint: str, args: argparse.Namespace) -> int:
    payload = {"sql": args.sql, "mode": args.mode}
    if args.principal:
        payload["principal"] = args.principal
    code, body = _call(endpoint, "POST", "/query",
                       json.dumps(payload).encode(),
                       {"Content-Type": "application/json"})
    if code != 202:
        print(body.decode(errors="replace"), file=sys.stderr)
        return 1
    job_id = json.loads(body)["job_id"]
    print(f"job {job_id}", file=sys.stderr)
    # A relay-identity caller (enrolled in x509_relays) must name the
    # origin principal on every request, polls and reads included; the
    # query string is ignored for user identities, so always forward it.
    from urllib.parse import quote
    qp = f"principal={quote(args.principal)}&" if args.principal else ""
    deadline = time.time() + args.timeout
    while time.time() < deadline:
        code, st = _call(endpoint, "GET", f"/query/{job_id}?{qp}")
        if code != 200:
            print(st.decode(errors="replace"), file=sys.stderr)
            return 1
        status = json.loads(st)["status"]
        if status in ("COMPLETE", "FAILED", "CANCELLED"):
            break
        time.sleep(args.poll)
    else:
        print(f"timeout after {args.timeout}s (job {job_id} still running; "
              f"cancel with: relayctl cancel {job_id})", file=sys.stderr)
        return 1
    if status != "COMPLETE" and not args.allow_partial:
        print(json.loads(st).get("tasks"), file=sys.stderr)
        return 1
    partial = "true" if args.allow_partial else "false"
    code, nd = _call(endpoint, "GET",
                     f"/query/{job_id}/results?{qp}allow_partial={partial}")
    if code != 200:
        print(nd.decode(errors="replace"), file=sys.stderr)
        return 1
    sys.stdout.write(nd.decode(errors="replace"))
    return 0


def cmd_explain(endpoint: str, args: argparse.Namespace) -> int:
    payload = {"sql": args.sql}
    if args.principal:
        payload["principal"] = args.principal
    code, body = _call(endpoint, "POST", "/explain",
                       json.dumps(payload).encode(),
                       {"Content-Type": "application/json"})
    if code != 200:
        print(body.decode(errors="replace"), file=sys.stderr)
        return 1
    for r in json.loads(body)["sources"]:
        extra = r["pushed_sql"] or r["pushed_filters"] or ""
        lim = f" limit={r['forwarded_limit']}" if r["forwarded_limit"] \
            else ""
        print(f"{r['entity']}  {r['relay']}/{r['source']} [{r['kind']}] "
              f"{r['action']}{lim}  {extra}")
    return 0


def _principal_qs(args: argparse.Namespace) -> str:
    """``?principal=…`` suffix (percent-encoded) — required by a
    relay-enrolled identity on every read, ignored for user identities."""
    from urllib.parse import quote
    p = getattr(args, "principal", None)
    return f"?principal={quote(p)}" if p else ""


def cmd_jobs(endpoint: str, args: argparse.Namespace) -> int:
    code, body = _call(endpoint, "GET", f"/query{_principal_qs(args)}")
    if code != 200:
        print(body.decode(errors="replace"), file=sys.stderr)
        return 1
    for j in json.loads(body)["jobs"]:
        print(f"{j['job_id']}  {j['status']:<12} {j['mode']:<9} "
              f"tasks={j['n_tasks']} principal={j['principal'] or '-'}")
    return 0


def cmd_status(endpoint: str, args: argparse.Namespace) -> int:
    code, body = _call(endpoint, "GET",
                       f"/query/{args.job_id}{_principal_qs(args)}")
    print(body.decode(errors="replace"))
    return 0 if code == 200 else 1


def cmd_cancel(endpoint: str, args: argparse.Namespace) -> int:
    code, body = _call(endpoint, "DELETE",
                       f"/query/{args.job_id}{_principal_qs(args)}")
    print(body.decode(errors="replace"))
    return 0 if code == 200 else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="relayctl")
    p.add_argument("--endpoint",
                   default=os.environ.get("RELAY_ENDPOINT"),
                   help="relay REST endpoint (default $RELAY_ENDPOINT)")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("apply", help="apply YAML config (file or dir)")
    sp.add_argument("-f", "--filepath", required=True)
    sp.set_defaults(fn=cmd_apply)

    sp = sub.add_parser("diff", help="dry-run apply: what would change")
    sp.add_argument("-f", "--filepath", required=True)
    sp.set_defaults(fn=cmd_diff)

    sp = sub.add_parser("get", help="export live catalog as YAML")
    sp.set_defaults(fn=cmd_get)

    sp = sub.add_parser("query", help="run SQL, print NDJSON results")
    sp.add_argument("sql")
    sp.add_argument("--mode", default="template",
                    choices=["template", "engine"])
    sp.add_argument("--principal")
    sp.add_argument("--allow-partial", action="store_true",
                    dest="allow_partial")
    sp.add_argument("--timeout", type=float, default=120.0)
    sp.add_argument("--poll", type=float, default=0.2)
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("explain", help="per-source resolution report")
    sp.add_argument("sql")
    sp.add_argument("--principal")
    sp.set_defaults(fn=cmd_explain)

    sp = sub.add_parser("jobs", help="list jobs (GET /query)")
    sp.add_argument("--principal")
    sp.set_defaults(fn=cmd_jobs)

    sp = sub.add_parser("status", help="job status JSON")
    sp.add_argument("job_id")
    sp.add_argument("--principal")
    sp.set_defaults(fn=cmd_status)

    sp = sub.add_parser("cancel", help="cancel a job (DELETE /query/{id})")
    sp.add_argument("job_id")
    sp.add_argument("--principal")
    sp.set_defaults(fn=cmd_cancel)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.endpoint:
        print("RELAY_ENDPOINT (or --endpoint) required", file=sys.stderr)
        return 2
    return args.fn(args.endpoint.rstrip("/"), args)


if __name__ == "__main__":
    sys.exit(main())
