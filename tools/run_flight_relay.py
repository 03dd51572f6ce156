#!/usr/bin/env python
"""Serve a demo-web relay over Arrow Flight from a SEPARATE process.

Usage:  python tools/run_flight_relay.py <sf_dir> [tokens_json] [relay]
        relay "na_us" (default) serves the 2-source demo web; any other
        relay name serves that relay of the six-relay dev topology

Transport identity rides the reference relay process's env contract
(``core/src/conf.rs:33-75``, ``flight_server/src/lib.rs:30-95``):

    SERVER_CERT_FILE / SERVER_KEY_FILE   serve grpc+tls (DIRECT_TLS
                                         mode; both or neither)
    CA_CERT_FILE                         handshake-verify every client
                                         against this CA (client_ca_root
                                         — requires the server pair)
    X509_USERS_FILE / X509_RELAYS_FILE   JSON fingerprint→principal
                                         tables (the reference keeps
                                         these in its catalog DB); a
                                         relay-enrolled client must name
                                         the origin principal it
                                         forwards for

Prints ``PORT <n>`` on stdout once the server is accepting connections,
then serves until killed. This is the multi-process half of the
relay→relay federation demo: a second engine with its own SparkSession,
JVM, and catalog, reachable only over gRPC — the reference's
``deploy/compose.yaml`` topology collapsed to one host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tokens = json.loads(sys.argv[2]) if len(sys.argv) > 2 else None
    relay = sys.argv[3] if len(sys.argv) > 3 else "na_us"

    from dataweb_spark.demo import build_demo_web, build_six_relay_web
    from dataweb_spark.session import get_spark
    from dataweb_spark.sources.flight_service import serve_in_background

    spark = get_spark("flight-relay-peer", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    web = build_demo_web(sf_dir) if relay == "na_us" \
        else build_six_relay_web(sf_dir)

    def _read(name: str) -> bytes | None:
        p = os.environ.get(name)
        if not p:
            return None
        with open(p, "rb") as f:
            return f.read()

    def _table(name: str):
        p = os.environ.get(name)
        if not p:
            return None
        with open(p) as f:
            return json.load(f)

    tls_cert, tls_key = _read("SERVER_CERT_FILE"), _read("SERVER_KEY_FILE")
    if (tls_cert is None) != (tls_key is None):
        raise SystemExit(
            "SERVER_CERT_FILE and SERVER_KEY_FILE must be set together")
    server = serve_in_background(
        spark, web, relay, tokens=tokens,
        x509_users=_table("X509_USERS_FILE"),
        x509_relays=_table("X509_RELAYS_FILE"),
        tls=(tls_cert, tls_key) if tls_cert else None,
        mtls_ca=_read("CA_CERT_FILE"))
    print(f"PORT {server.port}", flush=True)
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
