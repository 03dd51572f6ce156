#!/usr/bin/env python
"""Serve a demo-web relay over Arrow Flight from a SEPARATE process.

Usage:  python tools/run_flight_relay.py <sf_dir> [tokens_json] [relay]
        relay "na_us" (default) serves the 2-source demo web; any other
        relay name serves that relay of the six-relay dev topology

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
    server = serve_in_background(spark, web, relay, tokens=tokens)
    print(f"PORT {server.port}", flush=True)
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
