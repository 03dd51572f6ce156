#!/usr/bin/env python
"""Run a COMPLETE relay in one process — the reference's single-binary
deployment mode (``single_binary_deployment/src/main.rs:9-40``: REST +
Flight + query-runner threads over an in-memory channel broker).

Usage:  python tools/run_combined_relay.py [sf_dir|config_dir] [relay]
                                           [n_workers]

* ``sf_dir`` pointing at parquet test data serves the demo web;
* a directory of relay YAML (the ``relayctl apply`` kinds) is loaded
  through ``catalog.loader.load_web_dir`` instead;
* ``relay`` defaults to ``na_us``; ``n_workers`` to 2.

Prints ``FLIGHT <port>`` and ``REST <port>`` once both faces accept
connections, then serves until killed (workers drain via the queue
STOP file on SIGTERM)."""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    relay = sys.argv[2] if len(sys.argv) > 2 else "na_us"
    n_workers = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from dataweb_spark.jobs.combined import CombinedRelay
    from dataweb_spark.session import get_spark

    spark = get_spark("combined-relay", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    has_yaml = any(f.endswith((".yml", ".yaml"))
                   for f in os.listdir(target)) if os.path.isdir(target) \
        else False
    if has_yaml:
        from dataweb_spark.catalog.loader import load_web_dir
        web = load_web_dir(target)
    else:
        from dataweb_spark.demo import build_demo_web
        web = build_demo_web(target)

    combined = CombinedRelay(spark, web, relay, n_workers=n_workers).start()
    print(f"FLIGHT {combined.flight_port}", flush=True)
    print(f"REST {combined.rest_port}", flush=True)

    def _stop(_sig, _frm):
        combined.shutdown()
        sys.exit(0)

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
