"""Single-process combined relay — the reference's one-binary deployment.

The reference ships a deployment mode that runs all three relay faces in
ONE process as threads sharing an in-memory message channel
(``single_binary_deployment/src/main.rs:9-40``: REST relay thread +
Flight server thread + query-runner thread over the AsyncChannel broker
option). This module is that topology on Spark: one
:class:`CombinedRelay` starts

* the **Arrow Flight face** (``sources.flight_service`` — catalog
  listing, 2-step query, do_put result push wired to the shared queue),
* the **REST face** (``sources.rest_server`` — POST /query → poll →
  NDJSON, explain, admin apply/diff),
* **N job workers** (``jobs.store.run_worker`` loops claiming from the
  shared :class:`~dataweb_spark.jobs.store.InMemoryJobQueue` — the
  channel-broker analog of the reference's query_runner),

all as daemon threads over ONE SparkSession and ONE ``Web`` catalog —
an admin apply through the REST face is immediately visible to Flight
queries and queued jobs, exactly the single-binary sharing the
reference gets from its process-wide config. A notebook, service, or
container entrypoint gets a full relay from one constructor; the
multi-process topology (``tools/run_flight_relay.py`` +
``tools/run_job_worker.py`` + AMQP/file brokers) remains the scale-out
path.

One SparkSession is safe to share: Spark's scheduler is thread-safe and
fair-schedules concurrent actions; at 100 TB each face's work is still
planned by Catalyst and executed on the cluster — the threads only
drive job control flow.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

from dataweb_spark.catalog.model import Web
from dataweb_spark.jobs.store import InMemoryJobQueue, run_worker
from dataweb_spark.sources.flight_service import serve_in_background
from dataweb_spark.sources.rest_server import RestRelayServer


class CombinedRelay:
    """All three relay faces in one process. ``start()`` → use
    ``.flight_port`` / ``.rest_port`` / ``.queue``; ``shutdown()`` stops
    the servers and joins the workers."""

    def __init__(self, spark: SparkSession, web: Web, relay_name: str,
                 n_workers: int = 2, store_dir: str | None = None,
                 tokens: dict[str, str] | None = None,
                 admin_token: str | None = None,
                 tls: tuple[bytes, bytes] | None = None,
                 x509_users=None,
                 x509_relays=None,
                 mtls_ca: bytes | None = None):
        self.spark = spark
        self.web = web
        self.relay_name = relay_name
        self.n_workers = n_workers
        self.queue = InMemoryJobQueue(root=store_dir)
        self._tokens = tokens
        self._admin_token = admin_token
        self._tls = tls
        # ONE users table / CA drives BOTH network faces — the
        # single-binary sharing story extended to identity: enroll a
        # fingerprint once, the Flight handshake and the REST mTLS
        # listener both honor it (the reference's per-relay cert material
        # in deploy/ is likewise face-agnostic)
        self._x509_users = x509_users
        self._x509_relays = x509_relays
        self._mtls_ca = mtls_ca
        x509_on = x509_users is not None or x509_relays is not None
        if x509_on and tokens is not None:
            raise ValueError("choose token auth OR x509 auth, not both")
        if x509_on and (tls is None or mtls_ca is None):
            raise ValueError(
                "combined-relay x509 identity needs tls + mtls_ca (the "
                "REST face has no proxy in a single binary)")
        self._stop_file = os.path.join(self.queue.root, "STOP")
        self._workers: list[threading.Thread] = []
        self.flight = None
        self.rest = None

    def start(self) -> "CombinedRelay":
        self.flight = serve_in_background(
            self.spark, self.web, self.relay_name, tokens=self._tokens,
            job_store=self.queue, tls=self._tls,
            x509_users=self._x509_users, x509_relays=self._x509_relays,
            mtls_ca=self._mtls_ca)
        self.rest = RestRelayServer(
            self.spark, self.web, self.relay_name,
            admin_token=self._admin_token, tls=self._tls,
            x509_users=self._x509_users, x509_relays=self._x509_relays,
            mtls_ca=self._mtls_ca).start()
        for i in range(self.n_workers):
            t = threading.Thread(
                target=run_worker,
                args=(self.spark, self.web, self.relay_name, self.queue),
                kwargs={"stop_file": self._stop_file},
                name=f"combined-worker-{i}", daemon=True)
            t.start()
            self._workers.append(t)
        return self

    @property
    def flight_port(self) -> int:
        return self.flight.port

    @property
    def rest_port(self) -> int:
        return self.rest.port

    def shutdown(self, timeout: float = 30.0) -> None:
        """Graceful stop: workers drain their current job and exit at
        the stop-file check; then the servers close their listeners."""
        with open(self._stop_file, "w") as f:
            f.write("stop")
        for t in self._workers:
            t.join(timeout=timeout)
        if self.rest is not None:
            self.rest.shutdown()
        if self.flight is not None:
            self.flight.shutdown()
