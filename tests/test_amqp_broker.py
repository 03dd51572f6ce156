"""AMQP 0-9-1 broker kind: wire-protocol semantics + job-queue e2e.

The reference's RabbitMQ broker option (``core/src/messaging/mod.rs:49-92``,
``messaging/rabbitmq.rs``) carried over a real-protocol in-process broker,
following the repo's external-system pattern (Trino/FlightSQL stand-ins).
"""

import threading
import time

import pytest

from dataweb_spark.jobs.amqp import AmqpClient, AmqpJobQueue, MiniAmqpBroker


@pytest.fixture(scope="module")
def broker():
    b = MiniAmqpBroker(username="worker", password="s3cret")
    yield b
    b.shutdown()


def _client(broker):
    return AmqpClient("127.0.0.1", broker.port, "worker", "s3cret")


def test_plain_auth_enforced(broker):
    with pytest.raises((ConnectionError, OSError)):
        AmqpClient("127.0.0.1", broker.port, "worker", "wrong")
    c = _client(broker)  # correct creds pass the same handshake
    c.queue_declare("auth_probe")
    c.close()


def test_publish_get_ack_roundtrip(broker):
    c = _client(broker)
    c.queue_declare("q_get")
    c.publish("q_get", b"one")
    c.publish("q_get", b"two")
    tag, body = c.get("q_get")
    assert body == b"one"
    c.ack(tag)
    tag2, body2 = c.get("q_get")
    assert body2 == b"two" and tag2 != tag
    c.ack(tag2)
    assert c.get("q_get") is None          # basic.get-empty
    c.close()


def test_consume_prefetch_one_and_ack_flow(broker):
    """The reference consumer's exact shape (rabbitmq.rs:57-75):
    basic.qos(prefetch=1) + basic.consume — a second message is NOT
    delivered until the first is acked."""
    pub = _client(broker)
    con = _client(broker)
    pub.queue_declare("q_consume")
    con.queue_declare("q_consume")
    con.basic_qos(1)
    con.consume("q_consume")
    pub.publish("q_consume", b"first")
    pub.publish("q_consume", b"second")
    tag, body = con.next_delivery(timeout=10)
    assert body == b"first"
    # wait for the (async) second publish to land on the broker...
    deadline = time.time() + 5
    while (broker.queue_depth("q_consume") == 0
           and time.time() < deadline):
        time.sleep(0.02)
    time.sleep(0.3)                        # give a wrong impl time to push
    assert broker.queue_depth("q_consume") == 1  # second held back
    con.ack(tag)
    tag2, body2 = con.next_delivery(timeout=10)
    assert body2 == b"second"
    con.ack(tag2)
    pub.close()
    con.close()


def test_unacked_requeued_on_connection_drop(broker):
    """At-least-once: a consumer dying mid-message puts it back."""
    pub = _client(broker)
    doomed = _client(broker)
    pub.queue_declare("q_requeue")
    pub.publish("q_requeue", b"precious")
    # basic.publish is asynchronous (no confirm): wait for the broker to
    # process the content frames before a DIFFERENT connection gets.
    deadline = time.time() + 5
    while broker.queue_depth("q_requeue") == 0 and time.time() < deadline:
        time.sleep(0.02)
    got = doomed.get("q_requeue")
    assert got is not None and got[1] == b"precious"
    doomed._sock.close()                   # dies without ack
    # requeue happens on the broker's connection-cleanup path: poll until
    # the message is visible again rather than trusting a fixed sleep
    deadline = time.time() + 5
    got2 = None
    while got2 is None and time.time() < deadline:
        got2 = pub.get("q_requeue")
        if got2 is None:
            time.sleep(0.02)
    assert got2 is not None and got2[1] == b"precious"
    pub.ack(got2[0])
    pub.close()


def test_amqp_job_queue_end_to_end(spark, demo_web, tmp_path, broker):
    """submit → worker claims over AMQP → status machine → results read
    back; the broker carries ONLY control-plane messages (job specs),
    status/results stay in the shared store — the reference topology."""
    from dataweb_spark.jobs.manager import COMPLETE, FAILED, QUEUED
    from dataweb_spark.jobs.store import run_worker

    q = AmqpJobQueue(str(tmp_path / "store"), "127.0.0.1", broker.port,
                     queue="jobs_e2e", username="worker",
                     password="s3cret")
    t = threading.Thread(
        target=run_worker, args=(spark, demo_web, "na_us", q),
        kwargs={"max_jobs": 2}, daemon=True)
    t.start()
    job1 = q.submit("select returnflag, sum(quantity) as q from lineitem "
                    "group by returnflag", mode="engine")
    job2 = q.submit("drop table lineitem")  # must fail validation
    st1 = q.wait(job1, timeout=120)
    st2 = q.wait(job2, timeout=120)
    t.join(timeout=30)
    assert st1["status"] == COMPLETE
    assert st1["history"][0] == QUEUED and st1["history"][-1] == COMPLETE
    assert st2["status"] == FAILED
    rows = {r["returnflag"]: round(r["q"], 2)
            for r in q.result(spark, job1).collect()}
    assert set(rows) == {"N", "A", "R"}


def test_amqp_cancel_before_claim_skipped(spark, demo_web, tmp_path,
                                          broker):
    """A job cancelled while still on the broker is acked-and-skipped by
    claim (the message can't be atomically removed like a queued file)."""
    from dataweb_spark.jobs.manager import CANCELLED

    q = AmqpJobQueue(str(tmp_path / "store2"), "127.0.0.1", broker.port,
                     queue="jobs_cancel", username="worker",
                     password="s3cret")
    job = q.submit("select 1 as x from lineitem", principal="alice")
    with pytest.raises(PermissionError):
        q.cancel(job, principal="mallory")
    st = q.cancel(job, principal="alice")
    assert st["status"] == CANCELLED
    assert q.claim() is None               # message consumed + skipped
    assert broker.queue_depth("jobs_cancel") == 0


def test_empty_body_roundtrip(broker):
    """Zero-length bodies ship no BODY frame; the stream stays in sync."""
    c = _client(broker)
    c.queue_declare("q_empty")
    c.publish("q_empty", b"")
    c.publish("q_empty", b"after-empty")
    tag, body = c.get("q_empty")
    assert body == b""
    c.ack(tag)
    tag2, body2 = c.get("q_empty")          # connection still healthy
    assert body2 == b"after-empty"
    c.ack(tag2)
    c.close()


def test_claim_cancel_arbiter_exactly_one_winner(tmp_path, broker):
    """The claimed-marker O_EXCL creation is the atomic arbiter: after a
    cancel wins it, a claim of the same job acks-and-skips — and vice
    versa, a claim that wins routes cancel to cancel_requested."""
    from dataweb_spark.jobs.manager import CANCELLED

    q = AmqpJobQueue(str(tmp_path / "store3"), "127.0.0.1", broker.port,
                     queue="jobs_arbiter", username="worker",
                     password="s3cret")
    # cancel wins
    j1 = q.submit("select 1 as x from lineitem")
    q.cancel(j1)
    assert q.claim() is None
    assert q.read_status(j1)["status"] == CANCELLED
    # claim wins
    j2 = q.submit("select 2 as x from lineitem")
    spec = q.claim()
    assert spec["job_id"] == j2
    st = q.cancel(j2)
    assert st["cancel_requested"] is True   # routed to the running worker
    q.close()


def test_body_chunking_roundtrip(broker):
    """Bodies at/over the negotiated frame-max are chunked into multiple
    BODY frames and reassembled exactly (a 1 MB SQL job spec must ride)."""
    import hashlib
    import random

    from dataweb_spark.jobs.amqp import FRAME_MAX

    rng = random.Random(7)
    c = _client(broker)
    c.queue_declare("q_chunks")
    sizes = [1, FRAME_MAX - 1, FRAME_MAX, FRAME_MAX + 1,
             3 * FRAME_MAX + 17]
    sent = []
    for n in sizes:
        body = bytes(rng.getrandbits(8) for _ in range(min(n, 4096)))
        body = (body * (n // len(body) + 1))[:n]  # n bytes, varied content
        sent.append(hashlib.md5(body).hexdigest())
        c.publish("q_chunks", body)
    got = []
    for n in sizes:
        tag, body = c.get("q_chunks")
        assert len(body) == n
        got.append(hashlib.md5(body).hexdigest())
        c.ack(tag)
    assert got == sent                      # FIFO and byte-exact
    c.close()


# -- AMQPS (TLS on the broker socket, r12) -----------------------------------

@pytest.fixture(scope="module")
def tls_material(tmp_path_factory):
    """CA + CA-issued broker cert (hostname 'localhost') + a CA-issued
    client cert, all as files (ssl loads paths)."""
    from dataweb_spark.sources import pki
    d = tmp_path_factory.mktemp("amqps")
    ca_pem, ca_key = pki.generate_ca("amqp-test-ca")
    srv_cert, srv_key = pki.generate_client_identity(
        ca_pem, ca_key, "localhost", dns_names=["localhost"])
    cli_cert, cli_key = pki.generate_client_identity(
        ca_pem, ca_key, "worker-box")
    other_ca, _ = pki.generate_ca("other-ca")
    paths = {}
    for name, data in [("ca.pem", ca_pem),
                       ("srv_cert.pem", srv_cert),
                       ("srv_key.pem", srv_key),
                       ("cli_cert.pem", cli_cert),
                       ("cli_key.pem", cli_key),
                       ("other_ca.pem", other_ca)]:
        p = d / name
        p.write_bytes(data)
        paths[name] = str(p)
    return paths


@pytest.fixture(scope="module")
def tls_broker(tls_material):
    b = MiniAmqpBroker(username="worker", password="s3cret",
                       tls={"cert_file": tls_material["srv_cert.pem"],
                            "key_file": tls_material["srv_key.pem"]})
    yield b
    b.shutdown()


def test_amqps_roundtrip_and_rejects(tls_material, tls_broker):
    """TLS clients verify the broker cert and work end-to-end; a
    plaintext client and a wrong-CA client both fail the handshake
    without wedging the broker."""
    import ssl
    tls = {"ca_file": tls_material["ca.pem"],
           "server_hostname": "localhost"}
    c = AmqpClient("127.0.0.1", tls_broker.port, "worker", "s3cret",
                   tls=tls)
    c.queue_declare("q_tls")
    c.publish("q_tls", b"secret payload")
    tag, body = c.get("q_tls")
    assert body == b"secret payload"
    c.ack(tag)
    c.close()
    # plaintext against the TLS port: server drops the conn mid-handshake
    with pytest.raises((ConnectionError, OSError)):
        AmqpClient("127.0.0.1", tls_broker.port, "worker", "s3cret")
    # wrong CA: client refuses the broker cert
    with pytest.raises(ssl.SSLError):
        AmqpClient("127.0.0.1", tls_broker.port, "worker", "s3cret",
                   tls={"ca_file": tls_material["other_ca.pem"],
                        "server_hostname": "localhost"})
    # broker still serves after both failures
    c2 = AmqpClient("127.0.0.1", tls_broker.port, "worker", "s3cret",
                    tls=tls)
    c2.queue_declare("q_tls")
    c2.close()


def test_amqps_mutual_tls_requires_client_cert(tls_material):
    """ca_file on the broker = RabbitMQ verify_peer+fail_if_no_peer_cert:
    certless TLS clients are rejected at handshake, CA-issued client
    certs pass; PLAIN auth still applies inside the channel."""
    import ssl
    b = MiniAmqpBroker(username="worker", password="s3cret",
                       tls={"cert_file": tls_material["srv_cert.pem"],
                            "key_file": tls_material["srv_key.pem"],
                            "ca_file": tls_material["ca.pem"]})
    try:
        base = {"ca_file": tls_material["ca.pem"],
                "server_hostname": "localhost"}
        with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
            AmqpClient("127.0.0.1", b.port, "worker", "s3cret", tls=base)
        full = dict(base, cert_file=tls_material["cli_cert.pem"],
                    key_file=tls_material["cli_key.pem"])
        c = AmqpClient("127.0.0.1", b.port, "worker", "s3cret", tls=full)
        c.queue_declare("q_mtls")
        c.publish("q_mtls", b"x")
        tag, body = c.get("q_mtls")
        assert body == b"x"
        c.ack(tag)
        c.close()
        # wrong PLAIN creds still rejected inside a good TLS channel
        with pytest.raises((ConnectionError, OSError)):
            AmqpClient("127.0.0.1", b.port, "worker", "wrong", tls=full)
    finally:
        b.shutdown()


def test_amqps_job_queue_end_to_end(tmp_path, tls_material, tls_broker):
    """AmqpJobQueue(tls=...) — the control plane rides AMQPS."""
    tls = {"ca_file": tls_material["ca.pem"],
           "server_hostname": "localhost"}
    q = AmqpJobQueue(str(tmp_path / "store"), "127.0.0.1",
                     tls_broker.port, queue="q_tls_jobs",
                     username="worker", password="s3cret", tls=tls)
    job_id = q.submit({"sql": "select 1"})
    claimed = q.claim()
    assert claimed is not None and claimed["job_id"] == job_id
    q.close()
