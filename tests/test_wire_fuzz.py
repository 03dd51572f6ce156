"""Property-fuzz the hand-built wire protocols (VERDICT r6 item 6).

Both the FlightSQL protobuf-envelope codec and the AMQP 0-9-1 broker
parse attacker-shaped bytes straight off sockets. The happy-path suites
(``test_external_engine.py``, ``test_amqp_broker.py``) prove the
protocols work; these tests prove garbage CANNOT crash them:

* codec round-trips hold for arbitrary payload contents,
* arbitrary/truncated/mutated bytes fail with ``ValueError`` only
  (never IndexError / struct.error / MemoryError / a hang),
* a live broker survives garbage connections — the offending connection
  is dropped, concurrent well-behaved clients keep working, and no
  broker thread dies with an unhandled exception.
"""

import socket
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataweb_spark.jobs import amqp as A
from dataweb_spark.jobs.amqp import AmqpClient, MiniAmqpBroker
from dataweb_spark.sources import flightsql_proto as P

# ---------------------------------------------------------------------------
# FlightSQL protobuf envelope
# ---------------------------------------------------------------------------

sql_text = st.text(max_size=300)
blobs = st.binary(max_size=300)


@settings(max_examples=200, deadline=None)
@given(sql=sql_text)
def test_fuzz_prepared_request_roundtrip(sql):
    assert P.parse_create_prepared_request(
        P.create_prepared_request(sql)) == sql


@settings(max_examples=200, deadline=None)
@given(handle=blobs, schema=blobs)
def test_fuzz_prepared_result_roundtrip(handle, schema):
    assert P.parse_create_prepared_result(
        P.create_prepared_result(handle, schema)) == (handle, schema)


@settings(max_examples=200, deadline=None)
@given(handle=blobs)
def test_fuzz_command_roundtrips(handle):
    assert P.parse_command(P.prepared_statement_query(handle)) == \
        ("prepared", handle)
    assert P.parse_command(P.ticket_statement_query(handle)) == \
        ("ticket", handle)
    assert P.parse_command(P.close_prepared_request(handle)) == \
        ("close", handle)


@settings(max_examples=500, deadline=None)
@given(buf=st.binary(max_size=200))
def test_fuzz_codec_garbage_never_crashes(buf):
    """Arbitrary bytes → a clean parse or ValueError; nothing else. The
    legacy-fallback dispatch in flightsql.py relies on exactly this
    contract (ValueError = 'not an envelope, treat as raw SQL')."""
    for parse in (P.parse_command, P.parse_create_prepared_request,
                  P.parse_create_prepared_result, P.unwrap_any):
        try:
            parse(buf)
        except ValueError:
            pass


@settings(max_examples=300, deadline=None)
@given(sql=sql_text, cut=st.integers(min_value=0, max_value=400),
       flip=st.integers(min_value=0, max_value=400),
       bit=st.integers(min_value=0, max_value=7))
def test_fuzz_codec_mutated_valid_messages(sql, cut, flip, bit):
    """Truncations and single-bit flips of VALID envelopes parse or raise
    ValueError — the mutation space closest to real corruption."""
    msg = P.create_prepared_request(sql)
    truncated = msg[:min(cut, len(msg))]
    try:
        P.parse_create_prepared_request(truncated)
    except ValueError:
        pass
    if msg:
        i = min(flip, len(msg) - 1)
        mutated = msg[:i] + bytes([msg[i] ^ (1 << bit)]) + msg[i + 1:]
        try:
            P.parse_create_prepared_request(mutated)
        except ValueError:
            pass


def test_codec_oversized_varint_and_overlength_field_rejected():
    # 11-byte varint (>64-bit) as a tag
    with pytest.raises(ValueError):
        P.unwrap_any(b"\x80" * 11 + b"\x01")
    # declared field length far past the end of the buffer
    with pytest.raises(ValueError):
        P.unwrap_any(b"\x0a\xff\xff\xff\x7fabc")
    # truncated varint at end of buffer
    with pytest.raises(ValueError):
        P.unwrap_any(b"\x0a\x80")


# ---------------------------------------------------------------------------
# AMQP 0-9-1 frame grammar
# ---------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(buf=st.binary(max_size=120))
def test_fuzz_amqp_reader_never_crashes(buf):
    """Every _Reader accessor on arbitrary bytes → value or ValueError
    (the broker's dispatch loop catches exactly that)."""
    for field in ("octet", "short", "long", "longlong", "shortstr",
                  "longstr", "table"):
        r = A._Reader(buf)
        try:
            getattr(r, field)()
        except ValueError:
            pass


@settings(max_examples=200, deadline=None)
@given(s=st.text(max_size=120))
def test_fuzz_amqp_shortstr_roundtrip(s):
    enc = A._shortstr(s) if len(s.encode()) < 256 else None
    if enc is None:
        return
    assert A._Reader(enc).shortstr() == s


@settings(max_examples=200, deadline=None)
@given(b=st.binary(max_size=300))
def test_fuzz_amqp_longstr_roundtrip(b):
    assert A._Reader(A._longstr(b)).longstr() == b


@settings(max_examples=100, deadline=None)
@given(ftype=st.integers(0, 255), channel=st.integers(0, 65535),
       payload=st.binary(max_size=200))
def test_fuzz_amqp_frame_roundtrip(ftype, channel, payload):
    """_frame → _read_frame over a real socketpair preserves all fields."""
    a, b = socket.socketpair()
    try:
        a.sendall(A._frame(ftype, channel, payload))
        assert A._read_frame(b) == (ftype, channel, payload)
    finally:
        a.close()
        b.close()


def test_amqp_oversized_frame_header_rejected():
    """A forged header declaring a ~4 GiB payload must fail fast, not
    buffer gigabytes."""
    a, b = socket.socketpair()
    try:
        a.sendall(struct.pack(">BHI", A.FRAME_METHOD, 0, 0xFFFFFFFF))
        with pytest.raises(ConnectionError):
            A._read_frame(b)
    finally:
        a.close()
        b.close()


# ---------------------------------------------------------------------------
# AMQP broker vs hostile connections
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def broker():
    b = MiniAmqpBroker(username="fuzz", password="pw")
    yield b
    b.shutdown()


def _good_client_works(broker, tag):
    c = AmqpClient("127.0.0.1", broker.port, "fuzz", "pw")
    q = f"fuzz_probe_{tag}"
    c.queue_declare(q)
    c.publish(q, b"alive")
    dtag, body = c.get(q)
    assert body == b"alive"
    c.ack(dtag)
    c.close()


def _hostile(broker, payload: bytes, with_header: bool):
    s = socket.create_connection(("127.0.0.1", broker.port), timeout=5)
    try:
        if with_header:
            s.sendall(b"AMQP\x00\x00\x09\x01")
            s.settimeout(2)
            try:  # drain connection.start so the garbage lands mid-handshake
                s.recv(4096)
            except OSError:
                pass
        try:
            s.sendall(payload)
            s.shutdown(socket.SHUT_WR)
        except OSError:
            # the broker may RST mid-send for sufficiently hostile bytes
            # — from the fuzzer's side that's a pass (it dropped us), so
            # only the follow-up good-client probe judges broker health
            return
        s.settimeout(2)
        try:  # let the broker react; it may send close frames or just drop
            while s.recv(4096):
                pass
        except OSError:
            pass
    finally:
        s.close()


@settings(max_examples=25, deadline=None)
@given(payload=st.binary(min_size=1, max_size=300),
       with_header=st.booleans())
def test_fuzz_broker_survives_garbage_connections(broker, payload,
                                                  with_header):
    """Garbage pre- and post-protocol-header: the broker drops that
    connection and keeps serving a well-behaved client."""
    _hostile(broker, payload, with_header)
    _good_client_works(broker, "garbage")


@settings(max_examples=15, deadline=None)
@given(cut=st.integers(min_value=8, max_value=30))
def test_fuzz_broker_survives_truncated_method_frames(broker, cut):
    """Valid frame envelope, truncated method arguments inside — the
    exact shape the bounds-checked _Reader exists for."""
    # connection.start-ok with arguments cut mid-field
    args = (A._longstr(b"") + A._shortstr("PLAIN") +
            A._longstr(b"\x00fuzz\x00pw") + A._shortstr("en_US"))
    frame = A._frame(A.FRAME_METHOD, 0, A._method(A.CONN_START_OK, args))
    _hostile(broker, frame[:cut], with_header=True)
    _good_client_works(broker, "truncated")


def test_broker_survives_wrong_protocol_header(broker):
    _hostile(broker, b"HTTP/1.1 GET /\r\n\r\n", with_header=False)
    _good_client_works(broker, "http")


def test_broker_survives_huge_declared_content_body(broker):
    """Handshake correctly, then declare a 1 GiB content body on publish:
    the broker must refuse rather than buffer it."""
    c = AmqpClient("127.0.0.1", broker.port, "fuzz", "pw")
    c.queue_declare("fuzz_huge")
    # hand-roll a publish with a lying content header
    pub = A._method(A.B_PUBLISH, struct.pack(">H", 0) + A._shortstr("") +
                    A._shortstr("fuzz_huge") + b"\x00")
    hdr = struct.pack(">HHQH", 60, 0, 1 << 30, 0)
    c._sock.sendall(A._frame(A.FRAME_METHOD, 1, pub) +
                    A._frame(A.FRAME_HEADER, 1, hdr))
    try:
        c.close()
    except (ConnectionError, OSError):
        pass  # broker may already have dropped us — that's the point
    _good_client_works(broker, "huge")
