"""Arrow FlightSQL command envelope — minimal wire-format codec.

The reference's FlightSQLRunner (``core/src/execute/data_stores/
flight_sql.rs:100-117``) drives the STANDARD FlightSQL protocol:
``handshake`` → ``prepare(sql)`` → ``stmt.execute()`` → ``do_get`` per
endpoint. The commands ride gRPC as protobuf messages wrapped in
``google.protobuf.Any`` (see Apache Arrow's public
``arrow/flight/protocol/sql/FlightSql.proto``). PyArrow exposes no
Python FlightSQL client, and protobuf codegen isn't available in-sandbox,
so this module hand-encodes exactly the five messages the
prepare→execute→fetch flow needs. Protobuf wire format is stable and
public: varint tags, length-delimited strings/bytes — nothing else is
required for these messages.

Messages (field numbers from FlightSql.proto):

* ``ActionCreatePreparedStatementRequest``  {1: query (string)}
* ``ActionCreatePreparedStatementResult``   {1: handle (bytes),
  2: dataset_schema (bytes, Arrow IPC)}
* ``CommandPreparedStatementQuery``         {1: handle (bytes)}
* ``CommandStatementQuery``                 {1: query (string)}
* ``TicketStatementQuery``                  {1: statement_handle (bytes)}
* ``ActionClosePreparedStatementRequest``   {1: handle (bytes)}

plus ``google.protobuf.Any`` {1: type_url (string), 2: value (bytes)}.
"""

from __future__ import annotations

_TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."

CREATE_PREPARED_ACTION = "CreatePreparedStatement"
CLOSE_PREPARED_ACTION = "ClosePreparedStatement"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_bytes(num: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2) — covers string/bytes/message."""
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Bounded varint read: truncated input or a varint longer than the
    10 bytes a 64-bit value needs raises ValueError (never IndexError) —
    these bytes come off sockets, so attacker-shaped input must fail
    loudly, not crash or spin."""
    shift = n = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:
            raise ValueError("oversized varint (>10 bytes)")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _decode_fields(buf: bytes) -> dict[int, bytes]:
    """Last-one-wins map of length-delimited fields; other wire types are
    skipped (these messages only use wire type 2, but be tolerant).
    Declared lengths past the end of the buffer raise ValueError instead
    of silently truncating."""
    fields: dict[int, bytes] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, pos = _read_varint(buf, pos)
            if ln > len(buf) - pos:
                raise ValueError("field length past end of buffer")
            fields[num] = buf[pos:pos + ln]
            pos += ln
        elif wt == 0:
            _, pos = _read_varint(buf, pos)
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:  # groups (3/4) don't appear in proto3
            raise ValueError(f"unsupported wire type {wt}")
        if pos > len(buf):
            raise ValueError("fixed-width field past end of buffer")
    return fields


def wrap_any(short_name: str, value: bytes) -> bytes:
    return (_field_bytes(1, (_TYPE_PREFIX + short_name).encode()) +
            _field_bytes(2, value))


def unwrap_any(buf: bytes) -> tuple[str, bytes]:
    """→ (short message name, value). Raises ValueError if not an Any with
    a FlightSQL type_url (callers use that to fall back to legacy forms)."""
    fields = _decode_fields(buf)
    url = fields.get(1, b"").decode("utf-8", errors="replace")
    if not url.startswith(_TYPE_PREFIX):
        raise ValueError(f"not a FlightSQL Any envelope: {url!r}")
    return url[len(_TYPE_PREFIX):], fields.get(2, b"")


def create_prepared_request(sql: str) -> bytes:
    return wrap_any("ActionCreatePreparedStatementRequest",
                    _field_bytes(1, sql.encode()))


def parse_create_prepared_request(buf: bytes) -> str:
    name, value = unwrap_any(buf)
    if name != "ActionCreatePreparedStatementRequest":
        raise ValueError(f"expected prepare request, got {name}")
    return _decode_fields(value).get(1, b"").decode()


def create_prepared_result(handle: bytes, dataset_schema: bytes) -> bytes:
    return wrap_any("ActionCreatePreparedStatementResult",
                    _field_bytes(1, handle) +
                    _field_bytes(2, dataset_schema))


def parse_create_prepared_result(buf: bytes) -> tuple[bytes, bytes]:
    name, value = unwrap_any(buf)
    if name != "ActionCreatePreparedStatementResult":
        raise ValueError(f"expected prepare result, got {name}")
    fields = _decode_fields(value)
    return fields.get(1, b""), fields.get(2, b"")


def prepared_statement_query(handle: bytes) -> bytes:
    return wrap_any("CommandPreparedStatementQuery", _field_bytes(1, handle))


def statement_query(sql: str) -> bytes:
    return wrap_any("CommandStatementQuery", _field_bytes(1, sql.encode()))


def ticket_statement_query(handle: bytes) -> bytes:
    return wrap_any("TicketStatementQuery", _field_bytes(1, handle))


def close_prepared_request(handle: bytes) -> bytes:
    return wrap_any("ActionClosePreparedStatementRequest",
                    _field_bytes(1, handle))


def parse_command(buf: bytes) -> tuple[str, bytes]:
    """Parse a FlightDescriptor.cmd / Ticket body: → (kind, payload) where
    kind ∈ {"prepared" (payload = handle), "statement" (payload = SQL
    bytes), "ticket" (payload = statement handle)}. Raises ValueError for
    non-envelope bytes (legacy raw-SQL commands)."""
    name, value = unwrap_any(buf)
    fields = _decode_fields(value)
    if name == "CommandPreparedStatementQuery":
        return "prepared", fields.get(1, b"")
    if name == "CommandStatementQuery":
        return "statement", fields.get(1, b"")
    if name == "TicketStatementQuery":
        return "ticket", fields.get(1, b"")
    if name == "ActionClosePreparedStatementRequest":
        return "close", fields.get(1, b"")
    raise ValueError(f"unrecognized FlightSQL command {name}")
