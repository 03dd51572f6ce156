"""Arrow Flight facade: the reference's 2-step protocol (list_flights,
get_flight_info → per-source endpoints, do_get streams) against the demo
web. Merging per-source partial aggregates client-side reproduces
test/validation.py behavior."""

import pytest

from dataweb_spark.sources.flight_service import (
    flight_list_entities,
    flight_query,
    serve_in_background,
)


@pytest.fixture(scope="module")
def server(spark, demo_web):
    s = serve_in_background(spark, demo_web, "na_us")
    yield s
    s.shutdown()


def test_list_flights_entities_and_schema(server):
    entities = flight_list_entities(server.port)
    assert "lineitem" in entities
    names = entities["lineitem"].names
    assert "tax_percent" in names and "_source_relay_" in names


def test_template_query_per_source_partials(server, spark, demo_web):
    t = flight_query(server.port,
                     "select returnflag, count(*) as n from lineitem "
                     "group by returnflag")
    # two sources × their flag groups: partials, NOT merged by the server
    rows = list(zip(t["returnflag"].to_pylist(), t["n"].to_pylist()))
    assert len(rows) > 3  # more rows than distinct flags → partials
    # client-side merge equals the engine-mode final aggregate
    merged = {}
    for flag, n in rows:
        merged[flag] = merged.get(flag, 0) + n
    eng = flight_query(server.port,
                       "select returnflag, count(*) as n from lineitem "
                       "group by returnflag", mode="engine")
    final = dict(zip(eng["returnflag"].to_pylist(), eng["n"].to_pylist()))
    assert merged == final


def test_principal_changes_results(server):
    q = "select count(*) as n from lineitem"
    n_def = sum(flight_query(server.port, q)["n"].to_pylist())
    n_all = sum(flight_query(server.port, q,
                             principal="all_access")["n"].to_pylist())
    assert n_all > n_def


def test_invalid_sql_is_flight_error(server):
    import pyarrow.flight as flight
    with pytest.raises(flight.FlightServerError):
        flight_query(server.port, "drop table lineitem")


# -- handshake-token authentication (pki/mod.rs:12-25 analog) ---------------

@pytest.fixture(scope="module")
def auth_server(spark, demo_web):
    s = serve_in_background(spark, demo_web, "na_us", tokens={
        "tok-reader": "reader", "tok-admin": "all_access"})
    yield s
    s.shutdown()


def test_auth_unknown_token_refused(auth_server):
    import pyarrow.flight as flight
    with pytest.raises(flight.FlightError):
        flight_query(auth_server.port, "select count(*) as n from lineitem",
                     token="no-such-token")


def test_auth_missing_token_refused(auth_server):
    import pyarrow.flight as flight
    with pytest.raises(flight.FlightError):
        flight_query(auth_server.port, "select count(*) as n from lineitem")


def test_auth_principal_comes_from_handshake_not_request(auth_server):
    """A reader token asking for principal=all_access in the request JSON
    must still get the reader's (default-permission) row count — the
    identity is the handshake, the JSON field is ignored."""
    q = "select count(*) as n from lineitem"
    n_spoofed = sum(flight_query(auth_server.port, q, principal="all_access",
                                 token="tok-reader")["n"].to_pylist())
    n_admin = sum(flight_query(auth_server.port, q,
                               token="tok-admin")["n"].to_pylist())
    assert n_spoofed < n_admin


def test_auth_ticket_not_redeemable_by_other_principal(auth_server):
    """Origin-user re-check on do_get (flight.rs:396-447): a ticket planned
    for one principal is refused when another principal redeems it."""
    import json

    import pyarrow.flight as flight

    from dataweb_spark.sources.flight_service import _connect

    reader = _connect("127.0.0.1", auth_server.port, "tok-reader")
    cmd = json.dumps({"sql": "select count(*) as n from lineitem",
                      "mode": "engine"}).encode("utf-8")
    info = reader.get_flight_info(flight.FlightDescriptor.for_command(cmd))
    admin = _connect("127.0.0.1", auth_server.port, "tok-admin")
    with pytest.raises(flight.FlightError):
        admin.do_get(info.endpoints[0].ticket).read_all()
