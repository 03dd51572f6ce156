"""Differential SQL semantics grid: the same generated queries run on
Spark and DuckDB over the same parquet and must agree value-for-value.

A deterministic (not random) cross-product over predicates × connectives ×
groupings — the cheap half of the reference's differential-testing idea
(SURVEY.md §5): every combination exercises null propagation, three-valued
logic, numeric coercion, and aggregate semantics somewhere a hand-written
query might not. ~100 queries at sf0.001, one shared session."""

import math

import duckdb
import pytest

PREDICATES = [
    "l_quantity < 25",
    "l_shipdate >= date '1996-01-01'",
    "l_returnflag = 'N'",
    "l_orderkey % 7 = 0",
    "nullif(l_linestatus, 'O') is null",          # null-injecting
    "l_discount between 0.02 and 0.08",
    "not (l_tax > 0.04)",
]

GROUPINGS = [
    None,
    "l_returnflag",
    "l_returnflag, l_linestatus",
]

AGGS = ("count(*) as n, cast(sum(l_quantity) as bigint) as sq, "
        "round(sum(l_extendedprice), 2) as se")


def _queries():
    out = []
    for i, p1 in enumerate(PREDICATES):
        for p2 in PREDICATES[i + 1:]:
            for conn in ("and", "or"):
                for g in GROUPINGS:
                    where = f"({p1}) {conn} ({p2})"
                    if g is None:
                        out.append(f"select {AGGS} from lineitem "
                                   f"where {where}")
                    else:
                        out.append(
                            f"select {g}, {AGGS} from lineitem "
                            f"where {where} group by {g} "
                            f"order by {g}")
    return out


def _norm(rows):
    def nv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return round(float(v), 6)
        except Exception:
            pass
        return v
    return sorted((tuple(nv(v) for v in r) for r in rows), key=repr)


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    from dataweb_spark.queries import register_views
    register_views(spark, sf_dir)
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"create view {t} as "
                    f"select * from '{sf_dir}/{t}.parquet'")
    return spark, con


def test_differential_grid(engines):
    spark, con = engines
    qs = _queries()
    assert len(qs) >= 100
    bad = []
    for q in qs:
        srows = [tuple(r) for r in spark.sql(q).collect()]
        drows = con.execute(q).fetchall()
        if _norm(srows) != _norm(drows):
            bad.append((q, len(srows), len(drows)))
    assert not bad, f"{len(bad)} diverging queries, first: {bad[:3]}"


WFUNCS = [
    "cast(row_number() over w as bigint)",
    "cast(rank() over w as bigint)",
    "cast(dense_rank() over w as bigint)",
    "round(sum(o_totalprice) over w, 2)",
    "round(min(o_totalprice) over w, 2)",
    "lag(o_orderkey, 1) over w",
    "lead(o_orderkey, 2, -1) over w",
    "cast(count(*) over w as bigint)",
]

FRAMES = [
    "",                                                    # default frame
    "rows between 2 preceding and current row",
    "rows between unbounded preceding and current row",
    "range between unbounded preceding and current row",
    "rows between current row and unbounded following",
]


def test_window_differential_grid(engines):
    """Window frames / ranking / navigation must agree with DuckDB —
    default frames, ROWS vs RANGE, and nav-function defaults are where
    engines classically diverge."""
    spark, con = engines
    bad = []
    n = 0
    for f in WFUNCS:
        for frame in FRAMES:
            # frame clauses are illegal for ranking/nav functions
            if frame and ("rank" in f or "row_number" in f
                          or "lag" in f or "lead" in f):
                continue
            w = ("w as (partition by o_orderstatus order by "
                 f"o_orderdate, o_orderkey {frame})")
            q = (f"select o_orderkey, {f} as v from orders "
                 f"where o_custkey < 200 window {w} "
                 "order by o_orderkey")
            n += 1
            srows = [tuple(r) for r in spark.sql(q).collect()]
            drows = con.execute(q).fetchall()
            if _norm(srows) != _norm(drows):
                bad.append((q, len(srows), len(drows)))
    assert n >= 20
    assert not bad, f"{len(bad)} diverging window queries: {bad[:2]}"
