"""Engine-dialect SQL rendering for external-engine pushdown.

The reference hand-generates engine SQL per dialect: Trino queries are
built as strings and shipped over the Trino HTTP protocol
(``core/src/execute/data_stores/trino.rs:103-190``), FlightSQL text goes
through the Flight handshake (``flight_sql.rs:37-163``), and the client
unparser renders DataFusion exprs back to SQL
(``webengine/src/expr_to_sql.rs:32-190``, literal support ``:124-190``).
This module is the Spark-side analog: one renderer, per-dialect quoting
and literal forms, used by the ``flightsql`` connection kind and available
for JDBC ``dbtable`` subquery pushdown.

Only the conjunct shapes ``pruning.py`` extracts are rendered (col op
literal, AND-joined) — everything else stays local, exactly the
``Inexact``-filter contract of ``web_source.rs:145-159``. Unsupported
literal types return None and the conjunct is skipped (the reference drops
unparseable filters the same way, ``expr_to_sql.rs:14-30``).
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from dataclasses import dataclass

_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class Dialect:
    """Identifier quoting + literal rendering for one engine family."""

    name: str
    ident_quote: str  # '"' (ANSI: Trino, DuckDB, Postgres) or '`' (Spark)
    # True when the consuming engine treats backslash as an escape inside
    # string literals (Spark's default parser). For those engines a literal
    # containing a backslash can't be rendered with quote-doubling alone —
    # a trailing '\' would escape our closing quote and crafted input could
    # break out of the string, so such literals are refused (the conjunct
    # stays local).
    c_style_strings: bool = False

    def ident(self, name: str) -> str | None:
        """Quote an identifier; None when it can't be safely rendered."""
        if self.ident_quote in name:
            return None  # embedded quote: refuse rather than escape-guess
        if _PLAIN_IDENT.match(name):
            return name  # plain names stay bare (matches reference output)
        return f"{self.ident_quote}{name}{self.ident_quote}"

    def literal(self, v) -> str | None:
        """Literal forms per ``expr_to_sql.rs:124-190``: bool, ints, floats,
        strings, dates. Timestamps/binary/arrays are not pushed."""
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return str(v)
        if isinstance(v, float):
            if not math.isfinite(v):
                # repr() would render bare `inf`/`nan` — invalid SQL on
                # every peer (DuckDB binds it as a column name). Refuse;
                # the conjunct stays local, which is always sound.
                return None
            return repr(v)
        if isinstance(v, _dt.datetime):
            return None
        if isinstance(v, _dt.date):
            return f"DATE '{v.isoformat()}'"
        if isinstance(v, str):
            if self.c_style_strings and "\\" in v:
                return None
            return "'" + v.replace("'", "''") + "'"
        return None


SPARK = Dialect("spark", "`", c_style_strings=True)
TRINO = Dialect("trino", '"')
DUCKDB = Dialect("duckdb", '"')

DIALECTS = {d.name: d for d in (SPARK, TRINO, DUCKDB)}


def render_select(dialect: Dialect, table: str,
                  columns: list[str] | None = None,
                  conjuncts: list | None = None,
                  limit: int | None = None,
                  order_by: list[tuple[str, str, str]] | None = None,
                  grouped: tuple | None = None) -> str:
    """``SELECT <cols|*> FROM <table> [WHERE c1 AND c2 ...]
    [ORDER BY ...] [LIMIT n]``.

    ``conjuncts`` are pruning triples ``(col, op, value)``; unrenderable
    ones are silently skipped (filtering stays local — never wrong, only
    less pushed) — EXCEPT that skipping one also suppresses ``limit``:
    a LIMIT applied after an incompletely-pushed filter would return the
    first n rows of the WRONG stream (under-fetch, not over-fetch).
    Today's caller can't hit this (the plan extractor only yields a
    limit for filter-free plans), but the helper must stay safe for any
    caller. ``table`` may be a multi-part name (``catalog.schema.t``);
    each part is quoted independently. An unrenderable table part is an
    error — silently dropping it would target a DIFFERENT table.

    ``order_by`` is the federated top-k fact: ``(col, "ASC"|"DESC",
    "NULLS FIRST"|"NULLS LAST")`` triples, rendered with EXPLICIT null
    placement (Spark defaults ASC→NULLS FIRST where ANSI engines default
    ASC→NULLS LAST — implicit ordering would silently disagree). An
    unrenderable key (or a skipped conjunct) suppresses BOTH the order
    and the limit: a limit without the full order+filter under-fetches.

    ``grouped`` is the per-source GROUPED top-k fact ``(fn, bound,
    partition_cols, order_keys)`` (``readers._forward_grouped``): the
    whole select wraps as ``SELECT * FROM (<select>, <fn>() OVER
    (PARTITION BY … ORDER BY …) AS __dw_rk) WHERE __dw_rk <= bound`` —
    each engine answers ≤ bound rows per partition; the extra
    ``__dw_rk`` column rides back and the mapping layer drops it
    (unmapped physical columns never reach the entity frame). The
    wrapper is a pure row reduction (its absence is always correct), so
    an unrenderable piece or a skipped conjunct silently falls back to
    the plain select — unlike limit/order there is no under-fetch
    hazard in OMITTING it, only in applying it over a superset stream
    (which the skipped-conjunct check prevents). Mutually exclusive
    with ``order_by``/``limit`` by extraction shape.
    """
    parts = [dialect.ident(p) for p in table.split(".")]
    if any(p is None for p in parts):
        raise ValueError(
            f"table name {table!r} not renderable in dialect "
            f"{dialect.name!r}")
    tbl = ".".join(parts)
    cols = "*"
    if columns:
        rendered = [dialect.ident(c) for c in columns]
        if all(r is not None for r in rendered):
            cols = ", ".join(rendered)
    sql = f"SELECT {cols} FROM {tbl}"
    preds = []
    skipped = False
    for col, op, value in conjuncts or []:
        ident = dialect.ident(col)
        lit = dialect.literal(value)
        if ident is not None and lit is not None \
                and op in ("=", "<", "<=", ">", ">="):
            preds.append(f"({ident} {op} {lit})")
        else:
            skipped = True
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    order_ok = True
    if order_by:
        keys = []
        for col, direction, nulls in order_by:
            ident = dialect.ident(col)
            if (ident is None or direction not in ("ASC", "DESC")
                    or nulls not in ("NULLS FIRST", "NULLS LAST")):
                order_ok = False
                break
            keys.append(f"{ident} {direction} {nulls}")
        if order_ok and not skipped:
            sql += " ORDER BY " + ", ".join(keys)
        else:
            order_ok = False
    if limit is not None and not skipped and order_ok:
        sql += f" LIMIT {int(limit)}"

    if grouped is not None and not skipped and order_by is None \
            and limit is None:
        # `sql` here is exactly `SELECT {cols} FROM {tbl}[ WHERE …]` —
        # the order/limit clauses above are mutually exclusive with the
        # grouped fact — so the window item splices in after the
        # projection (the caller-side `__dw_rk` collision guard lives in
        # readers._forward_grouped, which sees the declared physical
        # surface; the check here covers explicit column lists only)
        fn, bound, part_cols, okeys = grouped
        fn_sql = {"row_number": "ROW_NUMBER", "rank": "RANK",
                  "dense_rank": "DENSE_RANK"}.get(fn)
        win_parts = [dialect.ident(c) for c in part_cols]
        keys = []
        for col, direction, nulls in okeys:
            ident = dialect.ident(col)
            if (ident is None or direction not in ("ASC", "DESC")
                    or nulls not in ("NULLS FIRST", "NULLS LAST")):
                keys = None
                break
            keys.append(f"{ident} {direction} {nulls}")
        # the wrapper requires an EXPLICIT inner projection: a star
        # could duplicate an (undeclared) physical `__dw_rk` column,
        # rendering ambiguous SQL that ERRORS the source — and under
        # allow_partial an errored source is silently dropped, which is
        # worse than the wrapper's documented silent fallback
        if (fn_sql is not None and win_parts and keys and cols != "*"
                and all(p is not None for p in win_parts)
                and "__dw_rk" not in {c.lower() for c in (columns or [])}):
            win = (f"{fn_sql}() OVER (PARTITION BY "
                   f"{', '.join(win_parts)} ORDER BY {', '.join(keys)})")
            inner = sql.replace(f"SELECT {cols} FROM",
                                f"SELECT {cols}, {win} AS __dw_rk FROM", 1)
            sql = (f"SELECT * FROM ({inner}) AS __dw_g "
                   f"WHERE __dw_rk <= {int(bound)}")
    return sql


# ---------------------------------------------------------------------------
# Engine-executed partial aggregates (r15)
# ---------------------------------------------------------------------------

# Spark entity type → engine type name for the partial-result CASTs. The
# casts pin the TRANSPORT type to what Spark's own partial aggregation
# would produce, so engine-computed partials union cleanly with Spark- or
# peer-computed ones and the merged schema is path-independent.
_ENGINE_TYPES = {
    "string": "VARCHAR", "double": "DOUBLE", "float": "REAL",
    "bigint": "BIGINT", "int": "INTEGER", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "boolean": "BOOLEAN", "date": "DATE",
    "timestamp": "TIMESTAMP",
}

_DECIMAL_RE = re.compile(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


def _engine_type(entity_type: str | None) -> str | None:
    if entity_type is None:
        return None
    t = entity_type.strip().lower()
    m = _DECIMAL_RE.match(t)
    if m:
        return f"DECIMAL({int(m.group(1))}, {int(m.group(2))})"
    return _ENGINE_TYPES.get(
        {"integer": "int", "long": "bigint", "short": "smallint",
         "byte": "tinyint", "real": "float", "varchar": "string",
         "text": "string"}.get(t, t))


def _sum_type(entity_type: str | None) -> str | None:
    """The engine cast matching SPARK's sum() result type over the arg."""
    if entity_type is None:
        return None
    t = entity_type.strip().lower()
    m = _DECIMAL_RE.match(t)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        return f"DECIMAL({min(38, p + 10)}, {s})"
    t = {"integer": "int", "long": "bigint", "short": "smallint",
         "byte": "tinyint", "real": "float"}.get(t, t)
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "BIGINT"
    if t in ("float", "double"):
        return "DOUBLE"
    return None


# conservative clause-text gates: verbatim WHERE/HAVING text reaches the
# engine only when every token is provably dialect-portable. _UNPORTABLE
# refuses dangerous punctuation (backslash escapes are Spark-only string
# syntax; backticks/double quotes are quoting differences; -- /* ; are
# statement/comment punctuation; / and % have DIFFERENT division/modulo
# semantics across engines — Trino divides integers integrally where
# Spark divides fractionally, review-caught r15; <=> is Spark-only).
# _CLAUSE_WORD + _CLAUSE_KEYWORDS then require every identifier-shaped
# token outside string literals to be a known portable keyword or an
# entity column — unknown FUNCTION names (Spark builtins an engine lacks
# or computes differently) refuse rather than ship.
_CLAUSE_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_CLAUSE_KEYWORDS = {
    "and", "or", "not", "in", "is", "null", "between", "like", "escape",
    "true", "false", "cast", "as", "date", "integer", "int", "bigint",
    "smallint", "tinyint", "double", "float", "real", "decimal",
    "varchar", "boolean",
    # aggregate heads of the protocol's probe predicates (a WHERE can't
    # legally contain them, so allowing them here is inert for WHERE)
    "sum", "count", "min", "max",
}
_CLAUSE_BAD = re.compile(r"[`\";/%]|--|<=>|\btimestamp_ntz\b", re.I)


def _clause_portable(text: str, entity_cols_ci: set) -> bool:
    """True when verbatim clause text is provably dialect-portable.

    Checks, in order: no backslashes anywhere (Spark-only string escape
    syntax — with them, quote-doubling alone can't delimit literals);
    string literals well-formed by quote-doubling; outside literals, no
    dangerous punctuation (backticks/double quotes are quoting
    differences, ``--``/``;`` statement punctuation, ``/`` and ``%``
    have DIFFERENT division/modulo semantics across engines — Trino
    divides integers integrally where Spark divides fractionally,
    review-caught r15 — and ``<=>`` is Spark-only); and every
    identifier-shaped token is a portable keyword or an entity column —
    unknown FUNCTION names (Spark builtins an engine lacks or computes
    differently) refuse rather than ship. Name-preserving mappings are
    the caller's check."""
    if text is None or "\\" in text:
        return False
    stripped = re.sub(r"'[^']*'", " ", text)
    if "'" in stripped:
        return False  # unbalanced quoting: refuse outright
    if _CLAUSE_BAD.search(stripped):
        return False
    for w in _CLAUSE_WORD.findall(stripped):
        lw = w.lower()
        if lw not in _CLAUSE_KEYWORDS and lw not in entity_cols_ci:
            return False
    return True


def render_partial_agg(dialect: Dialect, table: str, source, spec,
                       etypes: dict, round_fact=None) -> str | None:
    """Render an ``AggQuerySpec`` partial template as ENGINE SQL, or None
    (the caller keeps the Spark-side generic path — always correct).

    The reference executes the WHOLE mapped SQL on the engine
    (``trino.rs:103-190`` builds and POSTs the statement; DataFusion's
    unparser renders exprs back to SQL, ``expr_to_sql.rs:32-190``); the
    Spark-side analog previously pushed only filters/projections/limits,
    so ``GROUP BY`` over an engine source shipped the filtered STREAM and
    aggregated Spark-side — O(rows) wire. This renders the partial
    aggregation itself, making engine sources first-class citizens of the
    template path: O(groups) wire for plain aggregates, O(k·sources) for
    the top-groups protocol (whose round decorations arrive as
    ``round_fact``).

    Conservative gates — each refusal keeps the generic path:

    * source: trivial ``source_sql``, unpermissioned (same law as
      ``readers._pushdown_parts``);
    * every referenced entity column: bare identifier, IDENTITY-mapped to
      a bare physical path whose declared type (when declared) equals the
      entity type canonically — the partial grain and arithmetic must be
      the entity's own (a narrowing/widening storage type would aggregate
      at a different grain or wrap differently);
    * aggregates: sum/count/min/max/avg (avg ships as the sum+count split,
      exactly ``AggQuerySpec.partial_sql``); ``*_distinct`` refuses (grain
      refinement stays Spark-side in v1); every partial is CAST to the
      type SPARK's partial aggregation would produce, so engine partials
      union schema-identically with Spark/peer partials (DuckDB's
      ``sum(BIGINT)`` natively returns HUGEINT);
    * ``WHERE``/``HAVING`` text renders VERBATIM, gated on (a) every
      source mapping being name-preserving (``info == path`` modulo case —
      renamed columns would need an identifier rewrite inside free text,
      which is exactly the class of string surgery this module refuses)
      and (b) the `_UNPORTABLE` charset gate;
    * ``round_fact``: ``("order_limit", alias, asc, m)`` renders
      ``ORDER BY alias DESC|ASC NULLS LAST|FIRST LIMIT m`` with EXPLICIT
      null placement (Spark's defaults, which the top-groups residual
      arithmetic assumes; ANSI engines default differently), or
      ``("having", pred)`` — the protocol's candidate/probe predicate,
      same text gates as HAVING.
    """
    has_perms = (source.default_permission is not None
                 or bool(source.user_permissions))
    src_sql = (source.source_sql or "").strip().lower()
    if has_perms or (src_sql and src_sql != "select * from {table}"):
        return None
    et_ci = {k.lower(): v for k, v in etypes.items()}

    def canon(t):
        if t is None:
            return None
        t = t.strip().lower()
        return {"integer": "int", "long": "bigint", "short": "smallint",
                "byte": "tinyint", "real": "float", "varchar": "string",
                "text": "string"}.get(t, t)

    def phys(col):
        if not _PLAIN_IDENT.match(col):
            return None
        m = source.mapping_for(col, ci=True)
        if m is None or not m.transformation.is_identity:
            return None
        path = source.field_path(m.field)
        if not _PLAIN_IDENT.match(path):
            return None
        ft = source.field_type(m.field)
        et = et_ci.get(col.lower())
        if et is None:
            return None
        if ft is not None and canon(ft) != canon(et):
            return None
        return path

    items: list[str] = []
    grain: list[str] = []
    for g in spec.group_attrs:
        p = phys(g)
        if p is None:
            return None
        grain.append(p)
    for src_expr, name in spec.extra_groups:
        p = phys(src_expr)
        if p is None or not _PLAIN_IDENT.match(name):
            return None
        items.append(f"{p} AS {name}")
    for i, out in enumerate(spec.outputs + spec.hidden):
        if out[0] == "expr":
            continue  # computed at merge from partial columns
        if out[0] == "group":
            p = phys(out[1])
            if p is None or not _PLAIN_IDENT.match(out[2]):
                return None
            items.append(f"{p} AS {out[2]}")
            continue
        _, fn, arg, _name, _digits = out
        if fn.endswith("_distinct"):
            return None
        if arg is not None:
            p = phys(arg)
            if p is None:
                return None
            at = et_ci.get(arg.lower())
        else:
            p, at = None, None
        if fn == "avg":
            st = _sum_type(at)
            if st is None:
                return None
            items.append(f"CAST(sum({p}) AS {st}) AS __p{i}_s")
            items.append(f"CAST(count({p}) AS BIGINT) AS __p{i}_c")
        elif fn == "count":
            items.append(f"CAST(count({p or '1'}) AS BIGINT) AS __p{i}")
        elif fn == "sum":
            st = _sum_type(at)
            if st is None:
                return None
            items.append(f"CAST(sum({p}) AS {st}) AS __p{i}")
        elif fn in ("min", "max"):
            mt = _engine_type(at)
            if mt is None:
                return None
            items.append(f"CAST({fn}({p}) AS {mt}) AS __p{i}")
        else:
            return None
    if not items:
        return None

    name_preserving = all(
        m.information.lower() == source.field_path(m.field).lower()
        for m in source.mappings)

    def portable(text):
        return (name_preserving
                and _clause_portable(text, set(et_ci)))

    tparts = [dialect.ident(p) for p in table.split(".")]
    if any(p is None for p in tparts):
        return None
    sql = f"SELECT {', '.join(items)} FROM {'.'.join(tparts)}"
    if spec.where_sql:
        if not portable(spec.where_sql):
            return None
        sql += f" WHERE {spec.where_sql}"
    if grain:
        sql += " GROUP BY " + ", ".join(grain)
    if spec.having_sql is not None:
        # spec-level HAVING is rewritten to MERGED names (aggpush) —
        # never renderable at a source; the protocol's per-round HAVING
        # arrives via round_fact instead
        return None
    if round_fact is not None:
        kind = round_fact[0]
        if kind == "order_limit":
            _k, alias, asc, m = round_fact
            if not _PLAIN_IDENT.match(alias) or int(m) <= 0:
                return None
            direction = ("ASC NULLS FIRST" if asc else "DESC NULLS LAST")
            sql += f" ORDER BY {alias} {direction} LIMIT {int(m)}"
        elif kind == "having":
            # SEMANTIC timestamp gate (review-caught r15): the protocol's
            # IN-list predicates render timestamp keys as implicit ISO
            # strings (Spark-side contract) — a text gate can't recognize
            # a bare '2023-01-01 00:00:00', but the entity types are
            # right here: engines either refuse varchar→timestamp (Trino,
            # loud) or compare under a DIFFERENT session-timezone model
            # (silently wrong partials), so these predicates stay
            # Spark-side
            for g in spec.group_attrs:
                gt = (et_ci.get(g.lower()) or "").strip().lower()
                if gt.startswith("timestamp"):
                    return None
            pred = round_fact[1]
            if not portable(pred):
                return None
            sql += f" HAVING {pred}"
        else:
            return None
    return sql
