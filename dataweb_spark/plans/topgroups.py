"""Federated TOP-GROUPS pushdown: ``ORDER BY agg(...) LIMIT k`` over
``GROUP BY``.

The partial-aggregate decomposer (``plans/aggpush.py``) ships one partial
row per (source, group) — O(groups) wire. For "top groups by a measure"
(the reference's flagship Q3, top revenue groups,
``webengine/src/main.rs:86-124``) that is still the scale killer: with
per-URL / per-domain keys at 100 TB, O(groups) ≈ O(rows). This module
adds the classic distributed top-k-groups protocol (the
threshold-algorithm family — Fagin's TA / Cao & Wang's TPUT) on top of
the SAME decomposition:

* **Round 1 (bound round)** — each source answers the partial query
  ``ORDER BY <partial of the order key> DESC|ASC LIMIT m`` (m = k plus
  slack): its own top-m groups by its LOCAL partial, plus — implicitly,
  as the m-th shipped value — the residual bound τ_s on every group it
  did NOT ship.
* **Round 2 (exact round)** — the union of seen groups is the candidate
  set; every source re-answers the partial query filtered to candidates
  (``HAVING (keys) IN (...)``), so candidate totals merge EXACTLY like
  the aggpush path (same ``AggQuerySpec.merge``).
* **Exclusion proof** — an unseen group's total is bounded by the τ_s
  residuals: for ``sum``/``count`` order keys by Σ_s max(τ_s, 0) (a
  group absent from a source contributes nothing, an unseen-but-present
  one at most τ_s — sound for NEGATIVE values too, which is why the
  max(·, 0) is there); for ``max``/``min`` by max_s τ_s (the merged
  extremum of partials each ≤ τ_s). Exhausted sources (shipped < m
  rows) host no unseen groups and contribute nothing; a NULL-tailed
  DESC fetch means every unseen partial at that source is NULL (NULLS
  LAST ships non-nulls first) and contributes nothing either. When the
  k-th candidate's exact merged value beats the bound, no unseen group
  can enter the top-k and the candidate merge IS the answer. Otherwise
  — or for any shape outside the proof — the caller falls back to the
  aggpush O(groups) path, which is always correct.

Wire: ≤ m rows/source in round 1 + ≤ |candidates| rows/source in round
2 — O(k·sources) and O(k·sources²) — where aggpush ships O(groups) per
source.

Rejection grid (each keeps the existing aggpush path; see
``plan_topk_groups``): HAVING (the bound round can't see which unseen
groups would survive it at a useful price — candidates would need the
k-th SURVIVING value, and survivors of unseen groups are unknowable);
DISTINCT aggregates anywhere (the partial grain refines to (group,
value) pairs — no one-row-per-group partial to bound); ``avg`` order
keys (a ratio of partials has no per-source residual bound);
expression order keys; ``ORDER BY sum/count ASC`` (bottom-k by a
non-negative additive measure is unbounded below by residuals — a
group absent from every round-1 answer can still be globally minimal).

Tie caveat (same as ``plans/topk.py``): when order keys don't totally
order the groups, WHICH boundary-tied groups come back is
protocol-dependent; all answers are valid under SQL semantics. With
multiple order keys the exclusion test is STRICT (a tie on the primary
bound could be broken by a secondary key the residuals know nothing
about); single-key ties at the boundary are the documented
nondeterminism and non-strict exclusion applies.
"""

from __future__ import annotations

import datetime as _dt
import math
import re
from dataclasses import dataclass
from decimal import ROUND_CEILING, ROUND_FLOOR, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataweb_spark.plans.aggpush import AggQuerySpec, _out_name

_BOUNDABLE_FNS = {"sum", "count", "min", "max"}

# candidate sets past this size would render an absurd IN-list; the
# aggpush path is the right plan there anyway (|G| ≤ m·sources, so this
# only trips on very wide federations or very large k)
_MAX_CANDIDATES = 10_000


@dataclass
class TopGroupsPlan:
    """A validated aggregate spec plus the bound-round facts."""

    spec: AggQuerySpec
    pcol: str            # partial column (__p{i}) of the primary order key
    fn: str              # sum | count | min | max
    asc: bool
    digits: int | None   # round(..., d) on the primary output, if any
    strict: bool         # >1 order key: exclusion must be strict
    m: int               # per-source round-1 fetch size
    group_cols: list[str]   # partial-frame column names of the group grain
    group_exprs: list[str]  # source-namespace SQL per group key (aligned)
    primary_name: str    # merged-frame name of the primary order key


def plan_topk_groups(spec: AggQuerySpec) -> TopGroupsPlan | None:
    """Gate ``spec`` into the bound-round protocol, else None (the caller
    keeps the aggpush O(groups) path). See the module docstring for the
    rejection grid and why each entry is there."""
    if spec.limit is None or spec.limit <= 0:
        return None
    if not spec.order_by or not spec.group_attrs:
        return None
    if spec.having_sql is not None:
        return None
    outs = spec.outputs + spec.hidden
    # DISTINCT grain refinement anywhere breaks one-row-per-group partials
    for o in outs:
        if o[0] == "agg" and o[1].endswith("_distinct"):
            return None
    primary_name, asc = spec.order_by[0]
    primary = None
    pidx = None
    for i, o in enumerate(outs):
        if _out_name(o).lower() == primary_name.lower():
            primary, pidx = o, i
            break
    if primary is None or primary[0] != "agg":
        return None  # group-key or expression primary: aggpush path
    _, fn, _arg, _name, digits = primary
    if fn not in _BOUNDABLE_FNS:
        return None  # avg (and any *_distinct, caught above)
    if asc and fn in ("sum", "count"):
        return None  # bottom-k by an additive measure: no residual bound
    # secondary keys only break ties among candidates (whose merged
    # values round 2 computes exactly) — any already-validated key works,
    # but they force strict exclusion at the primary boundary
    group_cols: list[str] = []
    group_exprs: list[str] = []
    extra = dict(spec.extra_groups)
    for g in spec.group_attrs:
        name = next((o[2] for o in spec.outputs
                     if o[0] == "group" and o[1] == g), None)
        if name is None:
            name = extra.get(g)
        if name is None:
            return None  # unprojected group key missing its __g column
        group_cols.append(name)
        group_exprs.append(g)
    k = spec.limit
    return TopGroupsPlan(
        spec=spec, pcol=f"__p{pidx}", fn=fn, asc=asc, digits=digits,
        strict=len(spec.order_by) > 1, m=max(2 * k, k + 16),
        group_cols=group_cols, group_exprs=group_exprs,
        primary_name=primary_name)


def _sql_literal(v, cast_to: str | None = None) -> str | None:
    """Render a collected group-key value as a SPARK SQL literal (the
    round-2 template is executed by Spark — locally over the mapped
    source views, and at peers by their own Spark gateway). None for
    anything unrenderable (NaN, binary, ...) — the caller falls back.

    Scalar form (``cast_to=None``): date/timestamp values render as ISO
    strings — Spark implicitly casts a string literal to the compared
    column's type, which sidesteps the TIMESTAMP-vs-TIMESTAMP_NTZ
    literal distinction (peers share the session timezone — the same
    contract the aggpush calendar-bucketing forward already documents).

    Composite form (``cast_to`` = the column's Spark ``simpleString``
    type): struct-valued IN requires an EXACT struct type match — no
    implicit coercion inside ``(a, b) IN ((..), ..)`` — so every
    element is wrapped in an explicit ``CAST(... AS <type>)``."""
    if isinstance(v, bool):
        base = "TRUE" if v else "FALSE"
    elif isinstance(v, int):
        base = str(v)
    elif isinstance(v, Decimal):
        base = format(v, "f")  # plain digits: an exact Spark decimal literal
    elif isinstance(v, float):
        if not math.isfinite(v):
            return None
        base = f"'{v!r}'" if cast_to else f"CAST('{v!r}' AS DOUBLE)"
    elif isinstance(v, _dt.datetime):  # before date: datetime is a date
        base = "'" + v.isoformat(sep=" ") + "'"
    elif isinstance(v, _dt.date):
        base = "'" + v.isoformat() + "'"
    elif isinstance(v, str):
        # Spark's default parser treats backslash as an escape character
        base = "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    else:
        return None
    if cast_to is None:
        return base
    return f"CAST({base} AS {cast_to.upper()})"


def _live_taus(plan: TopGroupsPlan, per_source: dict) -> tuple:
    """``(ok, taus)`` — the residual bound τ_s per LIVE source, the one
    derivation both the round-1 exclusion and the threshold phase
    consume (a soundness fix here lands in both at once).

    A source is LIVE when it is non-exhausted (shipped a full m rows —
    exhausted sources host no unseen groups) and, under DESC, not
    NULL-tailed (a NULL in a DESC NULLS LAST answer means every non-null
    partial shipped: unseen partials there are NULL, invisible to
    SUM/MAX). ``ok=False`` means no bound exists at some source (an ASC
    fetch whose whole answer was NULLs leaves unseen values unbounded
    below) — the caller falls back."""
    taus: dict[tuple, object] = {}
    for src, rows in per_source.items():
        if len(rows) < plan.m:
            continue  # exhausted: every group of this source was seen
        vals = [r[plan.pcol] for r in rows]
        if not plan.asc:
            if any(v is None for v in vals):
                continue
            taus[src] = min(vals)
        else:
            nonnull = [v for v in vals if v is not None]
            if not nonnull:
                return False, {}
            taus[src] = max(nonnull)
    return True, taus


def _residual_bound(plan: TopGroupsPlan, taus: dict):
    """The provable bound on any UNSEEN group's merged order value, from
    the per-source residuals. None: every unseen group's merged value is
    NULL (no live source), which sorts after every non-NULL candidate."""
    terms = list(taus.values())
    if not terms:
        return None
    if plan.fn in ("sum", "count") and not plan.asc:
        clipped = [t for t in terms if t > 0]
        if not clipped:
            return 0
        if any(isinstance(t, float) for t in clipped):
            # float addition rounds per step; bias the bound upward past
            # any such rounding so it stays an upper bound of the REAL sum
            b = math.fsum(clipped)
            return math.nextafter(math.nextafter(b, math.inf), math.inf)
        return sum(clipped)  # int/Decimal: exact
    return min(terms) if plan.asc else max(terms)


def _rounded_bound(plan: TopGroupsPlan, bound):
    """Push the bound through the primary output's ``round(..., d)``:
    rounding is monotone, so ceiling (DESC) / flooring (ASC) the bound at
    the same scale keeps it a bound on the ROUNDED unseen values.
    Raises ``decimal.InvalidOperation`` when the quantized bound needs
    more than the context's digits — the caller treats that as
    unprovable (review-caught r15: the default 28-digit context made a
    ~1e27 bound CRASH instead of falling back)."""
    if plan.digits is None or bound is None:
        return bound
    import decimal as _decimal
    q = Decimal(1).scaleb(-plan.digits)
    mode = ROUND_FLOOR if plan.asc else ROUND_CEILING
    with _decimal.localcontext() as ctx:
        ctx.prec = 60
        return Decimal(bound).quantize(q, rounding=mode)


def _excludes(plan: TopGroupsPlan, kth, bound) -> bool:
    """True when the k-th candidate's exact merged value provably beats
    every unseen group's bounded value."""
    if kth is None:
        return False  # a NULL boundary can't dominate anything
    if bound is None:
        return True  # unseen values are all NULL: sorted after non-nulls
    kd = Decimal(kth) if isinstance(kth, (int, float)) else kth
    bd = Decimal(bound) if isinstance(bound, (int, float)) else bound
    if plan.asc:
        return kd < bd if plan.strict else kd <= bd
    return kd > bd if plan.strict else kd >= bd


def run_topk_groups(spark: SparkSession, plan: TopGroupsPlan,
                    run_union) -> DataFrame | None:
    """Execute the two-round protocol; None when the exclusion proof
    fails (caller falls back to the aggpush path — always correct).

    ``run_union`` maps a one-entity template SQL to the provenance-tagged
    union of per-source answers (``QueryGateway.query_template_union``).
    Driver-side collects here are BOUNDED BY CONSTRUCTION: round 1 is ≤
    m rows per source endpoint, round 2 ≤ |candidates| ≤ m·sources per
    endpoint (and ≤ ``_MAX_CANDIDATES`` by the explicit gate)."""
    from dataweb_spark.plans.resolve import (
        PROVENANCE_RELAY,
        PROVENANCE_SOURCE,
    )
    spec = plan.spec
    direction = "ASC" if plan.asc else "DESC"
    r1_sql = (f"{spec.partial_sql()} ORDER BY {plan.pcol} {direction} "
              f"LIMIT {plan.m}")
    r1 = run_union(r1_sql, ("order_limit", plan.pcol, plan.asc, plan.m))
    rows = r1.collect()  # ≤ m · endpoints (bounded by construction)
    per_source: dict[tuple, list] = {}
    for r in rows:
        per_source.setdefault(
            (r[PROVENANCE_RELAY], r[PROVENANCE_SOURCE]), []).append(r)

    if all(len(v) < plan.m for v in per_source.values()):
        # every source exhausted: round 1 already holds ALL partials —
        # merge directly (this also covers NULL group keys, which the
        # IN-list below can't express)
        return spec.merge(spark.createDataFrame(rows, r1.schema))

    if any(isinstance(r[plan.pcol], float)
           and not math.isfinite(r[plan.pcol]) for r in rows):
        # NaN/±inf partials poison every bound (Spark sorts NaN greatest,
        # Python min() propagates it, inf-inf merges to NaN) — refuse
        # outright; the aggpush fallback handles them under plain SQL
        # semantics (review-caught r15)
        return None

    ok, taus = _live_taus(plan, per_source)
    if not ok:
        return None
    import decimal as _decimal
    try:
        bound = _rounded_bound(plan, _residual_bound(plan, taus))
    except _decimal.InvalidOperation:
        return None  # bound beyond quantizable precision: unprovable

    candidates = {tuple(r[c] for c in plan.group_cols) for r in rows}
    if len(candidates) > _MAX_CANDIDATES:
        return None
    gtypes = {f.name: f.dataType.simpleString() for f in r1.schema.fields}
    in_pred = _candidates_in_sql(plan, candidates, gtypes)
    if in_pred is None:
        return None
    r2 = run_union(f"{spec.partial_sql()} HAVING {in_pred}",
                   ("having", in_pred))
    # materialize once (bounded): the merged frame is consumed twice —
    # the exclusion probe and the returned answer — and a lazy plan
    # would re-run the whole federated fan-out on each consumption
    r2_rows = r2.collect()
    local = spark.createDataFrame(r2_rows, r2.schema)

    ordered = spec.merge(local, project=False)
    pq = "`" + plan.primary_name.replace("`", "``") + "`"
    vals = [r[0] for r in ordered.select(F.col(pq)).collect()]  # ≤ k rows
    if len(vals) < spec.limit:
        return None  # fewer candidates than k: unseen groups could enter
    if _excludes(plan, vals[-1], bound):
        return spec.merge(local)
    # residual bound inconclusive (flat distributions live here): the
    # TPUT threshold phase proves or disproves exclusion exactly
    return _threshold_phase(spark, plan, run_union, taus, candidates,
                            gtypes, r2_rows, r2.schema, vals[-1])


# Spark simpleString → SQL type name every consumer of the round
# predicates parses identically (Spark, peer gateways, DuckDB, Trino).
# Types outside the map keep the IMPLICIT string-literal form, which only
# Spark-side consumers accept — dialects._UNPORTABLE gates what may reach
# an engine verbatim.
# string/boolean literals already carry their exact type in every
# consumer (and Spark's bare VARCHAR is rejected without a length), so
# they stay uncast; FLOAT parses in Spark and DuckDB (real Trino would
# refuse loudly — float group keys are a documented edge)
_PORTABLE_CAST = {
    "double": "DOUBLE", "float": "FLOAT",
    "bigint": "BIGINT", "int": "INTEGER", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "date": "DATE",
}

_DEC_T = re.compile(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


def _portable_cast(spark_type: str, composite: bool) -> str | None:
    """Cast target for an IN-list literal: portable names where one
    exists; composite (struct-IN) keys additionally fall back to the
    SPARK type name — struct-IN has no implicit coercion, so a
    timestamp/timestamp_ntz element MUST cast exactly (review-caught
    r15: dropping the cast either fails analysis or, worse, compares
    string renderings that never match isoformat — silently dropping
    candidates). Such predicates never reach engines: the renderer
    refuses timestamp-typed group keys semantically."""
    t = spark_type.strip().lower()
    m = _DEC_T.match(t)
    if m:
        return f"DECIMAL({int(m.group(1))}, {int(m.group(2))})"
    p = _PORTABLE_CAST.get(t)
    if p is None and composite and t not in ("string", "boolean"):
        return spark_type.upper()  # Spark-exact (timestamp, ntz, ...)
    return p


def _candidates_in_sql(plan: TopGroupsPlan, groups: set,
                       gtypes: dict) -> str | None:
    """``(keys) IN (...)`` over the SOURCE-namespace group expressions,
    or None when a key is NULL / unrenderable (caller falls back).

    Literals carry EXPLICIT portable casts wherever the type maps
    (``CAST('1995-03-05' AS DATE)``): composite struct-IN needs exact
    type matches on the Spark side, and engine-rendered rounds
    (``dialects.render_partial_agg``) need type names and coercions
    every dialect shares — real Trino refuses implicit varchar→date.
    Scalar timestamp keys keep the implicit ISO-string form (the
    TIMESTAMP vs TIMESTAMP_NTZ split has no one portable spelling);
    composite timestamp keys cast to the SPARK-exact name. Neither form
    reaches an engine: ``render_partial_agg`` refuses timestamp-typed
    group keys SEMANTICALLY (it can see the entity types — a text gate
    can't recognize a bare ISO string, review-caught r15)."""
    composite = len(plan.group_cols) > 1
    lits = []
    for tup in sorted(groups, key=repr):
        if any(v is None for v in tup):
            return None  # IN can't express NULL keys: aggpush path
        parts = [_sql_literal(v, _portable_cast(gtypes[c], composite))
                 for v, c in zip(tup, plan.group_cols)]
        if any(p is None for p in parts):
            return None
        lits.append(parts[0] if len(parts) == 1
                    else "(" + ", ".join(parts) + ")")
    lhs = (plan.group_exprs[0] if len(plan.group_exprs) == 1
           else "(" + ", ".join(plan.group_exprs) + ")")
    return f"{lhs} IN ({', '.join(lits)})"


def _dec(v) -> Decimal:
    """Exact Decimal view of an int/float/Decimal partial (floats convert
    exactly — binary fractions are finite decimals)."""
    return v if isinstance(v, Decimal) else Decimal(v)


# round-3 discovery cap: a threshold phase that ships more than this is
# doing aggpush-scale work — the caller's fallback is the better plan
_MAX_PHASE_ROWS = 50_000


def _threshold_phase(spark: SparkSession, plan: TopGroupsPlan, run_union,
                     taus: dict, candidates: set, gtypes: dict,
                     r2_rows: list, r2_schema, kth) -> DataFrame | None:
    """The TPUT threshold round (Cao & Wang's three-phase uniform
    threshold, adapted to SQL partials): when the round-1 residual bound
    cannot exclude unseen groups — the normal case on FLAT distributions,
    where the k-th total and the per-source residuals are close — probe
    each source for EVERY group whose partial beats a uniform threshold,
    and re-aggregate the pruned survivors exactly.

    * **sum/count (DESC)**: threshold t = kth/|S| over the |S| live
      sources (non-exhausted, non-NULL-tailed — only they can host
      non-NULL unseen partials). A group every live source reports
      below t sums to < |S|·t = kth — STRICTLY below, since the probe
      uses ``>= t`` (discovered-at-threshold groups are kept), so the
      exclusion holds under multi-key (strict) orders too. Requires
      kth > 0: with a non-positive boundary, absent sources (contributing
      nothing) break the per-source split. Discovered groups are pruned
      by exact upper bounds before the fetch: known partials plus
      ``max(min(t, τ_s), 0)`` per missing live source (an unseen group's
      partial is ≤ its source's round-1 residual τ_s AND < t, and absence
      contributes 0).
    * **max (DESC) / min (ASC)**: threshold = kth itself — any group
      whose merged extremum could beat the boundary has SOME partial
      beating it, so the probe's union is complete; no pruning needed
      (the probe ships only boundary-beating groups).

    The probe is capped at ``_MAX_PHASE_ROWS`` collected rows — past
    that, the aggpush fallback is the better plan anyway.

    Refusals beyond the probe cap (each → aggpush fallback): a NULL
    boundary; a ``round(agg, d)`` primary (the boundary is the ROUNDED
    merged value while probes and upper bounds see RAW partials — a raw
    total below every threshold can still ROUND to a boundary tie,
    review-caught r15; the round-1 exclusion handles rounded primaries
    via ``_rounded_bound``); a non-positive additive boundary."""
    from dataweb_spark.plans.resolve import (
        PROVENANCE_RELAY,
        PROVENANCE_SOURCE,
    )
    spec = plan.spec
    if kth is None:
        return None  # a NULL boundary can't dominate anything
    if plan.digits is not None:
        return None  # rounded boundary vs raw partials: unsound split
    if not taus:
        return None  # unreachable: a live-source-free round 1 excludes
    additive = plan.fn in ("sum", "count")
    if additive:
        if not _dec(kth) > 0:
            return None
        if isinstance(kth, float):
            t3 = math.nextafter(kth / len(taus), -math.inf)
        else:
            import decimal as _decimal
            with _decimal.localcontext() as ctx:
                ctx.prec = 60
                ctx.rounding = ROUND_FLOOR
                t3 = _dec(kth) / len(taus)
                # floor-quantize to a Spark-renderable decimal literal
                # (a repeating division would need 60 digits; flooring
                # only widens discovery — sound)
                scale = max(-_dec(kth).as_tuple().exponent, 0) + 6
                t3 = t3.quantize(Decimal(1).scaleb(-scale),
                                 rounding=ROUND_FLOOR)
            if len(t3.as_tuple().digits) > 38:
                return None  # beyond Spark's decimal literal precision
    else:
        t3 = kth
    outs = spec.outputs + spec.hidden
    _, fn, arg, _name, _digits = outs[int(plan.pcol[3:])]
    probe_lit = _sql_literal(t3)
    if probe_lit is None:
        return None
    cmp_op = "<=" if plan.asc else ">="
    probe_pred = f"{fn}({arg if arg else '1'}) {cmp_op} {probe_lit}"
    rows3 = run_union(f"{spec.partial_sql()} HAVING {probe_pred}",
                      ("having", probe_pred)) \
        .limit(_MAX_PHASE_ROWS + 1).collect()
    if len(rows3) > _MAX_PHASE_ROWS:
        return None  # discovery at aggpush scale: fall back outright

    discovered: dict[tuple, dict] = {}
    for r in rows3:
        key = tuple(r[c] for c in plan.group_cols)
        if key in candidates:
            continue
        discovered.setdefault(key, {})[
            (r[PROVENANCE_RELAY], r[PROVENANCE_SOURCE])] = r[plan.pcol]

    if additive:
        kd, td = _dec(kth), _dec(t3)
        import decimal as _decimal
        survivors = set()
        with _decimal.localcontext() as ctx:
            ctx.prec = 60  # exact sums for any realistic partial width
            ctx.rounding = ROUND_CEILING  # any residual rounding biases UP
            for key, parts in discovered.items():
                up = Decimal(0)
                for src, v in parts.items():
                    if v is not None:
                        up += _dec(v)
                for src, tau in taus.items():
                    if src not in parts:
                        miss = min(td, _dec(tau))
                        if miss > 0:
                            up += miss
                if up > kd or (plan.strict and up == kd):
                    survivors.add(key)
    else:
        survivors = set(discovered)

    if not survivors:
        # candidates were the answer after all — round 2 already holds
        # their exact partials
        return spec.merge(spark.createDataFrame(r2_rows, r2_schema))
    if len(candidates) + len(survivors) > _MAX_CANDIDATES:
        return None
    # round 4 fetches SURVIVORS only — round 2 already paid for the
    # candidates' exact partials (review-caught r15: re-fetching the
    # union doubled the final round's wire); the merge unions both
    in_pred = _candidates_in_sql(plan, survivors, gtypes)
    if in_pred is None:
        return None
    r4 = run_union(f"{spec.partial_sql()} HAVING {in_pred}",
                   ("having", in_pred))
    local4 = spark.createDataFrame(r2_rows + r4.collect(), r2_schema)
    return spec.merge(local4)
