"""Federated TOP-K pushdown over engine-mode peers.

For a single-entity ``SELECT … ORDER BY … LIMIT k`` with no aggregation,
the row path ships every (filtered) entity row from every federated
source and sorts locally — O(rows) transfer for a k-row answer. The
classic federated top-k instead ships each source's OWN top-k and
re-merges: the global top-k of a union is contained in the union of
per-source top-ks, so ``k·sources`` rows cross the wire. The reference
pushes LIMIT alone into per-endpoint scans
(``webengine/src/web_source.rs:111-118``) but cannot push a limit
through ORDER BY (a bare per-source limit under a sort is wrong); this
module adds the order-aware form the reference lacks.

Mechanics mirror ``plans/aggpush.py``: the query is parsed with Spark's
own parser and the accepted shape validated node-by-node —
``GlobalLimit(k) → LocalLimit → Sort → {Project/Filter/SubqueryAlias}*
→ entity`` with no aggregates, windows, DISTINCT, subqueries, or stars,
and every ORDER BY expression resolvable from the SELECT's OWN output
columns (the merge re-sorts the union, so a sort key that is not in the
output cannot be replayed — such queries keep the row path). The
gateway then runs the WHOLE query through the template machinery
(identity flight peers receive it verbatim via
``flight_forward_template`` and answer with ≤k rows; row-path sources
compute their top-k locally) and ``TopKSpec.merge`` re-sorts the union
and takes k — which Spark plans as ``TakeOrderedAndProject``, never a
full sort. Anything unprovable returns None: the always-safe direction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataweb_spark.plans.aggpush import _bare_attr, _cls, _tree_has

# nodes the per-source replay makes row-local: each source running the
# full query applies them to its own rows only, which composes with the
# outer re-sort iff nothing between Sort and the relation mixes rows
# ACROSS sources (aggregates, windows, distinct, joins, set ops all do)
_ROW_LOCAL = {"Project", "Filter", "SubqueryAlias"}

# expression classes that break per-source replay or merge re-sort
_FORBIDDEN_EXPR = ("Window", "Subquery", "Exists", "ListQuery",
                   "InSubquery", "Star", "Regex", "Generator",
                   "UnresolvedAlias")


@dataclass
class TopKSpec:
    k: int
    # (catalyst-rendered expression sql, "ASC"|"DESC", "NULLS FIRST"|...)
    order: list[tuple[str, str, str]]
    output_cols: list[str]

    def merge(self, union_df: DataFrame) -> DataFrame:
        """Re-sort the union of per-source top-ks and take k — plans as
        ``TakeOrderedAndProject`` over the ≤ k·sources merged rows."""
        from dataweb_spark.plans.resolve import (
            PROVENANCE_RELAY,
            PROVENANCE_SOURCE,
        )
        df = union_df.drop(PROVENANCE_RELAY, PROVENANCE_SOURCE)
        cols = []
        for sql_str, direction, nulls in self.order:
            c = F.expr(sql_str)
            if direction == "DESC":
                c = (c.desc_nulls_first() if nulls == "NULLS FIRST"
                     else c.desc_nulls_last())
            else:
                c = (c.asc_nulls_last() if nulls == "NULLS LAST"
                     else c.asc_nulls_first())
            cols.append(c)
        return df.orderBy(*cols).limit(self.k)


def _project_output_names(project) -> list[str] | None:
    """Output column names of a Project node; None when any item has no
    statically-knowable name (stars, un-aliased expressions) or embeds a
    construct that breaks per-source replay (windows, subqueries)."""
    names: list[str] = []
    items = project.projectList()
    for i in range(items.size()):
        it = items.apply(i)
        if _tree_has(it, _FORBIDDEN_EXPR):
            return None
        cls = _cls(it)
        if cls == "Alias":
            names.append(str(it.name()))
        elif cls == "UnresolvedAttribute":
            parts = it.nameParts()
            names.append(str(parts.apply(parts.size() - 1)))
        else:
            return None
    return names


def _order_attrs_ok(jexpr, outputs_lc: set[str]) -> bool:
    """Every attribute the sort expression references must be one of the
    SELECT's output columns (case-insensitive), else the merge cannot
    replay the sort over the union frame."""
    stack = [jexpr]
    while stack:
        n = stack.pop()
        if _cls(n) == "UnresolvedAttribute":
            a = _bare_attr(n)
            if a is None or a.lower() not in outputs_lc:
                return False
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return True


def extract_topk_query(spark: SparkSession, sql: str,
                       entity: str) -> TopKSpec | None:
    """Parse ``sql`` and return a :class:`TopKSpec` when it is a
    provably per-source-replayable top-k over ``entity``, else None."""
    from dataweb_spark.plans.pruning import _count_entity_refs
    try:
        jplan = spark._jsparkSession.sessionState().sqlParser() \
                     .parsePlan(sql)
    except Exception:
        return None
    if _count_entity_refs(jplan, entity) != 1:
        return None

    # GlobalLimit(Literal k)
    if _cls(jplan) != "GlobalLimit":
        return None
    lim = jplan.limitExpr()
    if _cls(lim) != "Literal":
        return None
    try:
        k = int(str(lim.value()))
    except (TypeError, ValueError):
        return None
    if k <= 0:
        return None
    node = jplan.children().apply(0)
    if _cls(node) != "LocalLimit":
        return None
    node = node.children().apply(0)
    if _cls(node) != "Sort":
        return None
    sort = node

    # chain below the Sort: row-local nodes only, ending at the entity,
    # with exactly one Project (the SELECT) defining the output columns
    outputs: list[str] | None = None
    node = sort.children().apply(0)
    while True:
        cls = _cls(node)
        if cls == "UnresolvedRelation":
            parts = node.multipartIdentifier()
            name = str(parts.apply(parts.size() - 1)).lower()
            if name != entity.lower():
                return None
            break
        if cls not in _ROW_LOCAL:
            return None
        if cls == "Project":
            if outputs is not None:
                return None  # nested SELECTs: keep the row path
            outputs = _project_output_names(node)
            if outputs is None:
                return None
        elif cls == "Filter" and _tree_has(node.condition(),
                                           _FORBIDDEN_EXPR):
            return None
        if node.children().size() != 1:
            return None
        node = node.children().apply(0)
    if outputs is None:
        return None

    outputs_lc = {o.lower() for o in outputs}
    order: list[tuple[str, str, str]] = []
    so_seq = sort.order()
    for i in range(so_seq.size()):
        so = so_seq.apply(i)
        child = so.child()
        if _tree_has(child, _FORBIDDEN_EXPR + ("UnresolvedFunction",)):
            # function calls in the key could be aggregates (parser can't
            # tell) or non-deterministic — conservatively keep row path
            return None
        # ORDER BY <ordinal>: the parser wraps integer literals in
        # UnresolvedOrdinal (spark.sql.orderByOrdinal default true) —
        # bind to the output position; a plain Literal (ordinal binding
        # off, or non-integer) sorts by a constant, which any engine may
        # reorder — keep the row path
        if _cls(child) == "UnresolvedOrdinal":
            try:
                pos = int(str(child.ordinal()))
            except Exception:
                return None
            if not (1 <= pos <= len(outputs)):
                return None
            key_sql = f"`{outputs[pos - 1]}`"
        elif _cls(child) == "Literal":
            return None
        else:
            if not _order_attrs_ok(child, outputs_lc):
                return None
            try:
                key_sql = child.sql()
            except Exception:
                return None
        try:
            direction = str(so.direction().sql()).upper()
            nulls = str(so.nullOrdering().sql()).upper()
        except Exception:
            return None
        order.append((key_sql, direction, nulls))
    if not order:
        return None
    return TopKSpec(k=k, order=order, output_cols=outputs)
