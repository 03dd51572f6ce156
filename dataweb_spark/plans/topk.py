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
→ entity`` with no aggregates, windows, DISTINCT, subqueries, or stars.
Sort keys resolvable from the SELECT's own output columns merge
directly; keys over UNPROJECTED entity columns ship as HIDDEN columns
(``__tk0`` …) appended to a reconstructed forward query — the same
hidden-partial trick the aggregate decomposer uses for HAVING — and are
dropped after the merge. The gateway runs the forward query through the
template machinery (identity flight peers receive it verbatim via
``flight_forward_template`` and answer with ≤k rows; row-path sources
compute their top-k locally) and ``TopKSpec.merge`` re-sorts the union
and takes k — which Spark plans as ``TakeOrderedAndProject``, never a
full sort. Anything unprovable returns None: the always-safe direction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

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
    # (merge-frame expression sql, "ASC"|"DESC", "NULLS FIRST"|...)
    order: list[tuple[str, str, str]]
    output_cols: list[str]
    # the query each source executes (the original SQL, or the
    # reconstructed form carrying hidden sort columns)
    forward_sql: str = ""
    # hidden column names to drop after the merge
    hidden: list[str] = field(default_factory=list)
    # LIMIT k OFFSET n: the offset is GLOBAL — each source fetches its
    # top-(k+n) (forward_sql carries LIMIT k+n, never the offset) and
    # the merge skips n rows of the re-sorted union
    offset: int = 0

    def merge(self, union_df: DataFrame) -> DataFrame:
        """Re-sort the union of per-source top-ks and take k — plans as
        ``TakeOrderedAndProject`` over the ≤ (k+offset)·sources rows."""
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
        out = df.orderBy(*cols)
        if self.offset:
            out = out.offset(self.offset)
        out = out.limit(self.k)
        # re-project to the declared output set: drops hidden __tk
        # columns and pins the column order the caller's SELECT declared
        # (backtick-quoted so dotted/odd alias names stay one column)
        return out.select(*[F.col("`" + c.replace("`", "``") + "`")
                            for c in self.output_cols])


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


def _expr_attrs(jexpr) -> list[str] | None:
    """All attribute names a sort expression references, lowercased;
    None when any attribute is qualified (multi-part) — scope-sensitive,
    so the conservative answer."""
    out: list[str] = []
    stack = [jexpr]
    while stack:
        n = stack.pop()
        if _cls(n) == "UnresolvedAttribute":
            a = _bare_attr(n)
            if a is None:
                return None
            out.append(a.lower())
            continue
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def _parse_topk_prefix(spark: SparkSession, sql: str, entity: str):
    """Shared plan-prefix validation for both extractors: parse ``sql``
    and return ``(k, offset, sort_node)`` when it opens with the top-k
    shape ``GlobalLimit(Literal k) → LocalLimit → [Offset(Literal n)] →
    Sort(global)`` over a single reference to ``entity``, else None.

    LIMIT k OFFSET n parses with the Offset BELOW the limits; the offset
    is GLOBAL — forwarding it per source would skip n rows at EVERY
    source (wrong rows), so callers turn it into a k+n per-source fetch
    bound and a merge-side skip. SORT BY (per-partition sort) parses as
    Sort with global=false: each source would ship k ARBITRARY rows, not
    its top-k — only a global ORDER BY makes the merge law hold (r13
    review fix, regression-pinned in the rejection grid)."""
    from dataweb_spark.plans.pruning import _count_entity_refs
    try:
        jplan = spark._jsparkSession.sessionState().sqlParser() \
                     .parsePlan(sql)
    except Exception:
        return None
    if _count_entity_refs(jplan, entity) != 1:
        return None
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
    offset = 0
    if _cls(node) == "Offset":
        try:
            off_expr = node.offsetExpr()
            if _cls(off_expr) != "Literal":
                return None
            offset = int(str(off_expr.value()))
        except Exception:
            return None
        if offset < 0:
            return None
        node = node.children().apply(0)
    if _cls(node) != "Sort":
        return None
    try:
        if not bool(getattr(node, "global")()):
            return None
    except Exception:
        return None
    return k, offset, node


def extract_topk_query(spark: SparkSession, sql: str,
                       entity: str) -> TopKSpec | None:
    """Parse ``sql`` and return a :class:`TopKSpec` when it is a
    provably per-source-replayable top-k over ``entity``, else None."""
    prefix = _parse_topk_prefix(spark, sql, entity)
    if prefix is None:
        return None
    k, offset, sort = prefix

    # chain below the Sort: row-local nodes only, ending at the entity,
    # with exactly one Project (the SELECT) defining the output columns.
    # The hidden-key reconstruction additionally needs the EXACT simple
    # shape Sort → Project → Filter* → Relation (no SubqueryAlias, no
    # Filter above the Project): reconstruction re-renders the pieces
    # into a fresh query, and only that shape provably re-renders with
    # identical scoping.
    outputs: list[str] | None = None
    project_node = None
    filter_conds: list = []
    simple_shape = True
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
            project_node = node
        elif cls == "Filter":
            if _tree_has(node.condition(), _FORBIDDEN_EXPR):
                return None
            if outputs is None:
                simple_shape = False  # Filter ABOVE the Project
            else:
                filter_conds.append(node.condition())
        elif cls == "SubqueryAlias":
            simple_shape = False
        if node.children().size() != 1:
            return None
        node = node.children().apply(0)
    if outputs is None:
        return None

    outputs_lc = {o.lower() for o in outputs}
    order: list[tuple[str, str, str]] = []
    # (forward-select sql, hidden name) for keys over unprojected columns
    hidden_items: list[tuple[str, str]] = []
    needs_hidden = False
    so_seq = sort.order()
    parsed_orders: list[tuple] = []
    for i in range(so_seq.size()):
        so = so_seq.apply(i)
        child = so.child()
        if _tree_has(child, _FORBIDDEN_EXPR + ("UnresolvedFunction",)):
            # function calls in the key could be aggregates (parser can't
            # tell) or non-deterministic — conservatively keep row path
            return None
        try:
            direction = str(so.direction().sql()).upper()
            nulls = str(so.nullOrdering().sql()).upper()
        except Exception:
            return None
        parsed_orders.append((so, child, direction, nulls))

    hid = 0
    for so, child, direction, nulls in parsed_orders:
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
            order.append((f"`{outputs[pos - 1]}`", direction, nulls))
            continue
        if _cls(child) == "Literal":
            return None
        attrs = _expr_attrs(child)
        if attrs is None:
            return None
        if not attrs:
            # constant-foldable key (ORDER BY 1+1): sorts by a constant,
            # which any engine may reorder — same hazard as the bare
            # Literal above, caught separately because all() over an
            # empty attr list is vacuously true (r13 review fix)
            return None
        try:
            key_sql = child.sql()
        except Exception:
            return None
        if all(a in outputs_lc for a in attrs):
            # resolvable from the union frame directly
            order.append((key_sql, direction, nulls))
            continue
        # UNPROJECTED key: ship it as a hidden column. Safe only when
        # (a) the simple shape holds (reconstruction preserves scope),
        # (b) NO attr is an output alias — in ORDER BY an alias shadows
        #     the input column, but in the reconstructed SELECT item the
        #     same name would bind to the entity column (or a lateral
        #     alias), silently changing the key
        if not simple_shape or any(a in outputs_lc for a in attrs):
            return None
        needs_hidden = True
        while f"__tk{hid}" in outputs_lc:
            hid += 1
        hname = f"__tk{hid}"
        hid += 1
        hidden_items.append((key_sql, hname))
        order.append((f"`{hname}`", direction, nulls))
    if not order:
        return None

    if not needs_hidden and not offset:
        return TopKSpec(k=k, order=order, output_cols=outputs,
                        forward_sql=sql)
    if offset and not simple_shape:
        return None  # a global offset always needs reconstruction

    # reconstruct the forward query from Catalyst-rendered fragments:
    # SELECT <items>, <key> AS __tkN … FROM entity [WHERE …]
    # ORDER BY <original keys> LIMIT k+offset — parse-checked before use
    try:
        items = []
        plist = project_node.projectList()
        for i in range(plist.size()):
            items.append(str(plist.apply(i).sql()))
        for key_sql, hname in hidden_items:
            items.append(f"{key_sql} AS `{hname}`")
        where = ""
        if filter_conds:
            conj = " AND ".join(f"({c.sql()})" for c in filter_conds)
            where = f" WHERE {conj}"
        order_by = ", ".join(
            f"{child.sql()} {direction} {nulls}"
            if _cls(child) != "UnresolvedOrdinal"
            else f"`{outputs[int(str(child.ordinal())) - 1]}` "
                 f"{direction} {nulls}"
            for _, child, direction, nulls in parsed_orders)
        fwd = (f"SELECT {', '.join(items)} FROM {entity}{where} "
               f"ORDER BY {order_by} LIMIT {k + offset}")
        spark._jsparkSession.sessionState().sqlParser().parsePlan(fwd)
    except Exception:
        return None
    return TopKSpec(k=k, order=order, output_cols=outputs, offset=offset,
                    forward_sql=fwd,
                    hidden=[h for _, h in hidden_items])


# ---------------------------------------------------------------------------
# Row-path engine pushdown: the per-source ORDER BY + LIMIT fact
# ---------------------------------------------------------------------------

def _filters_fully_decompose(conds) -> bool:
    """True iff every Filter condition decomposes COMPLETELY into
    ``col op literal`` conjuncts — the shapes the peer-SQL renderer can
    push. Predicate extraction (`pruning.extract_entity_predicates`) is
    deliberately LOSSY (OR/IN/functions silently contribute nothing):
    sound for pruning and for filter pushdown (the full predicate re-runs
    locally), but an ORDER BY + LIMIT over an under-filtered peer stream
    UNDER-fetches — a superset's top-k can displace true top-k rows that
    the local re-filter then removes. So the order fact exists only when
    the pushed filter provably IS the whole filter."""
    from dataweb_spark.plans.pruning import _CMP_NODES, _literal_value
    stack = list(conds)
    while stack:
        n = stack.pop()
        cls = _cls(n)
        if cls == "And":
            stack.append(n.left())
            stack.append(n.right())
            continue
        if cls not in _CMP_NODES:
            return False
        left, right = n.left(), n.right()
        lc, rc = _cls(left), _cls(right)
        if lc == "UnresolvedAttribute" and rc == "Literal":
            attr, lit = left, right
        elif lc == "Literal" and rc == "UnresolvedAttribute":
            attr, lit = right, left
        else:
            return False
        if _bare_attr(attr) is None or _literal_value(lit) is None:
            return False
    return True


def extract_order_limit(spark: SparkSession, sql: str, entity: str
                        ) -> tuple[list[tuple[str, str, str]], int] | None:
    """The ``(order_keys, k)`` fact a federated SOURCE may apply directly
    — each key a bare ENTITY column with direction and null placement —
    or None.

    This is the row-path sibling of :func:`extract_topk_query`: where
    that one validates the MERGE (keys resolvable from the output frame),
    this one validates the per-source SQL rewrite (keys resolvable to
    base columns an engine dialect can render). Requirements beyond the
    top-k shape: every sort key must be a bare entity column — directly,
    via an output ALIAS of a bare column (covers the hidden ``__tk``
    columns of a reconstructed forward query), or via an ordinal — and
    every Filter in the chain must fully decompose into pushable
    conjuncts (see :func:`_filters_fully_decompose`). The consumer
    (``readers._pushdown_parts``) additionally requires identity
    mappings per source: a transformation-rewritten conjunct pushes with
    WIDENED bounds (float-safety semantics), and a widened filter
    under-fetches a per-source top-k the same way a lossy one does.

    Cheap-gated: a SQL without a LIMIT token can never match, and this
    sits on hot planning paths (every template re-extracts) — skip the
    JVM parsePlan roundtrip entirely (one gate here, not per caller)."""
    import re as _re
    if not _re.search(r"\blimit\b", sql, _re.IGNORECASE):
        return None
    prefix = _parse_topk_prefix(spark, sql, entity)
    if prefix is None:
        return None
    k, offset, sort = prefix
    # each source must fetch its top-(k+offset); the final local sql
    # applies the global offset over the union
    k += offset

    outputs: list[str] | None = None
    alias_child: dict = {}
    filter_conds: list = []
    node = sort.children().apply(0)
    while True:
        cls = _cls(node)
        if cls == "UnresolvedRelation":
            parts = node.multipartIdentifier()
            if str(parts.apply(parts.size() - 1)).lower() != entity.lower():
                return None
            break
        if cls == "Project":
            if outputs is not None:
                return None
            outputs = _project_output_names(node)
            if outputs is None:
                return None
            plist = node.projectList()
            for i in range(plist.size()):
                it = plist.apply(i)
                if _cls(it) == "Alias":
                    alias_child[str(it.name()).lower()] = \
                        it.children().apply(0)
                else:  # UnresolvedAttribute (per _project_output_names)
                    alias_child[outputs[i].lower()] = it
        elif cls == "Filter":
            if _tree_has(node.condition(), _FORBIDDEN_EXPR):
                return None
            filter_conds.append(node.condition())
        else:
            return None  # SubqueryAlias etc.: scope-sensitive, bail
        if node.children().size() != 1:
            return None
        node = node.children().apply(0)
    if outputs is None:
        return None
    if not _filters_fully_decompose(filter_conds):
        return None

    def resolve_to_entity_col(name: str) -> str | None:
        """An ORDER BY attribute binds to the output alias first, then
        the input column; follow an alias to its child and accept only a
        bare base column either way."""
        tgt = alias_child.get(name.lower())
        if tgt is None:
            return name  # not an output name: a base column reference
        a = _bare_attr(tgt)
        return a  # alias of a bare column -> that column; else None

    keys: list[tuple[str, str, str]] = []
    so_seq = sort.order()
    for i in range(so_seq.size()):
        so = so_seq.apply(i)
        child = so.child()
        try:
            direction = str(so.direction().sql()).upper()
            nulls = str(so.nullOrdering().sql()).upper()
        except Exception:
            return None
        if _cls(child) == "UnresolvedOrdinal":
            try:
                pos = int(str(child.ordinal()))
            except Exception:
                return None
            if not (1 <= pos <= len(outputs)):
                return None
            name = outputs[pos - 1]
        else:
            name = _bare_attr(child)
            if name is None:
                return None
        col = resolve_to_entity_col(name)
        if col is None:
            return None
        keys.append((col.lower(), direction, nulls))
    if not keys:
        return None
    return keys, k
