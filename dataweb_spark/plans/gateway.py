"""Query entry points — the Flight / webengine / REST surface as one class.

Reference entry points (SURVEY.md §3):

* **engine mode** (webengine path, ``webengine/src/main.rs``): the full SQL —
  multi-entity joins allowed — runs over the resolved entity views; Spark
  performs final joins/aggregations exactly where client-side DataFusion did.
* **template mode** (raw Flight path, ``flight_server/src/flight.rs:501-630``):
  one-entity SQL is executed *per mapped source*, returning per-source
  partial results that the caller merges (the reference's tests re-aggregate
  client-side, ``test/validation.py:29-60``). Partial-aggregate semantics are
  a feature, preserved here verbatim.
* **NDJSON export** (REST path, ``rest_server/src/query/utils.rs:57-169``):
  rows serialized with an injected ``_relay_metadata_`` object.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataweb_spark.catalog.model import Web
from dataweb_spark.plans.aggpush import AggQuerySpec
from dataweb_spark.plans.pruning import (
    extract_entity_limit,
    extract_entity_predicates,
    extract_referenced_columns,
    output_shape_has_star,
    source_can_match,
)
from dataweb_spark.plans.resolve import (
    PROVENANCE_RELAY,
    PROVENANCE_SOURCE,
    _apply_remote_mapping,
    _map_conjuncts_through,
    build_source_view,
    register_entity_views,
    resolve_entity,
)
from dataweb_spark.plans.validation import ValidationError, validate_sql


def _forwardable_flight_peer(relay, source, entity_name: str):
    """``(host, port, connection)`` when a whole template query can be
    forwarded to this flight-peer source unchanged, else None.

    Forwarding is sound only when this relay's view of the peer is a pure
    identity window: the peer entity has the same name, EVERY local
    information is mapped to the same-named peer column with the identity
    transformation, and there is no local permission wrapper or derived
    ``source_sql`` — any of those means local semantics must apply to raw
    rows, so the row path stays. ``forward: "false"`` opts a source out."""
    conn = relay.connections.get(source.connection)
    if conn is None or conn.kind != "flight":
        return None
    if source.options.get("forward", "true") == "false":
        return None
    if source.options.get("sql"):
        return None  # explicit peer template: already a forwarded form
    if source.default_permission is not None or source.user_permissions:
        return None
    src_sql = (source.source_sql or "").strip().lower()
    if src_sql and src_sql != "select * from {table}":
        return None
    if source.options.get("entity", source.name) != entity_name:
        return None
    entity = relay.entities[entity_name]
    for info in entity.informations:
        m = source.mapping_for(info.name)
        if (m is None or not m.transformation.is_identity
                or source.field_path(m.field) != info.name):
            return None
    host = conn.options.get("host", "127.0.0.1")
    return host, int(conn.options["port"]), conn


def _engine_agg_candidate(relay, source) -> bool:
    """True when this source is an external SQL engine that MIGHT execute
    a partial-aggregate template itself (``dialects.render_partial_agg``
    applies the full per-column gates at render time; this is the cheap
    pre-gate that decides whether the TEMPLATE path is worth entering for
    an engine-only relay — r15)."""
    conn = relay.connections.get(source.connection)
    if conn is None or conn.kind not in ("flightsql", "trino"):
        return False
    if source.options.get("sql"):
        return False  # explicit statement: already the user's own form
    if source.default_permission is not None or source.user_permissions:
        return False
    src_sql = (source.source_sql or "").strip().lower()
    return not src_sql or src_sql == "select * from {table}"


def _decomposed_template(spark, entity, ename: str, sql: str,
                         partial_aggregate: bool = True,
                         topk_pushdown: bool = True):
    """``(spec, forward_sql, grouped_parsed)`` — the template
    decomposition ``QueryGateway.query`` fans out per source when the
    entity has a whole-forwardable flight peer: partial aggregates, then
    flat top-k, then grouped top-k, in the gateway's exact gating order.
    Every ``spec`` merges the same way (``spec.merge(union_of_partials)``).
    Shared with ``plans/explain.py`` so the EXPLAIN mirror can never
    drift from what execution decides. ``grouped_parsed`` tells the
    caller whether ``extract_grouped_topk`` already ran (and found
    nothing, or this function would have returned it) — the row-path
    grouped extraction skips its JVM parse roundtrip in that case."""
    etypes = {i.name: i.data_type for i in entity.informations}
    if partial_aggregate:
        from dataweb_spark.plans.aggpush import extract_aggregate_query
        spec = extract_aggregate_query(
            spark, sql, ename,
            entity_columns=set(entity.info_names()),
            entity_types=etypes)
        if spec is not None:
            return spec, spec.partial_sql(), False
    if topk_pushdown:
        from dataweb_spark.plans.topk import (
            extract_grouped_topk,
            extract_topk_query,
        )
        tspec = extract_topk_query(spark, sql, ename)
        if tspec is not None:
            return tspec, tspec.forward_sql, False
        gspec = extract_grouped_topk(spark, sql, ename,
                                     entity_types=etypes)
        return gspec, (gspec.forward_sql if gspec is not None else None), \
            True
    return None, None, False


class QueryGateway:
    """The relay's query surface for one (web, home-relay) pair."""

    def __init__(self, spark: SparkSession, web: Web, relay_name: str):
        self.spark = spark
        self.web = web
        self.relay_name = relay_name

    # -- engine mode (webengine analog) ---------------------------------

    def query(self, sql: str, principal: str | None = None,
              include_provenance: bool = False,
              allow_partial: bool = False,
              partial_aggregate: bool = True,
              topk_pushdown: bool = True) -> DataFrame:
        """Full SQL over entity views; joins across entities allowed.

        Before view resolution, the query's per-entity filter conjuncts are
        extracted (Spark's own parser) and used to prune sources whose
        declared bounds can't match — see ``plans/pruning.py``.

        ``allow_partial=True`` applies the reference's peer-failure policy
        (``flight.rs:273-306``): unreachable/broken sources are skipped and
        the query answers from the rest; the skip list lands in
        ``self.last_failures``.

        ``partial_aggregate`` (default on): a single-entity query that
        decomposes into distributive aggregates, over an entity with at
        least one forwardable flight peer, executes as per-source PARTIAL
        aggregates merged locally (``plans/aggpush.py``) — network peers
        ship O(groups) rows instead of O(corpus). Identical answers;
        set False to force the row path.

        ``topk_pushdown`` (default on): an aggregate-free single-entity
        ``ORDER BY ... LIMIT k`` over such an entity runs per-source
        (each peer answers with its OWN top-k — O(k·sources) transfer
        instead of O(rows)) and re-merges with a local
        ``TakeOrderedAndProject`` (``plans/topk.py``; the order-aware
        extension of the reference's bare limit pushdown,
        ``web_source.rs:111-118``). The grouped form — ``row_number()/
        rank()/dense_rank() OVER (PARTITION BY g ORDER BY s) <= n`` in a
        subquery — pushes the same way (each peer answers its own
        top-n per group, O(n·groups·sources) wire) and the merge
        re-windows the union. Caveat for BOTH forms: when the sort keys
        are not a total order over the projected columns, which
        tie-boundary rows come back is engine- and pushdown-dependent
        (all answers valid under SQL semantics) — sort on every
        projected column or set ``topk_pushdown=False`` when strict
        bit-reproducibility matters (see ``plans/topk.py`` docstring).
        The TOP-GROUPS form — ``ORDER BY agg(...) LIMIT k`` over a
        ``GROUP BY`` — additionally runs the two-round threshold-bound
        protocol (``plans/topgroups.py``) when both flags are on: each
        source ships its top-m groups by its LOCAL partial plus exact
        partials for the candidate union — O(k·sources) wire instead of
        the partial merge's O(groups); an unprovable exclusion bound
        falls back to that merge, identical answers either way
        (``self.last_topk_groups`` records which path answered)."""
        entities = validate_sql(self.spark, sql, single_entity=False)
        self.last_topk_groups = False
        known = self.web.relay(self.relay_name).entities
        unknown = {e for e in entities if e not in known}
        if unknown:
            raise ValidationError(
                f"unknown entity(ies): {sorted(unknown)}; "
                f"relay {self.relay_name!r} declares {sorted(known)}")
        gspec_known = False  # did the template branch already parse it?
        if ((partial_aggregate or topk_pushdown)
                and not include_provenance
                and not allow_partial and len(entities) == 1):
            ename = next(iter(entities))
            relay = self.web.relay(self.relay_name)
            # the template path fires when any source can consume a
            # decomposed template better than the row path: a
            # whole-forwardable flight peer, or (r15) an external SQL
            # engine that can execute the partial aggregate ITSELF
            # (dialects.render_partial_agg — the reference runs the
            # whole mapped SQL on the engine, trino.rs:103-190)
            if any(_forwardable_flight_peer(relay, s, ename) is not None
                   or _engine_agg_candidate(relay, s)
                   for s in relay.sources_for_entity(ename)):
                spec, fwd, gspec_known = _decomposed_template(
                    self.spark, known[ename], ename, sql,
                    partial_aggregate, topk_pushdown)
                if spec is not None:
                    self.last_failures = []  # template fails loudly
                    aspec = spec if isinstance(spec, AggQuerySpec) else None
                    if topk_pushdown and aspec is not None:
                        # "top groups": ORDER BY agg() LIMIT k over GROUP
                        # BY runs the two-round bound protocol when the
                        # exclusion is provable — wire O(k·sources) where
                        # the partial merge below ships O(groups); an
                        # unprovable bound falls through to that merge
                        # (plans/topgroups.py)
                        from dataweb_spark.plans.topgroups import (
                            plan_topk_groups,
                            run_topk_groups,
                        )
                        tg = plan_topk_groups(spec)
                        if tg is not None:
                            out = run_topk_groups(
                                self.spark, tg,
                                lambda s, rf=None:
                                self.query_template_union(
                                    s, principal, agg_spec=aspec,
                                    agg_round=rf))
                            if out is not None:
                                self.last_topk_groups = True
                                return out
                    return spec.merge(
                        self.query_template_union(fwd, principal,
                                                  agg_spec=aspec))
        predicates = {
            e: extract_entity_predicates(self.spark, sql, e)
            for e in entities
        }
        limits = {}
        for e in entities:
            lim = extract_entity_limit(self.spark, sql, e)
            if lim is not None:
                limits[e] = lim
        # row-path engine top-k: the ORDER BY + LIMIT fact rides into the
        # source readers (trino/flightsql/non-identity flight render it
        # into the peer SQL — each engine answers with ≤k rows) and the
        # final sql's own sort+limit over the narrowed union is the merge
        order_limits = {}
        grouped_limits = {}
        if topk_pushdown and len(entities) == 1:
            from dataweb_spark.plans.topk import (
                extract_grouped_topk,
                extract_order_limit,
            )
            e = next(iter(entities))
            etypes = {i.name: i.data_type for i in known[e].informations}
            ol = extract_order_limit(self.spark, sql, e,
                                     entity_types=etypes)
            if ol is not None:
                order_limits[e] = ol
            else:
                # row-path GROUPED top-k: trino/flightsql/non-identity
                # flight sources receive a rank-bounded window wrapper
                # (readers._forward_grouped) — ≤ bound rows per physical
                # partition cross the wire; the final sql's own window
                # over the narrowed union is the merge. The template
                # branch above may already have parsed the shape (and
                # found no spec, or it would have returned) — don't pay
                # the JVM parse roundtrip twice.
                gl = None if gspec_known else extract_grouped_topk(
                    self.spark, sql, e, entity_types=etypes)
                if gl is not None:
                    grouped_limits[e] = gl
        referenced = extract_referenced_columns(self.spark, sql)
        self.last_failures: list[tuple[str, str, str]] = []
        register_entity_views(self.spark, self.web, self.relay_name, principal,
                              include_provenance=include_provenance,
                              predicates=predicates,
                              allow_partial=allow_partial,
                              failures=self.last_failures,
                              only=set(entities),
                              limits=limits,
                              referenced=referenced,
                              order_limits=order_limits,
                              grouped_limits=grouped_limits)
        return self.spark.sql(sql)

    # -- template mode (raw Flight analog) ------------------------------

    # round-fact cache size: one entry per distinct partial template this
    # gateway has served (a protocol run uses ONE; a long-lived relay
    # server sees one per distinct aggregate query shape)
    _ROUND_FACT_CAP = 64

    def _round_facts(self, sql: str, base: str) -> dict | None:
        """Pushdown facts for a library-generated aggregate-template
        ROUND (r16, guide §5 — repeated driver work): the multi-round
        top-k-groups protocol re-runs the same partial template with an
        ``ORDER BY … LIMIT`` or ``HAVING`` suffix up to four times, and
        every round re-paid ~5 JVM parse round-trips deriving facts that
        cannot differ between rounds — predicates are harvested only
        from scan-level Filter nodes (a HAVING parses as
        UnresolvedHaving ABOVE the Aggregate), the probe/IN-list
        predicates reference only columns the template already
        references, a LIMIT above the round's ORDER BY never extracts
        (Sort is not limit-transparent), the order/grouped top-k facts
        never fire on an aggregate template, and the template projects
        explicit columns (no star). Facts are computed ONCE from the
        bare template and cached per base string.

        The full ``validate_sql`` still runs on EVERY round SQL (this
        method's caller) — only the fact extraction is shared. ``None``
        when ``sql`` is not a recognizable round form of ``base``
        (suffix other than ORDER BY/HAVING, or one smuggling a subquery
        — a SELECT inside the suffix could reference the entity a
        second time and void the extractors' multi-reference guard), in
        which case the caller keeps the generic per-call parse path."""
        import re as _re

        if not sql.startswith(base):
            return None
        suffix = sql[len(base):].strip()
        if suffix and not (suffix.startswith("ORDER BY")
                           or suffix.startswith("HAVING")):
            return None
        if ";" in suffix or _re.search(r"\bselect\b", suffix, _re.I):
            return None
        cache = self.__dict__.setdefault("_round_fact_cache", {})
        facts = cache.get(base)
        if facts is None:
            ename = next(iter(validate_sql(self.spark, base,
                                           single_entity=True)))
            facts = {
                "entity": ename,
                "conjuncts": extract_entity_predicates(self.spark, base,
                                                       ename),
                "limit": extract_entity_limit(self.spark, base, ename),
                "referenced": extract_referenced_columns(self.spark,
                                                         base),
            }
            while len(cache) >= self._ROUND_FACT_CAP:
                cache.pop(next(iter(cache)))
            cache[base] = facts
        return facts

    def query_template(self, sql: str, principal: str | None = None,
                       agg_spec=None, agg_round=None,
                       template_base: str | None = None
                       ) -> list[tuple[str, str, DataFrame]]:
        """One-entity SQL run independently per mapped source.

        Returns ``[(relay, source_id, partial_df), ...]`` — one entry per
        "endpoint", like the FlightInfo endpoint list
        (``flight.rs:194-232``). Aggregates come back as per-source partials.

        Flight-peer sources whose mapping is a pure identity passthrough
        receive the query ITSELF (relay→relay forwarding,
        ``flight.rs:237-309``): the peer maps it per its own sources and
        only the per-source PARTIAL results cross the wire — for an
        aggregate template, group rows instead of entity rows. Sources
        with permissions, transformations, renames, or a non-trivial
        ``source_sql`` keep the row path (the local relay's mapping
        semantics must apply to raw rows).

        ``agg_spec``/``agg_round`` (r15): when the template is a partial
        aggregate, the caller passes its ``AggQuerySpec`` (plus the
        top-groups round decoration) so EXTERNAL-ENGINE sources can
        execute the aggregation themselves
        (``dialects.render_partial_agg`` — the reference runs the whole
        mapped SQL on the engine, ``trino.rs:103-190``); a source the
        renderer refuses keeps the generic Spark-side path. The SQL text
        and the structured facts describe the SAME query by construction
        (both derive from the spec)."""
        entities = validate_sql(self.spark, sql, single_entity=True)
        entity_name = next(iter(entities))
        relay = self.web.relay(self.relay_name)
        if entity_name not in relay.entities:
            raise ValidationError(f"unknown entity {entity_name!r}")

        # r16: aggregate-protocol rounds share one fact extraction per
        # template (see _round_facts). ``agg_spec`` marks the local
        # coordinator's own rounds; ``template_base`` is the same hint
        # arriving over the wire at a peer relay (flight_service).
        base = (agg_spec.partial_sql() if agg_spec is not None
                else template_base)
        facts = self._round_facts(sql, base) if base else None
        if facts is not None and facts["entity"] == entity_name:
            conjuncts = facts["conjuncts"]
            limit = facts["limit"]
            referenced = facts["referenced"]
            order_limit = None
            grouped_fact = None
            star_out = False
            return self._run_template_sources(
                sql, principal, entity_name, relay, conjuncts, limit,
                referenced, order_limit, grouped_fact, star_out,
                agg_spec, agg_round)

        conjuncts = extract_entity_predicates(self.spark, sql, entity_name)
        limit = extract_entity_limit(self.spark, sql, entity_name)
        # the federated top-k fact: for a provable ORDER BY … LIMIT k the
        # row-path engine readers (trino/flightsql/non-identity flight)
        # render ORDER BY + LIMIT into the peer SQL so each engine answers
        # with ≤k rows (plans/topk.py:extract_order_limit; the consumer
        # re-validates per source — identity mappings, complete filters).
        # extract_entity_limit never fires under a Sort, so `limit` and
        # the fact are mutually exclusive by construction.
        # (extract_order_limit self-gates on a LIMIT token, so aggpush
        # partial templates and plain templates skip the parse roundtrip)
        from dataweb_spark.plans.topk import (
            extract_grouped_topk,
            extract_order_limit,
        )
        etypes = {i.name: i.data_type
                  for i in relay.entities[entity_name].informations}
        order_limit = extract_order_limit(self.spark, sql, entity_name,
                                          entity_types=etypes)
        # the grouped sibling (fires on grouped forward_sql replays too:
        # the reconstructed `… WHERE __gk0 <= n` matches the shape)
        grouped_fact = None
        if order_limit is None:
            grouped_fact = extract_grouped_topk(self.spark, sql,
                                                entity_name,
                                                entity_types=etypes)
        referenced = extract_referenced_columns(self.spark, sql)
        # A width-dependent output (top-level SELECT *) must not be
        # forwarded: the peer's entity may carry more columns than this
        # relay's identity window declares, changing the result schema.
        star_out = output_shape_has_star(self.spark, sql)
        return self._run_template_sources(
            sql, principal, entity_name, relay, conjuncts, limit,
            referenced, order_limit, grouped_fact, star_out,
            agg_spec, agg_round)

    def _run_template_sources(self, sql, principal, entity_name, relay,
                              conjuncts, limit, referenced, order_limit,
                              grouped_fact, star_out, agg_spec, agg_round
                              ) -> list[tuple[str, str, DataFrame]]:
        """The per-source fan-out shared by the generic template path
        and the cached-fact round path (r16): every behavior below —
        forwarding, engine pushdown, replica failover, remote hops — is
        ONE implementation for both."""
        etypes = {i.name: i.data_type
                  for i in relay.entities[entity_name].informations}
        results: list[tuple[str, str, DataFrame]] = []
        visited: set[tuple[str, str]] = set()

        def visit(relay_name: str, ename: str, conj: list,
                  lim: int | None, ref: set[str] | None,
                  chain: list, ol=None) -> None:
            """``chain`` is the (declaring_relay, RemoteEntityMapping) hop
            path from the home entity down to this relay — each peer source
            view is mapped back into the home entity's namespace through it
            (the ``map_remote_request`` identifier-rewrite analog,
            ``core/src/execute/map_remote.rs:17-63``). ``conj``/``lim``/
            ``ref`` are the pushdown facts, re-mapped (or conservatively
            dropped) at every hop."""
            key = (relay_name, ename)
            if key in visited:
                return
            visited.add(key)
            r = self.web.relay(relay_name)

            def run_source(source) -> None:
                if not chain and not star_out:
                    fwd = _forwardable_flight_peer(r, source, ename)
                    if fwd is not None:
                        from dataweb_spark.sources.flight_service import (
                            flight_forward_template,
                        )
                        from dataweb_spark.sources.readers import (
                            flight_client_identity,
                        )
                        host, fport, fconn = fwd
                        results.extend(flight_forward_template(
                            self.spark, host, fport, sql, principal,
                            template_base=(agg_spec.partial_sql()
                                           if agg_spec is not None
                                           else None),
                            # protocol rounds are bounded by construction
                            # and collected on the driver right after —
                            # skip the executor fan-out (r16, guide §5)
                            driver_pull=agg_round is not None,
                            **flight_client_identity(fconn)))
                        return
                if not chain and agg_spec is not None:
                    # r15: external SQL engines execute the partial
                    # aggregate THEMSELVES when the renderer's gates
                    # hold — O(groups) wire instead of the filtered
                    # stream; a refusal keeps the generic path below.
                    # (chain is empty here, so `r` IS the home relay and
                    # the already-computed `etypes` applies.)
                    from dataweb_spark.sources.readers import (
                        engine_partial_frame,
                    )
                    edf = engine_partial_frame(self.spark, r, source,
                                               agg_spec, etypes, agg_round)
                    if edf is not None:
                        results.append((relay_name, source.name, edf))
                        return
                view = build_source_view(
                    self.spark, r, source, principal, conjuncts=conj,
                    limit=(ol[1] if ol else lim),
                    referenced=ref,
                    order_by=(ol[0] if ol else None),
                    grouped=(grouped_fact if not chain else None))
                for decl_relay, rm in reversed(chain):
                    view = _apply_remote_mapping(self.spark, decl_relay,
                                                 rm, view)
                view.drop(PROVENANCE_RELAY, PROVENANCE_SOURCE) \
                    .createOrReplaceTempView(entity_name)
                # may shadow a canonical table name — force the next
                # register_views to rebind the raw views
                from dataweb_spark.session import view_memo_invalidate
                view_memo_invalidate(self.spark)
                results.append((relay_name, source.name,
                                self.spark.sql(sql)))

            # Replica groups: members declare IDENTICAL data, so exactly
            # ONE is queried per group with declared-order failover —
            # the row path (resolve_entity) has always done this; the
            # template path scanning every mirror would DOUBLE rows in
            # every partial merge (aggregates, top-k, grouped top-k) —
            # r14 review catch. Ungrouped sources keep the original
            # fail-loudly semantics (no try wrapper on singletons).
            seen_groups: set[str] = set()
            by_group: dict[str, list] = {}
            for s in r.sources_for_entity(ename):
                g = getattr(s, "replica_group", None)
                if g is not None:
                    by_group.setdefault(g, []).append(s)
            for source in r.sources_for_entity(ename):
                if (conj and source.bounds
                        and not source_can_match(conj, source.bounds)):
                    continue  # pruned endpoint: bounds disjoint from query
                g = getattr(source, "replica_group", None)
                if g is None:
                    run_source(source)
                    continue
                if g in seen_groups:
                    continue  # a preferred mirror already answered
                seen_groups.add(g)
                members = [s for s in by_group[g]
                           if not (conj and s.bounds and
                                   not source_can_match(conj, s.bounds))]
                err = None
                for member in members:
                    try:
                        run_source(member)
                        break
                    except Exception as e:  # noqa: BLE001 — failover
                        err = e
                else:
                    if err is not None:
                        raise err
            for rm in r.remotes_for_entity(ename):
                from dataweb_spark.plans.resolve import (
                    _map_referenced_through,
                    _template_trivial,
                )
                # the order fact is DROPPED at remote hops: the hop's
                # conjunct re-map is itself lossy/widening, which would
                # under-fetch a deeper top-k; forwarded whole templates
                # already carry ORDER BY + LIMIT to flight peers
                visit(rm.peer, rm.remote_entity,
                      _map_conjuncts_through(rm, conj),
                      lim if _template_trivial(rm) else None,
                      _map_referenced_through(rm, ref),
                      chain + [(r, rm)])

        visit(self.relay_name, entity_name, conjuncts, limit, referenced,
              [], ol=order_limit)
        return results

    def query_template_union(self, sql: str, principal: str | None = None,
                             agg_spec=None, agg_round=None) -> DataFrame:
        """Template-mode results concatenated with provenance columns —
        what ``test/flight_utils.py:66-75`` does client-side."""
        parts = [
            df.withColumn(PROVENANCE_RELAY, F.lit(relay))
              .withColumn(PROVENANCE_SOURCE, F.lit(source))
            for relay, source, df in self.query_template(
                sql, principal, agg_spec=agg_spec, agg_round=agg_round)
        ]
        if not parts:
            raise ValidationError("query mapped to no sources")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # -- schema echo (return_arrow_schema analog, flight.rs:565-567) ----

    def query_schema(self, sql: str, principal: str | None = None):
        return self.query(sql, principal).schema

    # -- federation explain ---------------------------------------------

    def explain(self, sql: str, principal: str | None = None,
                include_provenance: bool = False,
                allow_partial: bool = False,
                partial_aggregate: bool = True,
                topk_pushdown: bool = True) -> DataFrame:
        """Pre-flight per-source resolution report: which sources scan,
        prune, or stand by, and exactly what SQL/filters/limit each
        network peer receives. Metadata-only — nothing is scanned. The
        flag quartet matches :meth:`query` so the report models the
        configuration the subsequent call will actually run with."""
        from dataweb_spark.plans.explain import explain_federation
        return explain_federation(self.spark, self.web, self.relay_name,
                                  sql, principal,
                                  include_provenance=include_provenance,
                                  allow_partial=allow_partial,
                                  partial_aggregate=partial_aggregate,
                                  topk_pushdown=topk_pushdown)

    # -- NDJSON export (REST analog) ------------------------------------

    def to_ndjson(self, df: DataFrame, drop_null_columns: bool = True
                  ) -> Iterator[str]:
        """Serialize with ``_relay_metadata_`` injected per record.

        JSON export drops NULL fields per record (the reference's 17-vs-15
        column behavior, ``test/validation.py:17-19``) — Spark's ``toJSON``
        omits null fields natively, matching.
        """
        cols = [c for c in df.columns
                if c not in (PROVENANCE_RELAY, PROVENANCE_SOURCE)]
        meta_parts = []
        if PROVENANCE_RELAY in df.columns:
            meta_parts.append(F.col(PROVENANCE_RELAY).alias(PROVENANCE_RELAY))
        if PROVENANCE_SOURCE in df.columns:
            meta_parts.append(F.col(PROVENANCE_SOURCE).alias(PROVENANCE_SOURCE))
        out = df
        if meta_parts:
            out = df.select(*cols, F.struct(*meta_parts).alias("_relay_metadata_"))
        for line in out.toJSON().toLocalIterator():
            yield line

    @staticmethod
    def parse_ndjson(lines: Iterator[str]) -> list[dict]:
        return [json.loads(x) for x in lines]
