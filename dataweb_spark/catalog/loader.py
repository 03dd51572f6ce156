"""YAML config loader — the ``relayctl apply -f <dir>`` analog.

Reference: config kinds + apply precedence
``core/src/model/config_commands/mod.rs:53-83`` (Entity → LocalData →
LocalMapping → PeerRelay → RemoteMapping → User); server-side upserts
``rest_server/src/admin/utils.rs:28-120``. Here the six kinds collapse into
YAML documents with a ``kind`` key, loaded in precedence order into an
in-memory :class:`RelayCatalog`.

Layout: one directory per relay, any ``*.yaml``/``*.yml`` files, each file one
or more YAML documents::

    kind: Entity
    name: lineitem
    informations:
      - {name: linenumber, data_type: bigint}
      ...

    kind: DataConnection
    name: local_files
    connection_kind: file
    options: {path: /data, format: parquet}

    kind: DataSource
    name: lineitem_a
    connection: local_files
    entity: lineitem
    source_sql: "select * from {table}"
    fields: [{name: l_linenumber, path: l_linenumber}]
    mappings:
      - {information: linenumber, field: l_linenumber}
      - {information: tax_percent, field: l_tax, transform: "{v} * 100",
         inverse: "{v} / 100"}
    default_permission:
      allowed_columns: [l_linenumber, l_tax]
      allowed_rows: "l_returnflag = 'N'"
    user_permissions:
      all_access: {allowed_columns: "*", allowed_rows: "true"}

    kind: RemoteMapping
    local_entity: lineitem
    peer: na_relay
    remote_entity: lineitem
    sql_template: "select * from {entity}"
    info_mappings:
      - {local_info: tax_percent, remote_info: tax, transform: "{v} * 100"}
"""

from __future__ import annotations

import os
from typing import Any, Iterable

import yaml

from dataweb_spark.catalog.model import (
    IDENTITY,
    DataConnection,
    DataField,
    DataSource,
    Entity,
    Information,
    Mapping,
    RelayCatalog,
    RemoteEntityMapping,
    RemoteInfoMapping,
    SourcePermission,
    Transformation,
    Web,
)

_APPLY_PRECEDENCE = [
    "Entity", "DataConnection", "DataSource", "RemoteMapping", "User",
]


def _parse_transform(doc: dict[str, Any]) -> Transformation:
    t = doc.get("transform")
    if not t:
        return IDENTITY
    return Transformation(t, doc.get("inverse", "{v}"))


def _parse_permission(doc: dict[str, Any] | None,
                      all_fields: Iterable[str]) -> SourcePermission | None:
    if doc is None:
        return None
    cols = doc.get("allowed_columns", [])
    if cols == "*":
        cols = list(all_fields)
    return SourcePermission(frozenset(cols), str(doc.get("allowed_rows", "false")))


def _parse_doc(catalog: RelayCatalog, doc: dict[str, Any]) -> None:
    kind = doc.get("kind")
    if kind == "Entity":
        catalog.add_entity(Entity(
            name=doc["name"],
            informations=[Information(i["name"], i["data_type"])
                          for i in doc["informations"]],
        ))
    elif kind == "DataConnection":
        catalog.add_connection(DataConnection(
            name=doc["name"],
            kind=doc.get("connection_kind", "file"),
            options=doc.get("options", {}),
        ))
    elif kind == "DataSource":
        fields = [DataField(f["name"], f.get("path", f["name"]),
                            f.get("data_type"))
                  for f in doc.get("fields", [])]
        field_names = [f.name for f in fields]
        catalog.add_source(DataSource(
            name=doc["name"],
            connection=doc["connection"],
            entity=doc["entity"],
            source_sql=doc.get("source_sql", "select * from {table}"),
            fields=fields,
            mappings=[Mapping(m["information"], m["field"], _parse_transform(m))
                      for m in doc.get("mappings", [])],
            default_permission=_parse_permission(
                doc.get("default_permission"), field_names),
            user_permissions={
                u: _parse_permission(p, field_names)
                for u, p in doc.get("user_permissions", {}).items()
            },
            options=doc.get("options", {}),
            bounds={c: (b[0], b[1])
                    for c, b in doc.get("bounds", {}).items()},
            replica_group=doc.get("replica_group"),
            stat_rows=doc.get("stat_rows"),
        ))
    elif kind == "RemoteMapping":
        catalog.remote_mappings.append(RemoteEntityMapping(
            local_entity=doc["local_entity"],
            peer=doc["peer"],
            remote_entity=doc.get("remote_entity", doc["local_entity"]),
            sql_template=doc.get("sql_template", "select * from {entity}"),
            info_mappings=[
                RemoteInfoMapping(m["local_info"],
                                  m.get("remote_info", m["local_info"]),
                                  _parse_transform(m))
                for m in doc.get("info_mappings", [])
            ],
        ))
    elif kind == "User":
        from dataweb_spark.sources.pki import X509User
        catalog.add_user(X509User(
            x509_sha256=str(doc["x509_sha256"]).upper(),
            principal=doc["principal"],
            x509_subject=doc.get("x509_subject", ""),
            x509_issuer=doc.get("x509_issuer", ""),
            attributes=doc.get("attributes", {}),
        ))
    else:
        raise ValueError(f"unknown config kind {kind!r}")


def apply_config_documents(catalog: RelayCatalog,
                           docs: Iterable[dict[str, Any]]) -> list[str]:
    """Upsert parsed config documents into a LIVE catalog — the server side
    of ``relayctl apply -f`` (``rest_server/src/admin/utils.rs:28-120``):
    same-name Entity/DataConnection/DataSource declarations replace the
    existing object; a RemoteMapping replaces the one with the same
    (local_entity, peer, remote_entity) triple or appends. Documents apply
    in the reference's precedence order
    (``core/src/model/config_commands/mod.rs:53-67``) regardless of input
    order. Returns ``"Kind/name"`` labels of everything applied.

    Queries resolve entity views from the catalog per call, so the next
    query after an apply sees the new shape — no restart, no cache flush.
    """
    docs = [d for d in docs if d]
    docs.sort(key=lambda d: _APPLY_PRECEDENCE.index(d.get("kind", "Entity"))
              if d.get("kind") in _APPLY_PRECEDENCE else 99)
    applied: list[str] = []
    for doc in docs:
        kind = doc.get("kind")
        if kind == "Entity":
            catalog.entities.pop(doc.get("name"), None)
        elif kind == "DataSource":
            catalog.sources.pop(doc.get("name"), None)
        elif kind == "RemoteMapping":
            key = (doc.get("local_entity"), doc.get("peer"),
                   doc.get("remote_entity", doc.get("local_entity")))
            catalog.remote_mappings = [
                rm for rm in catalog.remote_mappings
                if (rm.local_entity, rm.peer, rm.remote_entity) != key]
        _parse_doc(catalog, doc)
        applied.append(
            f"{kind}/{doc.get('name', doc.get('local_entity', '?'))}")
    return applied


def load_relay_dir(name: str, path: str) -> RelayCatalog:
    """Load one relay's config directory into a RelayCatalog."""
    catalog = RelayCatalog(name=name)
    docs: list[dict[str, Any]] = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith((".yaml", ".yml")):
            continue
        with open(os.path.join(path, fn)) as fh:
            for doc in yaml.safe_load_all(fh):
                if doc:
                    docs.append(doc)
    # apply precedence ordering (config_commands/mod.rs:53-67)
    docs.sort(key=lambda d: _APPLY_PRECEDENCE.index(d.get("kind", "Entity"))
              if d.get("kind") in _APPLY_PRECEDENCE else 99)
    for doc in docs:
        _parse_doc(catalog, doc)
    return catalog


def load_web_dir(path: str) -> Web:
    """Load a directory-of-directories (one subdir per relay) into a Web."""
    web = Web()
    for relay_name in sorted(os.listdir(path)):
        sub = os.path.join(path, relay_name)
        if os.path.isdir(sub):
            web.add_relay(load_relay_dir(relay_name, sub))
    return web


# ---------------------------------------------------------------------------
# Catalog → config export (the ``relayctl get/export`` analog): the exact
# inverse of the parser above, so a live catalog — including one mutated
# through ``POST /admin/apply`` — can be checkpointed back to the YAML form
# it was born from. Round-trip contract: ``load(dump(web)) ≡ web``
# (property-tested).
# ---------------------------------------------------------------------------

def _dump_transform(t: Transformation) -> dict[str, Any]:
    if t.is_identity:
        return {}
    return {"transform": t.other_to_local, "inverse": t.local_to_other}


def _dump_permission(p: SourcePermission | None) -> dict[str, Any] | None:
    if p is None:
        return None
    return {"allowed_columns": sorted(p.allowed_columns),
            "allowed_rows": p.allowed_rows}


def relay_documents(catalog: RelayCatalog) -> list[dict[str, Any]]:
    """One config document per catalog object, in apply-precedence order."""
    docs: list[dict[str, Any]] = []
    for e in catalog.entities.values():
        docs.append({"kind": "Entity", "name": e.name,
                     "informations": [{"name": i.name,
                                       "data_type": i.data_type}
                                      for i in e.informations]})
    for c in catalog.connections.values():
        docs.append({"kind": "DataConnection", "name": c.name,
                     "connection_kind": c.kind, "options": dict(c.options)})
    for s in catalog.sources.values():
        doc: dict[str, Any] = {
            "kind": "DataSource", "name": s.name,
            "connection": s.connection, "entity": s.entity,
            "source_sql": s.source_sql,
            "fields": [{"name": f.name, "path": f.path} for f in s.fields],
            "mappings": [dict({"information": m.information,
                               "field": m.field},
                              **_dump_transform(m.transformation))
                         for m in s.mappings],
            "options": dict(s.options),
        }
        if s.default_permission is not None:
            doc["default_permission"] = _dump_permission(s.default_permission)
        if s.user_permissions:
            doc["user_permissions"] = {
                u: _dump_permission(p) for u, p in s.user_permissions.items()}
        if s.bounds:
            doc["bounds"] = {c: [b[0], b[1]] for c, b in s.bounds.items()}
        if s.replica_group is not None:
            doc["replica_group"] = s.replica_group
        if s.stat_rows is not None:
            doc["stat_rows"] = s.stat_rows
        docs.append(doc)
    for rm in catalog.remote_mappings:
        docs.append({"kind": "RemoteMapping",
                     "local_entity": rm.local_entity, "peer": rm.peer,
                     "remote_entity": rm.remote_entity,
                     "sql_template": rm.sql_template,
                     "info_mappings": [
                         dict({"local_info": m.local_info,
                               "remote_info": m.remote_info},
                              **_dump_transform(m.transformation))
                         for m in rm.info_mappings]})
    for u in catalog.users.values():
        docs.append({"kind": "User", "x509_sha256": u.x509_sha256,
                     "principal": u.principal,
                     "x509_subject": u.x509_subject,
                     "x509_issuer": u.x509_issuer,
                     "attributes": dict(u.attributes)})
    return docs


def _doc_key(doc: dict[str, Any]) -> tuple:
    """Identity of a config document: (kind, name) for named kinds, the
    mapping triple for RemoteMapping, the cert fingerprint for User."""
    kind = doc.get("kind")
    if kind == "RemoteMapping":
        return (kind, doc.get("local_entity"), doc.get("peer"),
                doc.get("remote_entity"))
    if kind == "User":
        return (kind, doc.get("x509_sha256"))
    return (kind, doc.get("name"))


def diff_config_documents(catalog: RelayCatalog,
                          docs: Iterable[dict[str, Any]]) -> list[str]:
    """Dry-run of ``apply_config_documents``: what WOULD change.

    Applies the documents to a deep copy of the catalog and diffs the
    canonical export (`relay_documents`) before vs after — so the answer
    reflects exactly the upsert semantics the real apply uses, including
    precedence ordering and same-name replacement. Returns
    ``"Kind/name: added|changed"`` labels (unchanged objects omitted;
    apply never removes, so there are no removals). The live catalog is
    untouched — the ``kubectl diff`` analog for ``relayctl apply``."""
    import copy

    before = {_doc_key(d): d for d in relay_documents(catalog)}
    trial = copy.deepcopy(catalog)
    apply_config_documents(trial, docs)
    out: list[str] = []
    for d in relay_documents(trial):
        key = _doc_key(d)
        label = "/".join(str(p) for p in key)
        if key not in before:
            out.append(f"{label}: added")
        elif before[key] != d:
            out.append(f"{label}: changed")
    return sorted(out)


def dump_relay_dir(catalog: RelayCatalog, path: str) -> str:
    """Write one relay's catalog as ``relay.yaml`` under ``path``."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "relay.yaml")
    with open(out, "w") as fh:
        yaml.safe_dump_all(relay_documents(catalog), fh, sort_keys=False)
    return out


def dump_web_dir(web: Web, path: str) -> list[str]:
    """Write every relay of a Web as a config directory tree —
    ``load_web_dir``'s inverse."""
    written = []
    for name, relay in web.relays.items():
        written.append(dump_relay_dir(relay, os.path.join(path, name)))
    return written


# ---------------------------------------------------------------------------
# Referential validation (the config mistakes users actually make: typo'd
# connection names, mappings to informations the entity doesn't declare,
# remote mappings to peers that aren't in the web). The reference surfaces
# these lazily at query time; validating at apply time turns a mid-query
# failure into an immediate, named config error.
# ---------------------------------------------------------------------------

def validate_web(web: Web) -> list[str]:
    """Referential-integrity check over a loaded catalog. Returns a list of
    human-readable problems (empty = consistent). Checked per relay:
    sources reference existing connections/entities, mappings and bounds
    reference declared informations, declared fields cover mapped fields,
    replica groups don't span entities; across relays: remote mappings
    reference existing peers/entities/informations."""
    problems: list[str] = []
    for rname, relay in web.relays.items():
        group_entity: dict[str, str] = {}
        for s in relay.sources.values():
            where = f"relay {rname!r} source {s.name!r}"
            if s.connection not in relay.connections:
                problems.append(f"{where}: unknown connection "
                                f"{s.connection!r}")
            if s.entity not in relay.entities:
                problems.append(f"{where}: unknown entity {s.entity!r}")
                continue
            entity = relay.entities[s.entity]
            infos = set(entity.info_names())
            declared_fields = {f.name for f in s.fields}
            for m in s.mappings:
                if m.information not in infos:
                    problems.append(
                        f"{where}: mapping to undeclared information "
                        f"{m.information!r}")
                if declared_fields and m.field not in declared_fields:
                    problems.append(
                        f"{where}: mapping from undeclared field "
                        f"{m.field!r}")
            for col in s.bounds:
                if col not in infos:
                    problems.append(f"{where}: bounds on undeclared "
                                    f"information {col!r}")
            if s.replica_group is not None:
                seen = group_entity.setdefault(s.replica_group, s.entity)
                if seen != s.entity:
                    problems.append(
                        f"{where}: replica_group {s.replica_group!r} spans "
                        f"entities {seen!r} and {s.entity!r}")
        for rm in relay.remote_mappings:
            where = (f"relay {rname!r} remote mapping "
                     f"{rm.local_entity!r}→{rm.peer!r}.{rm.remote_entity!r}")
            if rm.local_entity not in relay.entities:
                problems.append(f"{where}: unknown local entity")
                continue
            if rm.peer not in web.relays:
                problems.append(f"{where}: unknown peer relay")
                continue
            peer = web.relays[rm.peer]
            if rm.remote_entity not in peer.entities:
                problems.append(f"{where}: peer has no such entity")
                continue
            local_infos = set(relay.entities[rm.local_entity].info_names())
            remote_infos = set(peer.entities[rm.remote_entity].info_names())
            for im in rm.info_mappings:
                if im.local_info not in local_infos:
                    problems.append(f"{where}: unknown local information "
                                    f"{im.local_info!r}")
                if im.remote_info not in remote_infos:
                    problems.append(f"{where}: unknown remote information "
                                    f"{im.remote_info!r}")
    return problems
