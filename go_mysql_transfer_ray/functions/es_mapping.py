"""Elasticsearch index-mapping inference + evolution (T7 parity).

The reference derives an ES mapping from the rule's compiled paddings
(``buildPropertiesByRule``, /root/reference/service/endpoint/endpoint.go:
338-384), then on connect diffs desired vs existing properties and adds
only the missing ones (``updateIndexMapping``,
/root/reference/service/endpoint/elastic7.go:119-171).  Our lake is the
canonical sink, but the same inference gives users of the reference's ES
path a drop-in mapping artifact — and the diff logic is the generic
schema-evolution primitive the lake also uses (pyarrow.unify_schemas
widening on ALTER)."""

from __future__ import annotations

from ..rules import RulePlan

_TYPE_MAP = {
    "binary": {"type": "binary"},
    "number": {"type": "long"},
    "decimal": {"type": "double"},
    "float": {"type": "float"},
    "date": {"type": "date", "format": "yyyy-MM-dd"},
    "datetime": {"type": "date", "format": "yyyy-MM-dd HH:mm:ss"},
    "timestamp": {"type": "date", "format": "yyyy-MM-dd HH:mm:ss"},
}


def build_properties(
    plan: RulePlan, es_mappings: "list[dict] | None" = None
) -> dict:
    """Mapping properties from a compiled rule (endpoint.go:338-384):
    paddings by MySQL type (default keyword), default columns keyword,
    explicit es_mappings (field/type/format/analyzer) override last."""
    props: dict = {}
    for p in plan.paddings:
        props[p.wrap_name] = dict(
            _TYPE_MAP.get(p.spec.mysql_type, {"type": "keyword"})
        )
    for key in plan.defaults:
        props[plan._wrap_name(key)] = {"type": "keyword"}
    for m in es_mappings or []:
        prop = {"type": m["type"]}
        if m.get("format"):
            prop["format"] = m["format"]
        if m.get("analyzer"):
            prop["analyzer"] = m["analyzer"]
        props[m["field"]] = prop
    return props


ES6_DEFAULT_TYPE = "_doc"


def es6_doc_type(es_type: "str | None") -> str:
    """ES6 doc ``_type`` default (/root/reference/global/rule.go:589-591:
    empty ``es_type`` → ``_doc``; es7 ignores the property)."""
    return es_type or ES6_DEFAULT_TYPE


def es6_bulk_ops(
    plan: RulePlan,
    batch,
    *,
    index: "str | None" = None,
    es_type: "str | None" = None,
    table_name: str = "",
    action: str = "insert",
):
    """ES6 bulk-op rows: the K4 variant — ``_type`` carried on EVERY op
    (/root/reference/service/endpoint/elastic6.go:191-246: prepareBulk
    receives ``rule.ElsType`` for rule and Lua paths alike; index
    defaults to the table name, rule.go:585-587).

    Returns one row per change row: (es_index, es_type, id, action,
    body) with id = stringified primary key (endpoint.go:309-322) and
    body rendered by the rule's value encoder."""
    import pyarrow as pa

    import pyarrow.compute as pc

    projected = plan.apply(batch)
    body = plan.encode_values(projected)
    # prepareBulk receives stringutil.ToString(id) (elastic6.go:218)
    ids = plan.build_key(batch)
    if not (ids.type == "string"):
        ids = pc.cast(ids, "string")
    n = batch.num_rows
    idx = index or table_name
    return pa.table(
        {
            "es_index": pa.array([idx] * n, pa.string()),
            "es_type": pa.array([es6_doc_type(es_type)] * n, pa.string()),
            "id": ids,
            "action": pa.array([action] * n, pa.string()),
            "body": body,
        }
    )


def mapping_delta(existing: dict, desired: dict) -> dict:
    """Schema evolution: only the properties missing from the live index
    are added — never mutate or drop existing ones (elastic7.go:119-171)."""
    return {k: v for k, v in desired.items() if k not in existing}
