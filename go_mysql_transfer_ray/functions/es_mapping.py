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


def mapping_delta(existing: dict, desired: dict) -> dict:
    """Schema evolution: only the properties missing from the live index
    are added — never mutate or drop existing ones (elastic7.go:119-171)."""
    return {k: v for k, v in desired.items() if k not in existing}
