"""Rule DSL → compiled RulePlan — the reference's per-table transform config.

The reference's ``global.Rule`` (~70 fields,
/root/reference/global/rule.go:64-133) is the whole "query language":
column include/exclude, renames (explicit + case policy), default-value
columns, value encoders, per-sink key construction, date formatters and an
optional Lua script.  ``Rule.Initialize`` compiles it into a ``PaddingMap``
(projection plan, /root/reference/global/rule.go:345-407) consulted per row.

Here the same config compiles ONCE into a ``RulePlan`` whose ``apply``
method transforms a whole Arrow batch vectorized; plans are built per
worker inside the rule-engine actor pool (stages/rule_engine.py), i.e. the
Ray equivalent of the reference's process-global rule registry
(/root/reference/global/rule.go:51-54) without shared mutable state.

Pinned reference semantics:

* ``include_columns`` wins over ``exclude_columns`` (rule.go:382-402);
* renames are case-insensitive on the source column (rule.go:363, keyed
  upper-cased) and override the case policy (rule.go:412-416);
* case-policy precedence: underscore→camel > lower > upper
  (rule.go:437-448); camel via lower + Title + lcfirst
  (/root/reference/util/stringutil/string_util.go:270-275);
* default columns are **appended** constants, wrapped by the same name
  policy (rule.go:228-240, endpoint.go:262-270);
* output column order = table column order filtered (Padding order), then
  default columns — also the pinned encoder field order (see
  functions/encoders.py determinism note);
* composite key = separator-less concat of stringified PK values in PK
  order (endpoint.go:309-316); single PK = the converted value
  (endpoint.go:317-322).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from .functions.coerce import ColumnSpec, coerce_column
from .functions.encoders import ENCODERS, compile_template


def _case2camel(name: str) -> str:
    """underscore → camelCase (string_util.go:270-275): lower, Title, lcfirst."""
    parts = name.lower().split("_")
    # Go strings.Title upper-cases the first letter of each word only
    out = "".join(p[:1].upper() + p[1:] for p in parts)
    return out[:1].lower() + out[1:] if out else out


def _parse_kv_config(cfg: "str | dict | None") -> dict[str, str]:
    if not cfg:
        return {}
    if isinstance(cfg, dict):
        return dict(cfg)
    out = {}
    for part in cfg.split(","):
        k, _, v = part.partition("=")
        out[k] = v
    return out


def _parse_list(cfg: "str | list | None") -> list[str]:
    if not cfg:
        return []
    if isinstance(cfg, str):
        return [c for c in cfg.split(",") if c]
    return list(cfg)


@dataclass
class RuleConfig:
    """Declarative rule — field names follow the reference's YAML DSL
    (/root/reference/app.yml:72-129, parsed global/config.go:142-196)."""

    table: str = "repos"
    primary_keys: tuple[str, ...] = ("repo", "path")  # composite (repo,path)
    include_columns: "str | list | None" = None       # rule.go:69
    exclude_columns: "str | list | None" = None       # rule.go:70
    column_mappings: "str | dict | None" = None       # rule.go:71
    default_column_values: "str | dict | None" = None # rule.go:72
    column_lower_case: bool = False                   # rule.go:66
    column_upper_case: bool = False                   # rule.go:67
    column_underscore_to_camel: bool = False          # rule.go:68
    value_encoder: str = "json"                       # rule.go:74
    value_formatter: str = ""                         # rule.go:76 (overrides encoder)
    datetime_formatter: str = ""                      # rule.go:82
    date_formatter: str = ""                          # rule.go:81
    reserve_raw_data: bool = False                    # rule.go:92 (keep old row for UDF)


@dataclass
class Padding:
    """Compiled projection entry (/root/reference/model/padding.go:5-12)."""

    wrap_name: str
    column_name: str
    column_index: int
    spec: ColumnSpec


class RulePlan:
    """Compiled, immutable physical plan for one rule over one schema."""

    def __init__(self, config: RuleConfig, columns: list[ColumnSpec]):
        self.config = config
        self.columns = columns
        self._by_upper = {c.name.upper(): (c, i) for i, c in enumerate(columns)}

        mappings = {
            k.upper(): v for k, v in _parse_kv_config(config.column_mappings).items()
        }
        includes = _parse_list(config.include_columns)
        excludes = set(_parse_list(config.exclude_columns))

        paddings: list[Padding] = []
        if includes:  # include wins (rule.go:382-390)
            for name in includes:
                spec, idx = self._lookup(name)
                paddings.append(self._padding(spec, idx, mappings))
        else:
            for idx, spec in enumerate(columns):
                if spec.name not in excludes:
                    paddings.append(self._padding(spec, idx, mappings))
        self.paddings = paddings

        self.defaults = _parse_kv_config(config.default_column_values)
        self.output_order = [p.wrap_name for p in paddings] + [
            self._wrap_name(k) for k in self.defaults
        ]
        self.value_render = (
            compile_template(config.value_formatter) if config.value_formatter else None
        )
        self.encoder = ENCODERS.get(config.value_encoder)
        self.pk_indices = [self._lookup(k)[1] for k in config.primary_keys]
        self.is_composite = len(self.pk_indices) > 1
        # compile-time guard: a rule output named like a decode meta
        # column (via column_mappings or defaults) would silently
        # overwrite the merge key / op routing downstream
        _meta = {"key", "gtid", "seq_in_txn", "op", "ts", "pos", "table"}
        clash = _meta & set(self.output_order)
        if clash:
            raise ValueError(
                f"rule output column(s) {sorted(clash)} collide with the "
                "engine's meta columns — pick different target names"
            )

    # -- compile helpers --------------------------------------------------

    def _lookup(self, name: str) -> tuple[ColumnSpec, int]:
        hit = self._by_upper.get(name.upper())
        if hit is None:
            raise ValueError(f"rule references unknown column {name!r}")  # rule.go:385-387
        return hit

    def _wrap_name(self, name: str) -> str:
        c = self.config
        if c.column_underscore_to_camel:  # precedence: rule.go:437-448
            return _case2camel(name.lower())
        if c.column_lower_case:
            return name.lower()
        if c.column_upper_case:
            return name.upper()
        return name

    def _padding(self, spec: ColumnSpec, idx: int, mappings: dict) -> Padding:
        wrap = self._wrap_name(spec.name)
        if spec.name.upper() in mappings:  # explicit mapping overrides (rule.go:412-416)
            wrap = mappings[spec.name.upper()]
        return Padding(wrap, spec.name, idx, spec)

    # -- vectorized execution ---------------------------------------------

    def apply(self, batch: pa.Table) -> pa.Table:
        """Project + coerce + rename + append defaults, one Arrow batch."""
        cols: dict[str, pa.Array] = {}
        for p in self.paddings:
            arr = coerce_column(
                batch.column(p.column_name),
                p.spec,
                datetime_formatter=self.config.datetime_formatter,
                date_formatter=self.config.date_formatter,
            )
            cols[p.wrap_name] = arr
        n = batch.num_rows
        for k, v in self.defaults.items():
            cols[self._wrap_name(k)] = pa.array([v] * n, pa.string())
        return pa.table(cols)

    def build_key(self, batch: pa.Table) -> pa.Array:
        """Composite: separator-less concat of stringified PK values in PK
        order (endpoint.go:309-316); single PK: converted value."""
        if not self.is_composite:
            spec = self.columns[self.pk_indices[0]]
            # formatter-aware, like the projection: the reference builds
            # the single PK through convertColumnData with the rule's
            # date/datetime formatters (endpoint.go:317-322,156-161)
            return coerce_column(
                batch.column(spec.name),
                spec,
                datetime_formatter=self.config.datetime_formatter,
                date_formatter=self.config.date_formatter,
            )
        parts = []
        for idx in self.pk_indices:
            spec = self.columns[idx]
            col = batch.column(spec.name)
            a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if not pa.types.is_string(a.type):
                a = pc.cast(a, pa.string())  # ToString on already-typed values
            parts.append(a)
        return pc.binary_join_element_wise(*parts, "")

    def encode_values(self, projected: pa.Table) -> pa.Array:
        """Render each projected row to its encoded string (M8).

        Row-wise by contract (the reference renders per row); used only by
        the message-sink parity mode, not the lake hot path.
        """
        rows = projected.to_pylist()
        if self.value_render is not None:  # formatter overrides encoder
            out = [self.value_render(r) for r in rows]
        elif self.encoder is not None:
            order = [c for c in self.output_order if c in projected.column_names]
            out = [self.encoder(r, order) for r in rows]
        else:
            out = ["" for _ in rows]
        return pa.array(out, pa.string())


# the exact character set Go's regexp.QuoteMeta escapes — Python's
# re.escape quotes more (e.g. '-', '#'), which would misclassify literal
# table names as wildcards
_GO_REGEX_SPECIAL = set(r"\.+*?()|[]{}^$")


def expand_rules(
    configs: "list[RuleConfig]", tables: "list[str]"
) -> dict[str, RuleConfig]:
    """Wildcard rule expansion (S6) — the reference matches regex table
    names against information_schema and deep-clones the rule per concrete
    table (/root/reference/service/transfer_service.go:206-246, clone at
    /root/reference/global/rule.go:135-148).  ``tables`` is the known
    table list.  Parity details:

    * wildcard detection = Go ``regexp.QuoteMeta`` semantics (a table is
      a regex iff it contains one of ``\\.+*?()|[]{}^$``);
    * matching = MySQL ``RLIKE`` semantics (transfer_service.go:222-224):
      UNANCHORED, case-insensitive substring regex;
    * every registered rule is a deep clone (both branches clone in the
      reference, transfer_service.go:227-246);
    * ``table='*'`` is rejected (transfer_service.go:209-211); duplicate
      registrations are last-wins (the reference's ``wildcards``
      duplicate-guard map is dead code — it is never written to,
      transfer_service.go:207,214).

    Returns ``{lower(table_name): RuleConfig}`` (rule keys are
    lower-cased, rule.go:150-152)."""
    import copy
    import re

    out: dict[str, RuleConfig] = {}
    for rc in configs:
        if rc.table == "*":
            raise ValueError("wildcard * is not allowed for table name")
        if _GO_REGEX_SPECIAL & set(rc.table):  # regex table name
            pat = re.compile(rc.table, re.IGNORECASE)
            for t in tables:
                if pat.search(t):
                    clone = copy.deepcopy(rc)
                    clone.table = t
                    out[t.lower()] = clone
        else:
            clone = copy.deepcopy(rc)
            out[rc.table.lower()] = clone
    return out
