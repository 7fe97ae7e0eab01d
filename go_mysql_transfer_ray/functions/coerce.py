"""Vectorized per-column type normalization — ``convertColumnData`` parity.

The reference normalizes every binlog value per MySQL column type in one
dense function (/root/reference/service/endpoint/endpoint.go:90-219).  Here
each MySQL type becomes a vectorized Arrow kernel over a whole column chunk;
semantics (including the corner cases) are reproduced exactly:

| type      | behavior                                                | ref (endpoint.go) |
|-----------|---------------------------------------------------------|-------------------|
| ENUM      | 1-based ordinal → enum string; out-of-range → ""        | :96-110  |
| SET       | bitmask → comma-joined member names                     | :111-122 |
| BIT       | "\\x01" → 1 else 0                                      | :123-130 |
| STRING    | bytes → utf8                                            | :131-135 |
| JSON      | parse to nested value; parse failure → raw passthrough  | :136-145 |
| DATETIME  | with formatter: parse "%Y-%m-%d %H:%M:%S", reformat;    | :148-163 |
|           | parse failure or zero date → null                       |          |
| DATE      | same, layout "%Y-%m-%d"                                 | :164-179, :40 |
| NUMBER    | string → int64; parse failure → null                    | :180-197 |
| DECIMAL / | string → float64 (decimal loses exactness — reference   | :198-215 |
| FLOAT     | semantics kept; exactness noted in SURVEY §1.3)         |          |
| NULL      | passthrough                                             | :91-93   |
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dateformat import to_strftime

MYSQL_TIME_FORMAT = "%Y-%m-%d %H:%M:%S"  # mysql.TimeFormat analogue
DEFAULT_DATE_FORMAT = "%Y-%m-%d"         # endpoint.go:40


@dataclass(frozen=True)
class ColumnSpec:
    """Column metadata — the analogue of canal's ``schema.TableColumn``."""

    name: str
    mysql_type: str = "string"  # enum|set|bit|string|json|datetime|timestamp|date|number|decimal|float
    enum_values: tuple[str, ...] = ()
    set_values: tuple[str, ...] = ()


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def coerce_enum(col, spec: ColumnSpec) -> pa.Array:
    """int64 ordinal (1-based) → enum string; out-of-range → "" (:96-110)."""
    a = _as_array(col)
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        return a
    idx = pc.subtract(pc.cast(a, pa.int64()), 1)
    ok = pc.and_(
        pc.greater_equal(idx, 0), pc.less(idx, len(spec.enum_values))
    )
    safe = pc.if_else(pc.fill_null(ok, False), idx, 0)
    dictionary = pa.array(list(spec.enum_values) or [""], pa.string())
    taken = dictionary.take(pc.cast(safe, pa.int32())) if len(spec.enum_values) else pa.nulls(len(a), pa.string())
    out = pc.if_else(pc.fill_null(ok, False), taken, pa.scalar("", pa.string()))
    return pc.if_else(pc.is_null(a), pa.scalar(None, pa.string()), out)


def coerce_set(col, spec: ColumnSpec) -> pa.Array:
    """int64 bitmask → comma-joined member names (:111-122)."""
    a = _as_array(col)
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        return a
    v = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
    null = pc.is_null(a).to_numpy(zero_copy_only=False)
    vv = np.where(null, 0, v).astype(np.int64)
    out = np.full(len(vv), "", dtype=object)
    for i, name in enumerate(spec.set_values):
        sel = (vv >> i) & 1 > 0
        out = np.where(sel & (out == ""), name, np.where(sel, out + "," + name, out))
    return pa.array(np.where(null, None, out), pa.string())


def coerce_bit(col, spec: ColumnSpec) -> pa.Array:
    """string "\\x01" → 1 else 0 (:123-130)."""
    a = _as_array(col)
    one = pc.equal(a, pa.scalar("\x01"))
    out = pc.if_else(pc.fill_null(one, False), pa.scalar(1, pa.int64()), pa.scalar(0, pa.int64()))
    return pc.if_else(pc.is_null(a), pa.scalar(None, pa.int64()), out)


def coerce_string(col, spec: ColumnSpec) -> pa.Array:
    a = _as_array(col)
    if pa.types.is_binary(a.type) or pa.types.is_large_binary(a.type):
        return pc.cast(a, pa.string())
    return a


def coerce_json(col, spec: ColumnSpec) -> pa.Array:
    """Parse JSON text; failure → raw value passthrough (:136-145).

    Row-wise by necessity (nested dynamic output); not used in the flagship
    hot path — the lake keeps JSON as utf8 and defers parsing to readers.
    Output is the canonical re-serialization (sorted keys) as utf8.
    """
    a = _as_array(col)
    out = []
    for v in a.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            parsed = json.loads(v)
            out.append(json.dumps(parsed, sort_keys=True, separators=(",", ":")) if parsed is not None else v)
        except (ValueError, TypeError):
            out.append(v)
    return pa.array(out, pa.string())


def _reformat_temporal(col, in_fmt: str, out_dsl: str) -> pa.Array:
    a = _as_array(col)
    parsed = pc.strptime(a, format=in_fmt, unit="s", error_is_null=True)
    formatted = pc.strftime(parsed, format=to_strftime(out_dsl))
    return pc.if_else(pc.is_null(parsed), pa.scalar(None, pa.string()), formatted)


def coerce_datetime(col, spec: ColumnSpec, formatter: str = "") -> pa.Array:
    """Verbatim unless a formatter is set; unparsable/zero date → null (:148-163)."""
    if not formatter:
        return coerce_string(col, spec)
    return _reformat_temporal(col, MYSQL_TIME_FORMAT, formatter)


def coerce_date(col, spec: ColumnSpec, formatter: str = "") -> pa.Array:
    if not formatter:
        return coerce_string(col, spec)
    return _reformat_temporal(col, DEFAULT_DATE_FORMAT, formatter)


_INT_RE = r"^[+-]?[0-9]+$"
_FLOAT_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def int64_parse_mask(a: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Go ``strconv.ParseInt`` base-10 acceptance INCLUDING the int64
    range check — ``pc.cast`` raises on overflow instead of nulling, so
    a 20-digit value would otherwise kill the whole decode task where
    the reference returns nil.  19-digit magnitudes compare textually
    against the int64 limits (equal-length digit strings order
    numerically)."""
    ok = pc.fill_null(pc.match_substring_regex(a, _INT_RE), False)
    filled = pc.fill_null(a, "")
    digits = pc.utf8_ltrim(pc.utf8_ltrim(filled, "+-"), "0")
    n = pc.utf8_length(digits)
    neg = pc.starts_with(filled, "-")
    lim = pc.if_else(
        neg,
        pa.scalar("9223372036854775808"),
        pa.scalar("9223372036854775807"),
    )
    in_range = pc.or_(
        pc.less(n, 19), pc.and_(pc.equal(n, 19), pc.less_equal(digits, lim))
    )
    return pc.and_(ok, in_range)


def strip_plus_sign(a: "pa.Array | pa.ChunkedArray"):
    """Arrow's string→int64 cast rejects a leading ``+`` that Go's
    ParseInt accepts — strip it before casting."""
    return pc.replace_substring_regex(a, pattern=r"^\+", replacement="")


def coerce_number(col, spec: ColumnSpec) -> pa.Array:
    """string → int64; parse failure OR int64 overflow → null (:180-197,
    strconv.ParseInt semantics)."""
    a = _as_array(col)
    if pa.types.is_integer(a.type):
        return pc.cast(a, pa.int64())
    ok = int64_parse_mask(a)
    return pc.cast(
        pc.if_else(ok, strip_plus_sign(a), pa.scalar(None, pa.string())),
        pa.int64(),
    )


def coerce_float(col, spec: ColumnSpec) -> pa.Array:
    """string → float64; parse failure → null (:198-215)."""
    a = _as_array(col)
    if pa.types.is_floating(a.type) or pa.types.is_integer(a.type):
        return pc.cast(a, pa.float64())
    ok = pc.fill_null(pc.match_substring_regex(a, _FLOAT_RE), False)
    return pc.cast(pc.if_else(ok, a, pa.scalar(None, pa.string())), pa.float64())


_KERNELS = {
    "enum": coerce_enum,
    "set": coerce_set,
    "bit": coerce_bit,
    "string": coerce_string,
    "json": coerce_json,
    "number": coerce_number,
    "decimal": coerce_float,
    "float": coerce_float,
}


def coerce_column(
    col,
    spec: ColumnSpec,
    *,
    datetime_formatter: str = "",
    date_formatter: str = "",
) -> pa.Array:
    t = spec.mysql_type
    if t in ("datetime", "timestamp"):
        return coerce_datetime(col, spec, datetime_formatter)
    if t == "date":
        return coerce_date(col, spec, date_formatter)
    k = _KERNELS.get(t)
    if k is None:
        return _as_array(col)  # unknown type: passthrough (:217-218)
    return k(col, spec)
