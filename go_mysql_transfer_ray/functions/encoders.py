"""Value encoders + Go-compatible stringification (message-sink parity).

Reference: ``encodeValue`` (/root/reference/service/endpoint/endpoint.go:221-257)
with encoders ``json`` / ``kv-commas`` / ``v-commas`` and an optional
``value_formatter`` Go text/template that overrides the encoder
(/root/reference/global/rule.go:219-226).

Determinism note: the reference iterates a Go map for kv-commas / v-commas,
so its field order is **random per process** (SURVEY §2.2 M8).  A
distributed engine cannot reproduce nondeterminism; we pin the order to the
rule's output-column order (padding order + default columns), which is a
strict determinization of the reference's behavior.

``to_string_go`` reproduces ``stringutil.ToString``
(/root/reference/util/stringutil/string_util.go:162-215): floats use Go's
``strconv.FormatFloat(f, 'f', -1, 64)`` — shortest round-trip decimal,
never exponent notation — matched via numpy's ``format_float_positional``.
nil → "".
"""

from __future__ import annotations

import json
import re

import numpy as np


def to_string_go(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):  # Go default branch → json.Marshal → true/false
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return str(v)
        return np.format_float_positional(v, trim="-")
    if isinstance(v, (int, str)):
        return str(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return json.dumps(v, separators=(",", ":"), sort_keys=True)


def _escape_html_like_go(s: str) -> str:
    """Go's json.Marshal escapes <, >, & by default (SetEscapeHTML)."""
    return s.replace("<", "\\u003c").replace(">", "\\u003e").replace("&", "\\u0026")


def encode_json(kv: dict) -> str:
    """Go ``json.Marshal(map[string]interface{})``: sorted keys, compact,
    HTML-escaped (endpoint.go:233-240).  ``ensure_ascii=False`` because
    Go emits raw UTF-8 payload bytes — only <, >, & are escaped."""
    return _escape_html_like_go(
        json.dumps(kv, separators=(",", ":"), sort_keys=True, ensure_ascii=False)
    )


def encode_kv_commas(kv: dict, order: list[str] | None = None) -> str:
    keys = order if order is not None else list(kv)
    return ",".join(f"{k}={to_string_go(kv[k])}" for k in keys if k in kv)


def encode_v_commas(kv: dict, order: list[str] | None = None) -> str:
    keys = order if order is not None else list(kv)
    return ",".join(to_string_go(kv[k]) for k in keys if k in kv)


_TMPL_RE = re.compile(r"\{\{\s*\.([A-Za-z0-9_]+)\s*\}\}")


def compile_template(tmpl: str):
    """Minimal Go text/template subset: ``{{.Field}}`` substitution.

    The reference compiles value/key formatters with text/template
    (/root/reference/global/rule.go:219-226,538-545); rule configs in the
    wild use plain field interpolation, which is what we support.  Execution
    error → "" (endpoint.go:222-228).
    """

    def render(kv: dict) -> str:
        return _TMPL_RE.sub(lambda m: _tmpl_value(kv, m.group(1)), tmpl)

    return render


def template_fields(tmpl: str) -> "list[str]":
    """Field names a template references — lets callers project a batch
    down to just those columns before row-materializing it."""
    return list(dict.fromkeys(m.group(1) for m in _TMPL_RE.finditer(tmpl)))


def _tmpl_value(kv: dict, field: str) -> str:
    if field not in kv:
        return "<no value>"  # Go text/template default for a missing map key
    return to_string_go(kv[field])


ENCODERS = {
    "json": lambda kv, order=None: encode_json(kv),
    "kv-commas": encode_kv_commas,
    "v-commas": encode_v_commas,
}
