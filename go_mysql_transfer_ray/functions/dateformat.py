"""yyyy-MM-dd date-format DSL → strftime patterns.

Re-expression of the reference's ``ConvertGoFormat``
(/root/reference/util/dates/date_format.go:48-124), which maps a
Java/C#-style DSL onto Go reference-time layouts.  We target strftime
instead.  The reference's quirks are preserved deliberately:

* lowercase ``mm`` (after the longer ``MMMM``/``mmmm``/``MMM``/``mmm``
  forms) is the **month** (date_format.go:61-71);
* uppercase ``MM`` — checked *later*, after months were consumed — is the
  **minute** (date_format.go:98-100);
* ``SS``/``ss`` are seconds; ``HH``/``hh`` hours (12-hour only with ``tt``);
* each family is an if/elif chain: only the first (longest) variant in a
  family is replaced.
"""

from __future__ import annotations


def _first_of(out: str, pairs: list[tuple[str, str]]) -> str:
    for pat, rep in pairs:
        if pat in out:
            return out.replace(pat, rep)
    return out


def to_strftime(dsl: str) -> str:
    out = dsl
    out = _first_of(out, [("YYYY", "%Y"), ("yyyy", "%Y"), ("YY", "%y"), ("yy", "%y")])
    out = _first_of(
        out,
        [("MMMM", "%B"), ("mmmm", "%B"), ("MMM", "%b"), ("mmm", "%b"), ("mm", "%m")],
    )
    out = _first_of(out, [("dddd", "%A"), ("ddd", "%a"), ("dd", "%d")])
    # hour + am/pm: 12-hour only when tt present (date_format.go:83-97)
    if "tt" in out:
        out = _first_of(out, [("HH", "%I"), ("hh", "%I")]).replace("tt", "%p")
    else:
        out = _first_of(out, [("HH", "%H"), ("hh", "%H")])
    # minutes: uppercase MM *after* months were consumed (date_format.go:98-100)
    if "MM" in out:
        out = out.replace("MM", "%M")
    out = _first_of(out, [("SS", "%S"), ("ss", "%S")])
    return out
