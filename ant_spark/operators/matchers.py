"""URL matchers — native Column predicates.

Parity targets (reference ``matchers.go``):
- ``MatchHostname(h)``: exact host equality; subdomains do NOT match
  (``matchers.go:33-37``, test ``matchers_test.go:18``).
- ``MatchPattern(glob)``: tidwall/match glob (``*`` any run, ``?`` one char)
  against ``host + path`` where a non-slash-leading path gets a leading ``/``
  (``matchers.go:44-48,66-71``); full-string match.
- ``MatchRegexp(expr)``: RE2 regex, *unanchored* search on ``host + path``
  (``matchers.go:55-63``); invalid pattern raises at construction time
  (the reference panics).

Matchers run BEFORE dedupe in the enqueue pipeline (``engine.go:201,338-349``)
so non-matching URLs never enter the seen set — the engine preserves that
ordering. Everything here compiles to native Catalyst expressions (equality,
``startswith``, ``rlike``) so the filter stays inside whole-stage codegen and
can prune at the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ant_spark.functions.urlnorm import host_of, hostpath_of

_GLOB_SPECIALS = set("*?")


def glob_to_regex(pattern: str) -> str:
    """tidwall/match glob → anchored Java/RE2 regex."""
    out = ["^"]
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    out.append("$")
    return "".join(out)


def match_hostname(host: str):
    """Exact host equality predicate builder (matchers.go:33-37)."""

    def pred(url_col: Column) -> Column:
        return host_of(url_col) == F.lit(host)

    return pred


def match_pattern(pattern: str):
    """Glob over host+path (matchers.go:44-48). Simple shapes compile to
    prunable exprs: no specials → equality, single trailing '*' →
    startswith; everything else → anchored rlike."""
    specials = [c for c in pattern if c in _GLOB_SPECIALS]

    def pred(url_col: Column) -> Column:
        subject = hostpath_of(url_col)
        if not specials:
            return subject == F.lit(pattern)
        if specials == ["*"] and pattern.endswith("*"):
            return subject.startswith(pattern[:-1])
        return subject.rlike(glob_to_regex(pattern))

    return pred


def match_regexp(expr: str):
    """Unanchored regex over host+path (matchers.go:55-63); validates the
    pattern on the driver (reference panics on invalid)."""
    re.compile(expr)  # raises re.error like the reference's panic

    def pred(url_col: Column) -> Column:
        return hostpath_of(url_col).rlike(expr)

    return pred


def match_all(*preds):
    """AND-combine matcher predicates."""

    def pred(url_col: Column) -> Column:
        out = F.lit(True)
        for p in preds:
            out = out & p(url_col)
        return out

    return pred
