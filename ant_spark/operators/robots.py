"""robots.txt parsing and the allow/crawl-delay join stage.

Parity targets (reference ``internal/robots/cache.go`` + temoto/robotstxt
semantics it depends on):

- lookup key is the *host* (``cache.go:143-144``); one robots per host;
- HTTP status ≥ 400 ⇒ allow-all, no crawl delay (``cache.go:159-163``,
  test ``cache_test.go:87-98``);
- tested path gets a leading ``/`` coerced (``cache.go:94-100``);
- group selection: the group whose agent token is the longest
  case-insensitive prefix-match of the UA wins; ``*`` is the fallback;
- rule matching: Google-REP longest-match-wins over Allow/Disallow with
  ``*`` wildcards and ``$`` end anchor; empty ``Disallow:`` means allow;
  tie → Allow;
- ``Crawl-delay`` applies per matched group (``cache.go:114-136``).

The Spark stage is a **broadcast equi-join** of the frontier against the
small robots dim on ``host`` (the LRU cache analogue — reference J2), then a
vectorized pandas UDF evaluating (body, status, path, ua) → allowed. Parsed
rule-sets are cached per executor keyed by robots body (the per-process
compile-once pattern, like reference's LRU).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


class Rule:
    __slots__ = ("allow", "path", "rx")

    def __init__(self, allow: bool, path: str):
        self.allow = allow
        self.path = path
        if "*" in path or path.endswith("$"):
            rx = "^"
            body = path[:-1] if path.endswith("$") else path
            for ch in body:
                rx += ".*" if ch == "*" else re.escape(ch)
            if path.endswith("$"):
                rx += "$"
            self.rx = re.compile(rx)
        else:
            self.rx = None

    def matches(self, path: str) -> bool:
        if self.rx is not None:
            return self.rx.match(path) is not None
        return path.startswith(self.path)


class Group:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self):
        self.agents: list[str] = []
        self.rules: list[Rule] = []
        self.crawl_delay: float | None = None


class RobotsData:
    """Parsed robots.txt for one host."""

    def __init__(self, groups: list[Group]):
        self.groups = groups

    @classmethod
    def parse(cls, body: str | None) -> "RobotsData":
        groups: list[Group] = []
        cur: Group | None = None
        rules_seen_in_cur = False
        for raw in (body or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if cur is None or rules_seen_in_cur:
                    cur = Group()
                    groups.append(cur)
                    rules_seen_in_cur = False
                cur.agents.append(val.lower())
            elif key in ("disallow", "allow"):
                if cur is None:
                    continue
                rules_seen_in_cur = True
                if val == "":
                    continue  # empty Disallow ⇒ no rule ⇒ allow
                cur.rules.append(Rule(key == "allow", val))
            elif key == "crawl-delay":
                if cur is None:
                    continue
                rules_seen_in_cur = True
                try:
                    cur.crawl_delay = float(val)
                except ValueError:
                    pass
        return cls(groups)

    def find_group(self, ua: str) -> Group | None:
        """Longest agent-token prefix match; '*' fallback."""
        ua = ua.lower()
        best: Group | None = None
        best_len = -1
        star: Group | None = None
        for g in self.groups:
            for a in g.agents:
                if a == "*":
                    if star is None:
                        star = g
                elif ua.startswith(a) and len(a) > best_len:
                    best, best_len = g, len(a)
        return best if best is not None else star

    def allowed(self, path: str, ua: str) -> bool:
        if path == "" or path[0] != "/":
            path = "/" + path  # cache.go:94-100 coercion
        g = self.find_group(ua)
        if g is None:
            return True
        best: Rule | None = None
        best_len = -1
        for r in g.rules:
            if r.matches(path):
                l = len(r.path)
                if l > best_len or (l == best_len and r.allow and best and not best.allow):
                    best, best_len = r, l
        return best.allow if best is not None else True

    def delay(self, ua: str) -> float | None:
        g = self.find_group(ua)
        return g.crawl_delay if g is not None else None


@lru_cache(maxsize=8192)
def _parsed(body: str) -> RobotsData:
    return RobotsData.parse(body)


def allowed_one(body: str | None, status: int | None, path: str, ua: str) -> bool:
    if body is None:
        return True  # no robots row ⇒ allow-all
    if status is not None and status >= 400:
        return True  # cache.go:159-163
    return _parsed(body).allowed(path, ua)


def delay_one(body: str | None, status: int | None, ua: str) -> float | None:
    if body is None or (status is not None and status >= 400):
        return None
    return _parsed(body).delay(ua)


def make_allowed_udf(ua: str):
    """Vectorized (body, status, path) → allowed for a fixed UA."""

    @pandas_udf(BooleanType())
    def allowed_udf(body: pd.Series, status: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [
                allowed_one(
                    b,
                    int(s) if pd.notna(s) else None,
                    p or "/",
                    ua,
                )
                for b, s, p in zip(body, status, path)
            ]
        )

    return allowed_udf


def make_delay_udf(ua: str):
    """Vectorized (body, status) → crawl-delay seconds (null = none).
    Parsed from the body per UA group (cache.go:114-136), so the engine does
    not trust any precomputed convenience column."""
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def delay_udf(body: pd.Series, status: pd.Series) -> pd.Series:
        return pd.Series(
            [
                delay_one(b, int(s) if pd.notna(s) else None, ua)
                for b, s in zip(body, status)
            ],
            dtype="float64",
        )

    return delay_udf


def with_robots(
    frontier: DataFrame,
    robots: DataFrame,
    ua: str,
    path_col: Column,
    join_strategy: str = "auto",
) -> DataFrame:
    """Join robots onto the frontier and add ``robots_allowed`` +
    ``crawl_delay`` columns (reference J2: LRU lookup → dimension join).

    ``join_strategy='auto'`` (default) lets Catalyst/AQE pick: small robots
    dims broadcast (the common case — one row per host, verified by
    tools/explain_audit.py), while a 10^8-host robots table falls back to a
    shuffle join instead of OOMing the driver; at that scale bucket both
    tables by ``host`` in storage for a shuffle-free join.
    ``'broadcast'`` forces the hint.
    """
    rb = robots.select(
        F.col("host").alias("_r_host"),
        F.col("status").alias("_r_status"),
        F.col("body").alias("_r_body"),
    )
    if join_strategy == "broadcast":
        rb = F.broadcast(rb)
    elif join_strategy != "auto":
        raise ValueError(f"unknown join_strategy {join_strategy!r}")
    allowed_udf = make_allowed_udf(ua)
    delay_udf = make_delay_udf(ua)
    out = (
        frontier.join(rb, frontier["host"] == rb["_r_host"], "left")
        .withColumn(
            "robots_allowed",
            allowed_udf(F.col("_r_body"), F.col("_r_status"), path_col),
        )
        .withColumn("crawl_delay", delay_udf(F.col("_r_body"), F.col("_r_status")))
        .drop("_r_host", "_r_status", "_r_body")
    )
    return out
