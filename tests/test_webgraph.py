"""Synthetic web-graph generator invariants (all pure Python — cheap)."""

from ant_spark.functions.htmldom import parse, text
from ant_spark.functions.parse import extract_links
from ant_spark.functions.urlnorm import normalize_or_none
from ant_spark.sources.webgraph import GraphConfig, generate, host_sizes


CFG = GraphConfig(n_pages=300, n_hosts=8)


def test_deterministic():
    p1, r1, s1 = generate(CFG)
    p2, r2, s2 = generate(CFG)
    assert p1.equals(p2) and r1.equals(r2) and s1 == s2


def test_power_law_skew():
    sizes = host_sizes(CFG)
    assert sum(sizes) == CFG.n_pages
    assert sizes[0] > 3 * sizes[-1]  # head host much bigger than tail


def test_analytic_text_matches_parser():
    pages, _, _ = generate(CFG)
    for _, row in pages.iterrows():
        assert text(parse(row.html)) == row.text, row.url


def test_links_normalize_to_canonical_urls():
    pages, _, _ = generate(CFG)
    known = set(pages.url)
    n_links = 0
    for _, row in pages.iterrows():
        for raw in extract_links(row.html, row.url):
            n = normalize_or_none(raw)
            assert n is not None
            scheme = n.split("://", 1)[0]
            assert scheme in ("http", "https")
            n_links += 1
            if "/missing/" not in n:
                assert n in known, (row.url, raw, n)
    assert n_links > CFG.n_pages  # graph is connected-ish


def test_all_pages_reachable_from_seed():
    pages, _, seeds = generate(CFG)
    adj: dict[str, list[str]] = {}
    for _, row in pages.iterrows():
        adj[row.url] = [
            normalize_or_none(l)
            for l in extract_links(row.html, row.url)
        ]
    seen = set(seeds)
    stack = list(seeds)
    while stack:
        u = stack.pop()
        for v in adj.get(u, []):
            if v and v not in seen:
                seen.add(v)
                stack.append(v)
    assert set(pages.url) <= seen
