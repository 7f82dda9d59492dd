"""Crawl operators: matchers, robots, dedupe, politeness, text/dedup/ANN ops."""
