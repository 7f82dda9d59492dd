"""Driver-contract shape checks (no Spark session needed): every oracle has
a query, and the no-oracle set is exactly the documented non-SQL stub."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_every_oracle_key_has_a_query():
    qs = set(entry.queries().keys())
    os_ = set(entry.oracle_sql().keys())
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"


def test_no_oracle_set_is_documented():
    qs = set(entry.queries().keys())
    os_ = set(entry.oracle_sql().keys())
    # media_features_stub is the ONLY rows-only entry (mapInPandas stub
    # kernel — not SQL-expressible); everything else must be oracle-checked.
    assert qs - os_ == {"media_features_stub"}


def test_oracle_sql_is_nonempty_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and len(sql.strip()) > 20, name


# The canonical driver window: the correctness gate hash-verifies exactly the
# FIRST 50 queries() entries. Round 6 shipped 51 entries before the marker and
# emb_ivf_topk_trained silently fell out of the gate — this pin makes any
# future drift a test failure, not a silent coverage loss.
CANONICAL_50 = [
    "crawl_url_normalize", "crawl_dedupe_antijoin", "crawl_frontier_fifo",
    "crawl_politeness_budget", "crawl_retry_backoff",
    "crawl_robots_broadcast_join", "crawl_seq_bfs_order",
    "crawl_metrics_rollup", "crawl_union_dedup", "crawl_first_occurrence",
    "crawl_cache_matrix", "crawl_rate_rule_budget", "crawl_rate_rule_multi",
    "events_sessionize", "crawl_e2e_visited", "crawl_render_visited",
    "crawl_priority_order", "crawl_warc_source", "crawl_warc_tagsoup",
    "crawl_anchor_text", "crawl_sitemap_seeds", "crawl_robots_ttl",
    "crawl_to_training", "crawl_redirects", "media_frame_plan",
    "text_enrich", "text_main_content", "text_gopher_flags",
    "text_fingerprint_dups", "text_jaccard_pairs", "text_simhash_near_dup",
    "text_duplicate_spans", "text_top_idf_terms", "text_incremental_new",
    "text_pack_plan", "text_screening", "text_minhash_lsh_pairs",
    "text_curation_full", "text_curation_components", "text_sample_mix",
    "text_decontaminate", "text_near_dup_components", "text_unigram_logprob",
    "graph_pagerank", "graph_host_rank", "emb_cosine_topk", "emb_near_dup",
    "emb_lsh_topk_tables", "emb_ivf_topk", "emb_ivf_topk_trained",
]


def test_driver_window_is_exactly_the_canonical_50():
    window = list(entry.queries())[:50]
    assert window == CANONICAL_50
    # and the 50th slot really is the last canonical entry, i.e. nothing
    # canonical spilled past the gate
    assert len(CANONICAL_50) == 50
