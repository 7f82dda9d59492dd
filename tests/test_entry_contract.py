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
