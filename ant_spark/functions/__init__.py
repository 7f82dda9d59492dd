"""Scalar / vectorized functions: URL normalization, HTML parsing, hashing."""
