"""Spark operators: extract kernel, skew salting, resume, dedup, similarity."""
