"""Crawl-dataflow + analytics operators (SURVEY §2)."""
