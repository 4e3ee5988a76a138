"""Query/crawl plans: the epoch driver loop (SURVEY §3)."""
