"""Sources: seed scans and the fetch stage (SURVEY §2.1)."""
