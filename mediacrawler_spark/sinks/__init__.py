"""Sinks: snapshot catalog (Iceberg-style) + upsert semantics (SURVEY §2.2)."""
