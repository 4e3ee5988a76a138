"""Structured Streaming equivalents (SURVEY §2.11).

The engine is epoch-batch by design (the reference is batch-with-loops and
the north_rule wants resumable snapshot epochs), but the same operators
map onto Structured Streaming when a continuous source exists; this
package holds those mappings.
"""
