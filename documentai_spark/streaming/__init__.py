"""Structured Streaming variant of the extraction pipeline.

The reference is strictly request/response batch (SURVEY §2.9: no
watermarks, no windows over time) and ``north_rule`` requires a batch
pipeline — the streaming module exists because the same per-turn
operators compose unchanged under ``readStream``: extraction/quality UDFs
are stateless projections, so micro-batch execution needs no rewrite.
"""
