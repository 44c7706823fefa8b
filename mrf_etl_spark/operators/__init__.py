"""Operators beyond the reference's own surface: the LLM-training-data
pipeline ops (dedup, similarity search, text analysis, multimodal) plus the
domain operators (benchmark math, cached enrichment). All designed for the
100 TB partitioned model: JVM-native expressions wherever possible,
shuffles only on explicit keys, Pandas UDFs only where semantics demand
Python (multimodal decode)."""
