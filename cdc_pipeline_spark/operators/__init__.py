"""Operators: windowed aggregation pipelines, CDC semantics, enrichment
joins, top-k, alerting, trends, dedup, similarity, text analysis,
multimodal plumbing."""
