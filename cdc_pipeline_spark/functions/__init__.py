"""The engine's public column-expression surface (SURVEY §2.3, §2.10).

Flat namespace over the scalar/higher-order Column builders scattered
across the operator modules — everything here is a pure JVM-side
expression (no Python UDFs, preserving the reference's
no-Python-in-the-hot-path property, kpi_aggregator.py:146-203):

    from cdc_pipeline_spark import functions as EF
    df.select(EF.cosine("a", "b"), EF.quality_score("toks", "text"))
"""

from cdc_pipeline_spark.operators.rounding import round_half_up, sql_floor_round
from cdc_pipeline_spark.operators.similarity import cosine, dot, norm
from cdc_pipeline_spark.operators.text import (
    fingerprint,
    lang_guess,
    punct_ratio,
    quality_score,
    stopword_count,
    token_count,
    token_count_bpe,
    tokens,
    winnowing_fingerprints,
    word_shingles,
)

__all__ = [
    "round_half_up",
    "sql_floor_round",
    "dot",
    "norm",
    "cosine",
    "tokens",
    "token_count",
    "token_count_bpe",
    "word_shingles",
    "stopword_count",
    "punct_ratio",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "winnowing_fingerprints",
]
