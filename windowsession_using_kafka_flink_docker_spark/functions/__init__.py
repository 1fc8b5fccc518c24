"""Scalar/column function helpers (re-exported from operator modules)."""

from windowsession_using_kafka_flink_docker_spark.operators.text_analysis import (
    char_ratio,
    fingerprint,
    lang_id,
    normalized_text,
    quality_score,
    token_count,
)
from windowsession_using_kafka_flink_docker_spark.operators.similarity import (
    cosine_expr,
    dot_expr,
    norm_expr,
)

__all__ = [
    "char_ratio", "fingerprint", "lang_id", "normalized_text",
    "quality_score", "token_count", "cosine_expr", "dot_expr", "norm_expr",
]
