"""Composed end-to-end plans (whole-reference pipelines)."""

from depositaja_spark.plans.check_pipeline import check_pipeline
from depositaja_spark.plans.corpus_pipeline import clean_corpus

__all__ = ["check_pipeline", "clean_corpus"]
