"""Composed end-to-end plans (whole-reference pipelines)."""

from depositaja_spark.plans.check_pipeline import check_pipeline

__all__ = ["check_pipeline"]
