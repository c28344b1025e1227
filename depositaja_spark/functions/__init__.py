"""Engine function library: exact numerics, text analysis, dedup,
similarity search, multimodal column handling."""

from depositaja_spark.functions.numeric import dec, exact_avg, exact_sum

__all__ = ["dec", "exact_sum", "exact_avg"]
