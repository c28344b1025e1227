"""depositaja_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference wallet-deposit stream processor
(``dinorain/depositaja``), rebuilt Spark-first.

The reference is an event-driven Kafka application (Goka): users POST
deposits keyed by wallet, three processors maintain keyed state tables
(full deposit history, rolling-period threshold counter, latest flag), and
a read endpoint joins balance with flags.  This package re-expresses every
one of those operators as declarative DataFrame / SQL plans that Catalyst
optimizes, adds Structured Streaming parity for the continuous path, and
extends the surface with the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) the engine
needs at 100 TB.

Layout:
    session.py    SparkSession builder tuned for the target scale
    schemas.py    explicit StructTypes for the reference's five messages
    sources/      parquet/test-table loaders, events→deposits mapping, Kafka wiring
    operators/    wallet-domain operators (validate, collect, balance, detect, flag, check)
    functions/    dedup / similarity / text / multimodal operator library
    streaming/    Structured Streaming pipeline (stateful detector, serving tables)
"""

__version__ = "0.1.0"

# --- query registration -------------------------------------------------------
# The registry ⇄ query-module import cycle is broken HERE: the parent
# package initializes before any submodule, so importing the registry
# first and the query families second guarantees every
# `from depositaja_spark.registry import query` finds a complete
# registry — whichever module a user imports first.
from depositaja_spark import registry  # noqa: E402
from depositaja_spark import queries_olap  # noqa: E402,F401
from depositaja_spark import queries_ext  # noqa: E402,F401
from depositaja_spark import queries_window  # noqa: E402,F401
from depositaja_spark import queries_curate  # noqa: E402,F401
from depositaja_spark import queries_temporal  # noqa: E402,F401
from depositaja_spark import queries_sketch  # noqa: E402,F401
from depositaja_spark import queries_ml  # noqa: E402,F401
from depositaja_spark import queries_gov  # noqa: E402,F401

registry._apply_sample_priority()
