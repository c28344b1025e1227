"""Sources & sinks: test-table loaders, events→deposits mapping, codecs, Kafka."""

from depositaja_spark.sources.tables import load_table, load_tables, register_views
from depositaja_spark.sources.deposits import deposits_from_events

__all__ = ["load_table", "load_tables", "register_views", "deposits_from_events"]
