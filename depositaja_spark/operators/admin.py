"""T5 — manual flag/unflag override (SURVEY.md §2.5).

The reference's ``flag-wallet`` CLI emits a ``FlagEvent{FlagRemoved:
*remove}`` directly onto the ``flag_wallet`` topic
(cmd/flag-wallet/main.go:14-36).  Manual events never set
``rolling_period_start_unix`` (so a manual flag stores start=0) and are
indistinguishable from detector-emitted events downstream — the same
latest-value fold consumes both, and the next deposit's detector verdict
can overwrite a manual flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def manual_flag_events(
    spark, overrides: list[tuple[str, bool, int]]
) -> DataFrame:
    """Build manual FlagEvents: (wallet_id, remove, seq) triples.

    ``rolling_period_start_unix`` is always 0, mirroring
    cmd/flag-wallet/main.go:32 which never populates it.
    """
    rows = [(w, r, 0, s) for (w, r, s) in overrides]
    return spark.createDataFrame(
        rows, "wallet_id string, flag_removed boolean, rolling_period_start_unix long, seq long"
    )


def merge_manual_flags(auto_events: DataFrame, manual_events: DataFrame) -> DataFrame:
    """Union auto + manual flag events into one stream ordered by seq.

    Downstream ``latest_flag`` resolves conflicts exactly like the
    reference: whichever event has the greatest seq (arrival order) wins.
    """
    cols = ["wallet_id", "flag_removed", "rolling_period_start_unix", "seq"]
    return auto_events.select(*cols).unionByName(manual_events.select(*cols))
