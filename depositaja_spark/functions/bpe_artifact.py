"""Pinned BPE merge table: 12 merges trained ONCE with the repo's own
distributed trainer (``functions/bpe.py:bpe_train`` — one corpus pass
for the word vocab, then vocab-sized pair aggregations with the
deterministic (freq desc, left asc, right asc) tie-break) over
``/root/testdata/sf0.01/documents.parquet`` and frozen as literals —
a deployed tokenizer ships its merge table as a versioned artifact
exactly like this (the PQ_BOOKS discipline, functions/pq_artifact.py).

Pinning makes merge APPLICATION (segmentation) plain string algebra:
each merge is one left-to-right non-overlapping substring replace over
a delimiter-encoded symbol string, so ``bpe_segment_replay`` carries a
full DuckDB value oracle (``functions/bpe.py:bpe_segment_oracle_sql``)
while TRAINING keeps its own gates (tests/test_bpe.py golden-merge
parity + the provenance re-fit below).

Regenerate (only if the fixture changes):
    python -c "from depositaja_spark.functions.bpe_artifact import regenerate; regenerate()"
"""

from __future__ import annotations

#: (left, right, corpus_pair_freq) in merge order — apply top to bottom.
BPE_MERGES: list[tuple[str, str, int]] = [
    ("e", "r", 4568),
    ("e", "</w>", 4473),
    ("n", "</w>", 2834),
    ("er", "</w>", 2779),
    ("o", "w", 2747),
    ("ow", "</w>", 2747),
    ("o", "r", 2696),
    ("s", "t", 2676),
    ("h", "</w>", 1884),
    ("a", "t", 1845),
    ("l", "u", 1831),
    ("i", "n", 1796),
]


def regenerate() -> None:  # pragma: no cover - manual tool
    """Re-train on the pinned fixture and print the literal to paste."""
    from pyspark.sql import SparkSession

    from depositaja_spark.functions.bpe import bpe_train

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    print("BPE_MERGES =", bpe_train(docs, num_merges=len(BPE_MERGES)))
