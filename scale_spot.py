"""sf1.0 spot-bench data generator: a 10×-scale replica of the driver's
sf0.1 fixtures, for empirically checking that headline-query cost scales
~linearly with data volume (the r6 verdict's top_next ask).

Replication is KEY-SHIFTED so every join keeps its real selectivity:
replica i shifts each table's keys by i × (max_key + 1) for orderkey /
custkey / suppkey / partkey / event_id / user_id / doc_id / vec_id, and
the foreign keys shift in lockstep — a 10× corpus with the same
per-order basket sizes, per-customer order counts, and per-user event
densities as the original.  nation/region are fixed dimensions (as in
TPC-H itself) and are copied once.

Documents get a per-replica TOKEN SALT (every token suffixed `_i`,
i > 0) so replicas are shingle-disjoint: the dedup/near-dup workload
then scales linearly in corpus size instead of exploding quadratically
inside artificial 10-copy duplicate groups — the scaling we want to
measure is the engine's, not the planted-duplicate structure's.
Embeddings get the analogous treatment (the r11 lesson — as-is copies
made every vector an exact 100-way duplicate at sf10, exploding every
cosine workload's TRUE output): replica i applies a hash-derived
CYCLIC SHIFT of the components plus a Walsh-Hadamard SIGN pattern
(component j flipped iff popcount(row & j) is odd, with row and shift
both derived from a Knuth hash of i) — norms and all within-replica
pairwise dots are preserved exactly, while cross-replica dots of the
decorrelated copies behave like random pairs, so cosine workloads
scale linearly in vector count.

Usage:
    python scale_spot.py [out_dir] [replicas]   # default /tmp/sf1_synth 10
    python scale_spot.py /tmp/sf10_synth 100    # the 100x (sf10) replica
    SPARK_GRAFT_SF_DIR=/tmp/sf1_synth python bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

#: per-table (shift columns) spec: column -> key-space name
_SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

_KEY_SOURCES = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main(out_dir: str = "/tmp/sf1_synth", replicas: int | str = REPLICAS) -> None:
    replicas = int(replicas)
    from pyspark.sql import functions as F

    from depositaja_spark.session import get_spark
    from depositaja_spark.sources import load_table

    spark = get_spark(app_name="scale_spot_gen", master="local[32]",
                      shuffle_partitions=32)
    os.makedirs(out_dir, exist_ok=True)

    spans = {
        name: load_table(spark, SRC, tbl).agg(F.max(col)).first()[0] + 1
        for name, (tbl, col) in _KEY_SOURCES.items()
    }
    print("key spans:", spans)

    for tbl in ["nation", "region"]:
        load_table(spark, SRC, tbl).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )

    for tbl, shifts in _SHIFTS.items():
        t0 = time.time()
        base = load_table(spark, SRC, tbl)
        parts = []
        for i in range(replicas):
            rep = base
            for col, space in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * spans[space]))
            if tbl == "documents" and i > 0:
                # shingle-disjoint replica: suffix every token
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                )
            if tbl == "embeddings" and i > 0:
                if i == 1:
                    # the shift/flip arithmetic below hard-codes dim 64;
                    # zip_with would silently null-pad/truncate on any
                    # other dimension, so fail loudly instead
                    dims = [
                        r[0]
                        for r in base.select(F.size("embedding"))
                        .distinct()
                        .collect()
                    ]
                    assert dims == [64], (
                        f"embedding decorrelation assumes dim 64, fixture "
                        f"has sizes {dims}"
                    )
                # cosine-decorrelated replica: per-replica cyclic shift +
                # Walsh-Hadamard sign pattern, both hash-derived so all
                # (row, shift) pairs are distinct for i < 128.  Both ops
                # preserve norms and all WITHIN-replica pairwise dots
                # exactly (replica workload structure unchanged), while
                # cross-replica same-base pairs drop from 100% exact
                # copies to ~0.1% above cos 0.4 (measured) — the residual
                # cross-pair rate then matches the base corpus's own
                # random-pair density, i.e. replicas behave like MORE
                # data, not like a duplicate explosion.
                h = (i * 2654435761) % (2**32)
                row, shift = h % 64, (h >> 6) % 64
                flips = F.array(
                    *[
                        F.lit(float(1 - 2 * (bin(row & j).count("1") & 1)))
                        for j in range(64)
                    ]
                )
                src = (
                    F.concat(
                        F.slice(F.col("embedding"), shift + 1, 64 - shift),
                        F.slice(F.col("embedding"), 1, shift),
                    )
                    if shift
                    else F.col("embedding")
                )
                rep = rep.withColumn(
                    "embedding",
                    F.zip_with(src, flips, lambda a, b: a * b).cast(
                        "array<float>"
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
        n = spark.read.parquet(f"{out_dir}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows in {time.time() - t0:.1f}s")

    print(f"done: {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
