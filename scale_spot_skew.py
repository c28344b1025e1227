"""Skew-adversarial scale spots for the two bucket dgemm kernels (r13,
verdict #2).

The sf1/sf10/sf100 ledgers all measure NEAR-UNIFORM quantizer cells (the
replica decorrelation spreads vectors); real corpora are not uniform —
boilerplate pages give a web-scale corpus millions of EXACT-duplicate
embeddings, which is the worst case for a (cell, sub)-bucketed kernel:
every copy lands in the SAME bucket.

This runner plants that cluster deliberately: in a copy of the sf1/sf10
synth dirs, 30% of embedding rows (id ≥ 200, id % 10 < 3) are replaced
by an exact copy of row 17's vector.  Row 17 is a coarse centroid at
both scales (centroids are rows 10..10+C₁-1, C₁ = ⌈N^⅓⌉ = 28/59), so
every copy assigns to cell 17 with rounded cosine exactly 1.0, and at
the sub level the 1.0 ties all resolve to the SAME smallest sub id —
one bucket holding the whole planted cluster (~6k rows at sf1, ~60k at
sf10, vs the 1024-row block budget).

What the rows prove: before r13, `hard_negative_pairs_ivf2`'s kernel
materialized the full |anchors|×|candidates| float64 matrix per bucket —
at sf10 this bucket is ≥60k×60k = 29 GB in ONE allocation (plus the
mask and score copies), a guaranteed worker OOM.  The blocked kernels
cap every allocation at 1024×m (~0.5 GB here); completion with a sane
decade ratio IS the bound's system-level evidence (the allocation-level
proof is tests/test_bucket_kernels.py's tracemalloc bound).  Note the
WORK in the hot bucket is inherently quadratic in its size — semdedup
must score every within-bucket pair — so the expected decade ratio for
a 30% planted cluster approaches ×100, and the pass criterion is
bounded MEMORY + mechanism-classified time, not ×10 time.

Usage:
    python scale_spot_skew.py gen    # build /tmp/sf{1,10}_skew (fast)
    python scale_spot_skew.py        # run the spots (resume-safe)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_spots as ss

SF1_SKEW = "/tmp/sf1_skew"
SF10_SKEW = "/tmp/sf10_skew"
OUT = os.path.join(ss.REPO, "SCALE_SPOT_r13.jsonl")

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

SPOTS = [
    ("semdedup_cells2", 5400),
    ("hard_negative_pairs_ivf2", 7200),
]


def _make_skewed(src: str, dst: str) -> dict:
    """Copy a synth dir by symlink, rewriting embeddings with the
    planted exact-duplicate cluster.  Returns planted-count metadata."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        link = os.path.join(dst, f"{t}.parquet")
        if t != "embeddings" and not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)
    edst = os.path.join(dst, "embeddings.parquet")
    os.makedirs(edst, exist_ok=True)
    files = sorted(glob.glob(os.path.join(src, "embeddings.parquet", "*.parquet")))
    # the hot vector: row 17 (a coarse centroid at every measured scale)
    hot_vec = None
    for f in files:
        tb = pq.read_table(f)
        ids = tb.column("vec_id").to_numpy()
        if (ids == 17).any():
            row = int(np.nonzero(ids == 17)[0][0])
            hot_vec = tb.column("embedding").to_pylist()[row]
            break
    assert hot_vec is not None, "row 17 not found"
    planted = total = 0
    for f in files:
        tb = pq.read_table(f)
        ids = tb.column("vec_id").to_numpy()
        emb = tb.column("embedding").to_pylist()
        mask = (ids >= 200) & (ids % 10 < 3)
        for i in np.nonzero(mask)[0]:
            emb[int(i)] = hot_vec
        planted += int(mask.sum())
        total += len(ids)
        out = tb.set_column(
            tb.schema.get_field_index("embedding"),
            pa.field("embedding", tb.schema.field("embedding").type),
            pa.array(emb, type=tb.schema.field("embedding").type),
        )
        pq.write_table(out, os.path.join(edst, os.path.basename(f)))
    return {"planted": planted, "total": total, "hot_row": 17,
            "frac": round(planted / total, 3)}


def gen() -> None:
    for src, dst in ((ss.SF1, SF1_SKEW), (ss.SF10, SF10_SKEW)):
        meta = _make_skewed(src, dst)
        print(f"{dst}: {meta}", flush=True)


def main() -> None:
    done: set[str] = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    if rec.get("skew"):
                        done.add(rec["query"])
                except Exception:
                    pass
    with open(OUT, "a") as fh:
        for name, timeout in SPOTS:
            if name in done:
                continue
            rec: dict = {"query": name, "fresh_session": True,
                         "skew": "hot30-exact-dup@cell17"}
            print(f"{name}: sf1_skew...", flush=True)
            rec["sf1"] = ss._spot(name, SF1_SKEW, timeout=timeout)
            print(f"  sf1_skew = {rec['sf1']}", flush=True)
            rec["sf10"] = ss._spot(name, SF10_SKEW, timeout=timeout)
            print(f"  sf10_skew = {rec['sf10']}", flush=True)
            s1, s10 = rec["sf1"].get("sec"), rec["sf10"].get("sec")
            if s1 and s10:
                rec["ratio"] = round(s10 / s1, 2)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
    print("done:", OUT)


if __name__ == "__main__":
    if "gen" in sys.argv[1:]:
        gen()
    else:
        main()
