"""sf10 → sf100 (1000×) THIRD-decade spot bench (rounds 12-13).

The r11/r12 ledgers established per-decade ratios at sf1→sf10; this
runner takes a hand-picked set one more decade up, to sf100 (1000
key-shifted/token-salted/decorrelated replicas of the driver's sf0.1
fixtures, ~17 GB parquet), to test the claims a second decade cannot:

  * the two-level O(N^(4/3)) similarity paths predict a ×10^(4/3)≈21.5
    decade ratio — sf100 is the first point where the single-level
    √N paths (×31.6 predicted) and the two-level ones separate by
    design rather than by constant;
  * the headline scan/agg floor (tpch_q1) and the curation pipeline
    (clean_corpus) should stay ≤×10 per decade;
  * the r12 vocab-level BPE segmentation plan should hold its ~linear
    ratio with a 10× larger vocab.

Caveat recorded with the rows: at 1000 replicas the embedding
decorrelation's (row, shift) pattern space (4096 combos) birthday-
collides for ~100 replica pairs, so ~10% of replicas have an exact
twin.  For the measured queries this does not distort cost or output:
the mining band [0.1, 0.4) EXCLUDES cos=1.0 pairs, and semdedup's keep
rule just drops the higher-id twin — but all-pairs/near-dup OUTPUT
workloads would see planted duplicates again, so they are not measured
at this scale.

Round 13 extends the ledger to the families the r12 set left out
(graph, distributed CC, multimodal decode); the r12 rows live in
SCALE_SPOT_r12.jsonl, the r13 ones in SCALE_SPOT_r13.jsonl.

Usage:
    python scale_spot.py /tmp/sf100_synth 1000   # generate (~10-20 min)
    python scale_spots100.py                     # run the spot set
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_spots as ss

SF100 = "/tmp/sf100_synth"
OUT = os.path.join(ss.REPO, "SCALE_SPOT_r13.jsonl")

#: r13 third-decade set (r12 verdict #3): the graph family had no
#: sf100 row — supplier_pagerank is its heaviest member (sf10 ~100 s),
#: dedup_clusters exercises the distributed pointer-jumping CC tier
#: (edges at sf100 are far past the 1M-edge driver union-find cap), and
#: jpeg_decode_stats is the heaviest multimodal decode (sf10 ~650 s, so
#: its sf100 leg gets the longest timeout and runs last).
DECADE3 = [
    ("supplier_pagerank", 7200),
    ("dedup_clusters", 7200),
    ("jpeg_decode_stats", 14400),
]


def main() -> None:
    done: set[str] = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    if "sf100" in rec:
                        done.add(rec["query"])
                except Exception:
                    pass
    with open(OUT, "a") as fh:
        for name, timeout in DECADE3:
            if name in done:
                continue
            rec: dict = {"query": name, "fresh_session": True,
                         "decade3": True}
            print(f"{name}: sf10...", flush=True)
            rec["sf10"] = ss._spot(name, ss.SF10, timeout=timeout)
            print(f"  sf10 = {rec['sf10']}", flush=True)
            rec["sf100"] = ss._spot(name, SF100, timeout=timeout)
            print(f"  sf100 = {rec['sf100']}", flush=True)
            s10, s100 = rec["sf10"].get("sec"), rec["sf100"].get("sec")
            if s10 and s100:
                rec["ratio"] = round(s100 / s10, 2)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"{name}: {rec.get('ratio', rec['sf100'])}", flush=True)
    print("done:", OUT)


if __name__ == "__main__":
    main()
