"""sf1 → sf10 (100×) fresh-session spot bench (r10 verdict #2).

The r10 full-registry sweep proved ×10 linearity for every query; this
tool takes the ~dozen most expensive cost FAMILIES the extra decade up
to sf10 (100× the driver's sf0.1 fixtures, ~1.7 GB parquet) to catch
constant-factor cliffs ×10 cannot expose (broadcast thresholds, state
blow-ups, memory pressure).

Methodology (the SCALING.md conventions, hardened):
  * every measurement runs in its OWN subprocess SparkSession
    (``fresh_session: true``) — long-lived-session JVM aging inflates
    late measurements up to ~2×, and a poisoned row costs a decade of
    signal here;
  * each child warms codegen/JIT with one sf0.1 pass of the same query
    (generated code is input-size independent), then times ONE run at
    the target dir with the noop sink (no driver collect);
  * the runner refuses to launch a child while 1-min loadavg exceeds
    IDLE_LOAD — contention archaeology is how r9's bench artifact got
    poisoned;
  * the two labeled all-pairs baselines are run EXPECTING the in-code
    max_rows guard to refuse them at sf10 (200k embeddings > 100k cap)
    — the refusal IS the recorded result (``guard_refused: true``);
  * rows append to the out file incrementally; re-runs resume.

Usage:
    python scale_spot.py /tmp/sf1_synth 10      # generate the 10x dir
    python scale_spot.py /tmp/sf10_synth 100    # generate the 100x dir
    python scale_spots.py                       # run the spot matrix
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF1 = "/tmp/sf1_synth"
SF10 = "/tmp/sf10_synth"
WARM = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "SCALE_SPOT_r11.jsonl")
IDLE_LOAD = 4.0

#: one representative per top cost family (ranked by r10 sweep sf1_sec)
SPOT_QUERIES = [
    "tpch_q1",                    # scan + single-shuffle agg floor
    "clean_corpus",               # staged text-curation pipeline (headline)
    "jaccard_near_dups",          # df-capped inverted-index jaccard
    "lsh_candidate_pairs",        # MinHash banding
    "semdedup_sqrt_cells",        # √N-cell SemDeDup scale path
    "semdedup_cells2",            # two-level N^(4/3) successor (r11)
    "hard_negative_pairs_ivf",    # per-anchor IVF mining scale path
    "hard_negative_pairs_ivf2",   # two-level N^(4/3) successor (r11)
    "supplier_pagerank",          # power-method rounds (r11 cache-fix path)
    "copurchase_weighted_sssp",   # Bellman-Ford rounds (r11 cache-fix path)
    "copurchase_bfs_hops",        # frontier BFS rounds
    "resample_anomalies",         # dense-grid resample (linear-in-output)
    "exact_detector_replay",      # per-key stateful fold (applyInPandas)
    "bpe_segment_replay",         # pinned-merge codegen fold (r11 addition)
    "jpeg_decode_stats",          # Arrow media-codec kernel (heaviest)
]

#: queries whose in-code max_rows guard must REFUSE at sf10 (200k
#: embeddings > the 100k cap): the two labeled O(N²) baselines, plus
#: the banded near-dup whose loose fixture criterion is output-bound
#: quadratic (the r11 sf10 finding — it ran the disk out of shuffle
#: spill at 200k vectors before the guard existed; see SCALING.md)
GUARDED_BASELINES = [
    "semantic_cluster_dedup",
    "hard_negative_pairs",
    "embedding_near_dups_bucketed",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from depositaja_spark.session import get_spark
from depositaja_spark import registry
spark = get_spark(app_name="spot100", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
fn = registry.QUERIES[{name!r}]
def run(sf):
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
try:
    run({warm!r})                      # codegen/JIT warm-up at sf0.1
    sec = run({target!r})
    print("RESULT " + json.dumps({{"sec": round(sec, 3)}}))
except ValueError as e:
    if "max_rows" in str(e) or "capped at" in str(e):
        print("RESULT " + json.dumps({{"guard_refused": True}}))
    else:
        raise
"""


def _wait_idle() -> float:
    while True:
        load = os.getloadavg()[0]
        if load <= IDLE_LOAD:
            return load
        print(f"  load {load:.1f} > {IDLE_LOAD}, waiting...", flush=True)
        time.sleep(30)


def _spot(name: str, target: str, timeout: int = 3600):
    load = _wait_idle()
    code = _CHILD.format(repo=REPO, name=name, warm=WARM, target=target)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            rec = json.loads(line[len("RESULT "):])
            rec["load_start"] = round(load, 2)
            return rec
    return {
        "error": (proc.stderr.strip().splitlines() or ["no output"])[-1][:300],
        "wall": round(time.time() - t0, 1),
    }


def main(out_path: str = OUT) -> None:
    done: set[str] = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["query"])
                except Exception:
                    pass
    with open(out_path, "a") as fh:
        for name in SPOT_QUERIES + GUARDED_BASELINES:
            if name in done:
                continue
            rec: dict = {"query": name, "fresh_session": True}
            if name in GUARDED_BASELINES:
                print(f"{name}: expecting guard refusal at sf10", flush=True)
                rec["sf10"] = _spot(name, SF10, timeout=900)
            else:
                print(f"{name}: sf1...", flush=True)
                rec["sf1"] = _spot(name, SF1)
                print(f"  sf1 = {rec['sf1']}", flush=True)
                rec["sf10"] = _spot(name, SF10)
                print(f"  sf10 = {rec['sf10']}", flush=True)
                s1, s10 = rec["sf1"].get("sec"), rec["sf10"].get("sec")
                if s1 and s10:
                    rec["ratio"] = round(s10 / s1, 2)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"{name}: {rec.get('ratio', rec['sf10'])}", flush=True)
    print("done:", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:2])
