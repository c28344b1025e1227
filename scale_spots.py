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
OUT = os.path.join(REPO, "SCALE_SPOT_r12.jsonl")
IDLE_LOAD = 4.0

#: round-12 extension of the sf10 ledger (r11 verdict #4): the heaviest
#: cost families that had no sf10 row yet — graph/text combo, the
#: interval×calendar overlap join, MinHash LSH end-to-end, connected
#: components at the distributed tier (two flavors: the Jaccard dedup
#: closure and the Jaro-Winkler entity closure), streaming incremental
#: dedup replay, and the semantic decontamination join — plus a re-spot
#: of bpe_segment_replay to pin the superlinearity mechanism (the
#: replica token salt grows words by one char per suffix decade).
SPOT_QUERIES = [
    "textrank_keywords",          # TextRank: co-occurrence graph + weighted pagerank
    "orders_open_by_month",       # interval×calendar overlap join (bucket-explode)
    "minhash_lsh_near_dups",      # MinHash→bands→verify end-to-end
    "dedup_clusters",             # connected components over the near-dup graph
    "jw_entity_clusters",         # blocked Jaro-Winkler + CC entity closure
    "incremental_dedup",          # streaming incremental dedup replay
    "decontaminate_semantic",     # embedding decontamination join
    "bpe_segment_replay",         # r12: mechanism classification re-spot
]

#: queries whose in-code max_rows guard must REFUSE at sf10 — the
#: refusal IS the recorded result (``guard_refused: true``)
GUARDED_BASELINES: list[str] = [
    # (r11 recorded all three guard refusals; r12 adds none — the two
    # newly demoted single-level paths still RUN at sf10's 200k rows,
    # under their 500k mid-scale cap, and already have r11 rows)
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
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        # record-and-continue: an uncaught raise here would abort the
        # whole spot matrix mid-run and leave no row for this query,
        # defeating the incremental-resume design
        return {"error": "timeout", "wall": round(time.time() - t0, 1)}
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
