"""Full-registry scale sweep: time EVERY registered query at sf0.1 and at
the 10x key-shifted sf1.0 replica (scale_spot.py), and record the ratio.

The r9 verdict's top ask: per-round spot tables cover each round's NEW
operators, but no single run had ever timed all 285 queries at 10x —
r1-r6-vintage families had only sf0.1 evidence plus static plan audits.
This sweep is the empirical superlinearity detector: a query whose cost
grows much faster than data volume has a scale bug the plan audit missed.

Method (matches the spot-bench convention, SCALING.md):
  * execution forced with the noop sink (no driver collect);
  * sf0.1: one warm run (codegen/JIT) + one timed run;
  * sf1.0: one timed run (codegen is warm from the sf0.1 pass since the
    generated code is input-size independent); queries finishing < 2 s
    get a second run and keep the min (compile-noise insurance);
  * caches released between queries so no query's timing depends on
    which ran before it;
  * results appended to SCALE_SWEEP_r10.jsonl incrementally — a re-run
    resumes, skipping names already recorded (delete the file to redo).

Interpretation floor: at sf0.1 most queries sit on the single-row-group
scan floor (~0.2-0.5 s), so a 10x-data ratio well BELOW 10 is expected;
ratios are flagged for explanation above RATIO_FLAG (3x), matching the
per-round spot-table convention.

Usage:
    python scale_sweep.py [out.jsonl]     # default SCALE_SWEEP_r10.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = "/tmp/sf1_synth"
RATIO_FLAG = 3.0
RERUN_UNDER_SEC = 2.0


def main(out_path: str = "SCALE_SWEEP_r10.jsonl") -> None:
    from depositaja_spark import registry
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.session import get_spark

    done: set[str] = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["query"])
                except Exception:
                    pass

    spark = get_spark(
        app_name="scale_sweep", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn, sf_dir: str) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    names = [n for n in registry.QUERIES if n not in done]
    print(f"sweeping {len(names)} queries ({len(done)} already recorded)")
    for i, name in enumerate(names):
        fn = registry.QUERIES[name]
        rec: dict = {"query": name}
        try:
            release_caches()
            spark.catalog.clearCache()
            run(fn, SF_SMALL)  # warm: codegen + JIT
            rec["sf01_sec"] = round(run(fn, SF_SMALL), 3)
            release_caches()
            spark.catalog.clearCache()
            t_big = run(fn, SF_BIG)
            if t_big < RERUN_UNDER_SEC:
                release_caches()
                spark.catalog.clearCache()
                t_big = min(t_big, run(fn, SF_BIG))
            rec["sf1_sec"] = round(t_big, 3)
            rec["ratio"] = round(rec["sf1_sec"] / max(rec["sf01_sec"], 1e-9), 2)
            rec["load1"] = round(os.getloadavg()[0], 2)
        except Exception as exc:  # record, keep sweeping
            rec["error"] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc()
        finally:
            release_caches()
            spark.catalog.clearCache()
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        flag = " <<<" if rec.get("ratio", 0) > RATIO_FLAG else ""
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            f"{rec.get('sf01_sec')} -> {rec.get('sf1_sec')} "
            f"x{rec.get('ratio')}{flag}",
            flush=True,
        )
    print("sweep complete:", out_path)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
