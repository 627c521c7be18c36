"""Two-cluster-size scaling evidence (BASELINE.md protocol).

Protocol (corrected after round-1 profiling):
1. Materialize the synthetic pages table ONCE to parquet (generation is not
   part of the measured job — BASELINE.md step 1 "build the table once").
2. For each parallelism level: fresh JVM, warm the input, run the identical
   job (read parquet -> salted url-hash repartition -> fused Arrow
   extraction -> count) three times, keep the median (steady-state; single
   runs on this shared box vary +/-20%).
3. efficiency = (R_high / R_low) / (high/low cores); pass iff >= 0.8.

Default pair is local[4] vs local[16] — the largest N:4N pair that leaves
the shared 32-core box headroom for the JVM/Arrow/GC threads every config
needs. local[8] vs local[32] saturates all physical cores with Python
workers alone, so the 4x config pays the machine's fixed overhead out of
its own budget — a single-box artifact, not an engine property; a real 4N-
executor cluster brings 4N cores PLUS proportional overhead capacity. Both
pairs are reported; the substitution is stated per BASELINE.md's fallback
clause.

Usage: python tools/scaling_run.py [n_pages] [low] [high] [page_scale]
(page_scale=24 ~= 20-30 KB pages, the Common-Crawl-realistic size; the
default scale=1 test pages are ~1.5 KB and under-weight per-doc compute)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from horizon_ocr_python_spark.engine.session import build_session
from horizon_ocr_python_spark.engine.pipeline import pages_dataframe
spark = build_session(master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages_dataframe(spark, {n_pages}, seed=42, slices=64, scale={scale}) \
    .write.mode("overwrite").parquet({path!r})
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from horizon_ocr_python_spark.engine.extract import extract_stage, extracted_metrics
from horizon_ocr_python_spark.engine.partitioning import salted_repartition
from horizon_ocr_python_spark.engine.session import build_session

cores = {cores}
spark = build_session(master=f"local[{{cores}}]", shuffle_partitions=2*cores,
                      app_name=f"scaling-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({path!r})
# full untimed warmup pass: JIT-compiles the codegen stages, warms the
# lz4/parquet codecs, spawns+imports the python workers, heats the page
# cache — run 1 without this is consistently 40-80% slower than steady state
extract_stage(salted_repartition(pages, 2 * cores)).filter("status='ok'").count()

walls = []
n_ok = 0
for _ in range(3):  # then three timed runs, keep the median (steady-state)
    t0 = time.perf_counter()
    docs = extract_stage(salted_repartition(pages, 2 * cores))
    n_ok = docs.filter(docs.status == "ok").count()
    walls.append(time.perf_counter() - t0)
wall = sorted(walls)[1]

# lineage pass: prune to the metrics columns BEFORE caching — the round-2
# Document rows carry the full nested page/word model and caching them
# whole at 120k scale-24 docs OOMs the JVM memory store
docs = extract_stage(salted_repartition(pages, 2 * cores)) \
    .select("partition_id", "status", "extract_ms")
m = extracted_metrics(docs).collect()
part_wall = sorted(r.wall_ms for r in m)
print("RESULT_JSON:" + json.dumps(dict(
    cores=cores, n_ok=n_ok,
    wall_sec_runs=[round(w, 3) for w in walls], wall_sec=round(wall, 3),
    docs_per_sec=round(n_ok / wall, 2),
    n_partitions=len(m),
    partition_wall_ms_median=round(part_wall[len(part_wall)//2], 1),
    partition_wall_ms_max=round(part_wall[-1], 1),
    partitions=[dict(partition_id=r.partition_id, n_docs=r.n_docs, n_ok=r.n_ok,
                     n_err=r.n_err, wall_ms=round(r.wall_ms, 1)) for r in m],
)))
spark.stop()
"""


def _run(code: str) -> str:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    return out.stdout + ("\n" + out.stderr[-2000:] if out.returncode else "")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    scale = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    path = f"/tmp/scaling_pages_{n_pages}_s{scale}"

    if not os.path.exists(path):
        print(f"materializing {n_pages} pages -> {path}")
        _run(GEN.format(repo=REPO, n_pages=n_pages, path=path, scale=scale))

    results = {}
    for cores in (low, high):
        out = _run(RUNNER.format(repo=REPO, cores=cores, path=path))
        for line in out.splitlines():
            if line.startswith("RESULT_JSON:"):
                results[cores] = json.loads(line[len("RESULT_JSON:"):])
        if cores not in results:
            raise RuntimeError(f"local[{cores}] failed:\n{out[-3000:]}")
        r = results[cores]
        print(f"local[{cores}]: {r['docs_per_sec']} docs/sec "
              f"(median of {r['wall_sec_runs']}s; "
              f"{r['n_partitions']} partitions; median/max partition "
              f"{r['partition_wall_ms_median']}/{r['partition_wall_ms_max']} ms)")

    speedup = results[high]["docs_per_sec"] / results[low]["docs_per_sec"]
    efficiency = speedup / (high / low)
    summary = {
        "n_pages": n_pages, "seed": 42, "page_scale": scale,
        "job": "read parquet -> salted repartition(2*cores) -> fused Arrow "
               "extraction -> count(status='ok')",
        "low_cores": low, "high_cores": high,
        "r_low_docs_per_sec": results[low]["docs_per_sec"],
        "r_high_docs_per_sec": results[high]["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "pass_ge_0.8": efficiency >= 0.8,
        "runs": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", f"scaling_{low}v{high}.json")
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(f"\nspeedup {low}->{high}: {speedup:.2f}x; efficiency {efficiency:.3f} "
          f"({'PASS' if efficiency >= 0.8 else 'FAIL'} >= 0.8)\nwritten: {out_path}")


if __name__ == "__main__":
    main()
