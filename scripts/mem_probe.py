"""Memory-pressure probe (VERDICT r7 #4): deliberately measure the GC
cliff that SCALE.md previously only reported as an anecdote (28 vs
496 cpu-s on the same minhash probe when the heap crossed into thrash).

For each heap size given, spawns a FRESH python+JVM subprocess with
SPARK_DRIVER_MEMORY pinned, runs one dedup probe query
(dedup_minhash_lsh) on the 10x near-dup corpus, and prints a JSON line
per heap: {"heap": "8g", "wall_s": ..., "cpu_s": ..., "gc_s": ...,
"ok": true}. An OOM-killed child records ok=false instead of failing
the sweep. The sweep turns the documented cliff into a measured knob
with a stated safe headroom ratio (see SCALE.md §9).

Env-gated by design: never part of the default bench (the driver's
BENCH_rNN run must not inherit a tiny heap). Usage:

    python scripts/mem_probe.py [heap ...]        # default sweep
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/mem_probe.py 8g 4g
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
from gmall_211027_flink_spark import get_spark
from gmall_211027_flink_spark.registry import QUERIES, load_all
from bench import ensure_scale_corpus, _jvm_cpu_seconds, _jvm_gc_seconds

load_all()
spark = get_spark("mem-probe")
probe_dir = ensure_scale_corpus(spark, os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
q = QUERIES[os.environ.get("SPARK_GRAFT_MEM_QUERY", "dedup_minhash_lsh")]
q(spark, probe_dir).count()          # warm: JIT + shingle caches
c0, g0 = _jvm_cpu_seconds(), _jvm_gc_seconds(spark)
t0 = time.perf_counter()
q(spark, probe_dir).count()
print("MEMPROBE " + json.dumps({
    "wall_s": round(time.perf_counter() - t0, 3),
    "cpu_s": round(_jvm_cpu_seconds() - c0, 3),
    "gc_s": round(_jvm_gc_seconds(spark) - g0, 3)}))
"""


def run_one(heap: str) -> dict:
    env = dict(os.environ)
    env["SPARK_DRIVER_MEMORY"] = heap
    env["SPARK_GRAFT_REPO"] = str(REPO)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        return {"heap": heap, "ok": False, "why": "timeout 1800s (thrash)"}
    for line in proc.stdout.splitlines():
        if line.startswith("MEMPROBE "):
            out = json.loads(line[len("MEMPROBE "):])
            out.update({"heap": heap, "ok": True})
            return out
    tail = (proc.stderr or "")[-300:].replace("\n", " ")
    return {"heap": heap, "ok": False,
            "why": f"rc={proc.returncode} {tail}"}


def main() -> None:
    heaps = sys.argv[1:] or ["24g", "12g", "8g", "6g", "4g", "2g"]
    for heap in heaps:
        print(json.dumps(run_one(heap)), flush=True)


if __name__ == "__main__":
    main()
