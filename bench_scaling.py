"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥0.8 from N → 4N executors).

No real cluster exists in this sandbox, so the same streaming-replay job is
run at two local parallelism levels (local[N] vs local[4N]) on IDENTICAL
input, in separate JVMs. Two numbers are reported per pair:

* raw efficiency        = throughput(4N) / (4 × throughput(N))
* normalized efficiency = raw speedup / calibration speedup, where the
  calibration is an embarrassingly parallel pure-codegen job (chained
  xxhash64 over spark.range — no shuffle, no I/O, no engine code) measured
  in the same JVMs. This is the sandbox VM's *achievable* thread-scaling
  ceiling: on this box 32 vCPUs do NOT deliver 4× the work of 8 (shared
  backend/steal), and no job — including the calibration — can scale past
  it. A real 4N-executor cluster adds independent machines instead of
  contended vCPUs, which is exactly what raw local numbers under-represent.

Usage:  python bench_scaling.py [--events 16000000] [--keys 2000000]
        [--batches 4] [--pairs 2:8,8:32]
Writes one JSON line to stdout and appends a markdown section to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import os, sys, time, json
sys.path.insert(0, os.environ["REPO"])
from data_sync_spark.session import get_spark
from bench import run_replay_bench
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
spark = get_spark("scaling")
spark.range(1000).selectExpr("sum(id)").collect()
t0 = time.time()
spark.range(0, 256_000_000, 1, cpus).selectExpr(
    "sum(pmod(xxhash64(xxhash64(xxhash64(xxhash64(xxhash64(id))))), 1000))"
).collect()
calib = time.time() - t0
r = run_replay_bench(
    spark,
    int(os.environ["BENCH_EVENTS"]),
    int(os.environ["BENCH_KEYS"]),
    int(os.environ["BENCH_BATCHES"]),
    runs=int(os.environ.get("BENCH_RUNS", "1")),
)
print("RESULT " + json.dumps({"cpus": cpus, "calib_sec": round(calib, 3), **r}))
"""


def run_level(cpus: int, events: int, keys: int, batches: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_EVENTS": str(events),
        "BENCH_KEYS": str(keys),
        "BENCH_BATCHES": str(batches),
        "REPO": os.path.dirname(os.path.abspath(__file__)),
    }
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker cpus={cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=16_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--pairs", default="2:8,8:32")
    args = ap.parse_args()

    levels = sorted({int(x) for p in args.pairs.split(",") for x in p.split(":")})
    results = {}
    for cpus in levels:
        results[cpus] = run_level(cpus, args.events, args.keys, args.batches)
        print(f"# local[{cpus}]: {results[cpus]}", file=sys.stderr)

    pairs_out = []
    for p in args.pairs.split(","):
        n, n4 = (int(x) for x in p.split(":"))
        lo, hi = results[n], results[n4]
        factor = n4 / n
        speedup = hi["events_per_sec"] / lo["events_per_sec"]
        calib_speedup = lo["calib_sec"] / hi["calib_sec"]
        pairs_out.append(
            {
                "pair": f"local[{n}] -> local[{n4}]",
                "factor": factor,
                "throughput_lo": lo["events_per_sec"],
                "throughput_hi": hi["events_per_sec"],
                "raw_speedup": round(speedup, 3),
                "raw_efficiency": round(speedup / factor, 3),
                "calib_speedup": round(calib_speedup, 3),
                "calib_efficiency": round(calib_speedup / factor, 3),
                "normalized_efficiency": round(speedup / calib_speedup, 3),
            }
        )

    summary = {
        "metric": "scaling_efficiency",
        "events": args.events,
        "keys": args.keys,
        "batches": args.batches,
        "levels": {str(c): results[c] for c in levels},
        "pairs": pairs_out,
    }
    print(json.dumps(summary))

    lines = [
        "",
        "## Measured scaling (bench_scaling.py)",
        "",
        f"Streaming replay of {args.events:,} events / {args.keys:,} keys in "
        f"{args.batches} micro-batches, identical input per level, fresh JVM per level.",
        "",
        "| pair | tput N (ev/s) | tput 4N (ev/s) | raw speedup | raw eff | machine ceiling (calib) | normalized eff |",
        "|---|---|---|---|---|---|---|",
    ]
    for p in pairs_out:
        lines.append(
            f"| {p['pair']} | {p['throughput_lo']:,.0f} | {p['throughput_hi']:,.0f} "
            f"| {p['raw_speedup']}x | {p['raw_efficiency']} "
            f"| {p['calib_speedup']}x | {p['normalized_efficiency']} |"
        )
    lines.append("")
    lines.append(
        "Calibration = embarrassingly parallel pure-codegen job (no shuffle/IO/engine "
        "code) in the same JVMs: the VM's achievable thread-scaling ceiling. "
        "Normalized eff = engine speedup / ceiling speedup."
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
