"""Per-stage scaling breakdown for the replay hot path (judge r4 #2).

The north rule wants ≥0.8 N→4N scaling efficiency. SCALING_r0{3,4} showed
the whole-replay number landing below the pure-codegen machine ceiling, so
this harness answers WHERE the residual goes: it times each stage of one
merge batch separately at two parallelism levels, in fresh JVMs, min-of-R:

  stage scan      parquet feed scan + decode + guard/route/conform
                  (pure codegen, no shuffle)
  stage collapse  scan + the ONE net-effect shuffle + LWW agg (no write)
  stage merge     the full MOR merge: collapse + bucket repartition +
                  partitionBy parquet write + manifest commit
  (derived)       collapse-only = collapse − scan; write+commit = merge −
                  collapse; commit is also timed directly via instrumented
                  `_commit_with_rebase`, write via `_write_bucket_files`.

Variant matrix isolates non-engine terms:
  * table on /tmp (shared virtual disk) vs /dev/shm (RAM): a 1000-executor
    cluster writes through per-node NVMe/object-store bandwidth that scales
    WITH the cluster; this VM's lone virtual disk does not scale with
    thread count — if the write stage is the non-scaler on /tmp but not on
    shm, the residual is the sandbox's storage, not engine code.
  * spark.shuffle.compress on/off: with RAM-backed shuffle dirs the lz4
    pass is pure CPU overhead; a win here is an engine-config lever.

Usage: python bench_stages.py [--events 20000000] [--keys 2000000]
       [--cpus 8,32] [--reps 3] [--out STAGES_r05.json]
Each (cpus, variant) runs in its own JVM via subprocess; one JSON document
is written to --out and a compact line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from data_sync_spark.session import get_spark

CPUS = int(os.environ["SPARK_GRAFT_CPUS"])
EVENTS = int(os.environ["BENCH_EVENTS"])
KEYS = int(os.environ["BENCH_KEYS"])
REPS = int(os.environ["BENCH_REPS"])
TABLE_BASE = os.environ["TABLE_BASE"]
EXTRA = json.loads(os.environ.get("EXTRA_CONF", "{}"))

spark = get_spark("stages", extra_conf=EXTRA)
spark.range(1000).selectExpr("sum(id)").collect()

def timeit(fn, reps=REPS):
    # min-of-R: host steal only adds time
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)

# machine thread-scaling ceiling (pure codegen, no shuffle/IO)
def calib():
    spark.range(0, 256_000_000, 1, CPUS).selectExpr(
        "sum(pmod(xxhash64(xxhash64(xxhash64(xxhash64(xxhash64(id))))), 1000))"
    ).collect()
calib()
calib_sec = timeit(calib)

# pure-shuffle ceiling: same rows round-tripped through one exchange
def shuf():
    spark.range(0, 64_000_000, 1, CPUS).groupBy(
        (F.col("id") % 8_000_000).alias("k")
    ).agg(F.max("id")).selectExpr("sum(`max(id)`)").collect()
shuf()
shuffle_sec = timeit(shuf)

from data_sync_spark.config import PipelineConfig
from data_sync_spark.generator import change_feed
from data_sync_spark.lake import LakeTable
from data_sync_spark.lake import table as table_mod
from data_sync_spark.pipeline import net_changes, prepare_events
from data_sync_spark.schema import TARGET_SCHEMA

os.makedirs(TABLE_BASE, exist_ok=True)
feed_dir = os.path.join(TABLE_BASE, "feed")
change_feed(
    spark, EVENTS, n_keys=KEYS, seed=42, partitions=max(8, CPUS)
).write.mode("overwrite").parquet(feed_dir)
events = spark.read.parquet(feed_dir)
cfg = PipelineConfig()

# stage: scan+decode+guard/route/conform (forces tokens to be read)
prep = prepare_events(events, cfg, TARGET_SCHEMA)
def run_scan():
    prep.agg(F.count(F.lit(1)), F.sum(F.size("tokens")), F.sum("log_offset")).collect()
run_scan()
scan_sec = timeit(run_scan)

# stage: + the one net-effect shuffle + LWW agg (no write)
def run_collapse():
    net = net_changes(events, cfg, TARGET_SCHEMA)
    net.agg(F.count(F.lit(1)), F.sum(F.size("u_val.tokens"))).collect()
run_collapse()
collapse_sec = timeit(run_collapse)

# stage: the full MOR merge (instrumented: write + commit split out)
acc = {"write": 0.0, "commit": 0.0}
real_write = LakeTable._write_bucket_files
real_commit = LakeTable._commit_with_rebase
def timed_write(self, *a, **kw):
    t0 = time.monotonic()
    try:
        return real_write(self, *a, **kw)
    finally:
        acc["write"] += time.monotonic() - t0
def timed_commit(self, *a, **kw):
    t0 = time.monotonic()
    try:
        return real_commit(self, *a, **kw)
    finally:
        acc["commit"] += time.monotonic() - t0
LakeTable._write_bucket_files = timed_write
LakeTable._commit_with_rebase = timed_commit

merge_runs = []
write_runs, commit_runs = [], []
for r in range(REPS + 1):  # +1 warmup
    tdir = os.path.join(TABLE_BASE, f"t{r}")
    table = LakeTable.create(spark, tdir, TARGET_SCHEMA, n_buckets=max(32, CPUS * 2))
    acc["write"] = acc["commit"] = 0.0
    t0 = time.monotonic()
    table.merge(net_changes(events, cfg, TARGET_SCHEMA), app_id="st", batch_id=0, mor=True)
    dt = time.monotonic() - t0
    if r > 0:
        merge_runs.append(dt)
        write_runs.append(acc["write"])
        commit_runs.append(acc["commit"])
    import shutil as _sh
    _sh.rmtree(tdir, ignore_errors=True)
merge_sec = round(min(merge_runs), 3)
write_sec = round(min(write_runs), 3)
commit_sec = round(min(commit_runs), 3)

print("RESULT " + json.dumps({
    "cpus": CPUS,
    "calib_sec": calib_sec,
    "shuffle_calib_sec": shuffle_sec,
    "scan_sec": scan_sec,
    "collapse_sec": collapse_sec,
    "merge_sec": merge_sec,
    "write_bucket_files_sec": write_sec,
    "manifest_commit_sec": commit_sec,
    "collapse_only_sec": round(collapse_sec - scan_sec, 3),
    "write_commit_only_sec": round(merge_sec - collapse_sec, 3),
}))
"""


def run_worker(
    repo: str, cpus: int, events: int, keys: int, reps: int,
    table_base: str, extra_conf: dict,
) -> dict:
    env = {
        **os.environ,
        "REPO": repo,
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_EVENTS": str(events),
        "BENCH_KEYS": str(keys),
        "BENCH_REPS": str(reps),
        "TABLE_BASE": table_base,
        "EXTRA_CONF": json.dumps(extra_conf),
    }
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker cpus={cpus} base={table_base} failed:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="STAGES_r05.json")
    ap.add_argument("--repo", default=os.path.dirname(os.path.abspath(__file__)))
    args = ap.parse_args()
    levels = [int(c) for c in args.cpus.split(",")]

    variants = [
        ("disk", "/tmp/dss-stages", {}),
        ("shm", "/dev/shm/dss-stages", {}),
        (
            "shm_nocompress",
            "/dev/shm/dss-stages-nc",
            {"spark.shuffle.compress": "false",
             "spark.shuffle.spill.compress": "false"},
        ),
    ]
    results: dict = {"events": args.events, "keys": args.keys, "variants": {}}
    for name, base, extra in variants:
        results["variants"][name] = {}
        for cpus in levels:
            r = run_worker(
                args.repo, cpus, args.events, args.keys, args.reps, base, extra
            )
            results["variants"][name][str(cpus)] = r
            print(f"# {name} local[{cpus}]: {r}", file=sys.stderr)
        lo = results["variants"][name][str(levels[0])]
        hi = results["variants"][name][str(levels[-1])]
        scale = {}
        for k in (
            "calib_sec", "shuffle_calib_sec", "scan_sec", "collapse_sec",
            "merge_sec", "write_bucket_files_sec", "manifest_commit_sec",
            "collapse_only_sec", "write_commit_only_sec",
        ):
            if hi.get(k) and hi[k] > 0:
                scale[k] = round(lo[k] / hi[k], 3)
        results["variants"][name]["speedup_lo_over_hi"] = scale
        import shutil
        shutil.rmtree(base, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "stage_scaling", "out": args.out,
                      "variants": {n: results["variants"][n]["speedup_lo_over_hi"]
                                   for n, _, _ in variants}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
