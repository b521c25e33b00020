"""Round-8 optimization measurement harness.

``bench.py`` is FROZEN for measurement (the driver re-runs the round-start
copy), so every extra experiment lives here:

* ``replay_ab``: interleaved same-JVM A/B of the headline replay across
  config/code variants — arms alternate A/B/A/B within one session so host
  weather hits both alike (the round-7 lesson: cross-JVM arms minutes apart
  swung ±26%).
* ``time_queries`` passthrough at sf0.1 for per-query before/after.
* ``capture_plans``: ``explain("formatted")`` of every contract query into
  plans/r08/.

Usage:
  python bench_extra.py ab            # committer v1 vs v2 interleaved
  python bench_extra.py queries [k]   # k timed passes over all queries
  python bench_extra.py plans before|after
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _replay_once(spark, flat: str, n_events: int, n_batches: int, tag: str) -> dict:
    """One replay of the pre-materialized feed into a fresh table, timed the
    same way run_replay_bench times a run (create outside, stream inside)."""
    from data_sync_spark.config import PipelineConfig
    from data_sync_spark.lake import LakeTable
    from data_sync_spark.metrics import MetricsSink
    from data_sync_spark.schema import TARGET_SCHEMA
    from data_sync_spark.streaming.runner import run_stream

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix=f"dss-ab-{tag}-")
    try:
        table = LakeTable.create(
            spark, os.path.join(tmp, "t"), TARGET_SCHEMA,
            n_buckets=max(32, cpus * 2),
            compact_threshold=max(16, 2 * n_batches),
        )
        t0 = time.monotonic()
        q = run_stream(
            spark, flat, table, PipelineConfig(), os.path.join(tmp, "ckpt"),
            max_files_per_trigger=max(8, cpus // 2),
        )
        q.awaitTermination()
        elapsed = time.monotonic() - t0
        recs = MetricsSink(table.path).records()
        return {
            "elapsed_sec": round(elapsed, 3),
            "events_per_sec": round(n_events / elapsed, 1),
            "batch_secs": [round(float(r.get("elapsed_sec") or 0), 2) for r in recs],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def replay_ab(variants, n_events=16_000_000, n_keys=2_000_000, n_batches=4,
              alternations=3) -> dict:
    """``variants``: list of (name, setup_fn(spark)). Arms interleave within
    one JVM; one untimed warmup precedes timing. Reports median + floor."""
    from bench import _materialize_feed

    from data_sync_spark.session import get_spark

    spark = get_spark("bench-extra-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.mkdtemp(prefix="dss-ab-feed-")
    out: dict = {"events": n_events, "alternations": alternations, "arms": {}}
    try:
        flat = _materialize_feed(spark, tmp, n_events, n_keys, n_batches)
        # untimed warmup under the first variant's setup
        variants[0][1](spark)
        _replay_once(spark, flat, n_events, n_batches, "warm")
        runs: dict[str, list[dict]] = {name: [] for name, _ in variants}
        for a in range(alternations):
            for name, setup in variants:
                setup(spark)
                r = _replay_once(spark, flat, n_events, n_batches, f"{name}{a}")
                runs[name].append(r)
                print(f"# {name} alt{a}: {r['events_per_sec']} ev/s "
                      f"{r['batch_secs']}", file=sys.stderr)
        for name, rs in runs.items():
            evs = [r["events_per_sec"] for r in rs]
            out["arms"][name] = {
                "median": statistics.median(evs),
                "floor": max(evs),
                "runs": evs,
                "batch_secs": [r["batch_secs"] for r in rs],
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _set_committer(v: str):
    def setup(spark):
        spark.sparkContext._jsc.hadoopConfiguration().set(
            "mapreduce.fileoutputcommitter.algorithm.version", v
        )
    return setup


def run_queries(runs: int) -> dict:
    from bench import time_queries

    from data_sync_spark.session import get_spark

    spark = get_spark("bench-extra-queries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    medians, floors, all_runs = time_queries(spark, sf_dir, runs)
    return {"queries": medians, "queries_noise_floor": floors,
            "query_runs": all_runs}


def capture_plans(tag: str, names: list[str] | None = None) -> None:
    """``explain("formatted")`` of each contract query's returned DataFrame
    into plans/r08/<name>_<tag>.txt. For queries that materialize a snapshot
    and return a plain parquet read, the interesting plan is internal — those
    get their plan captured by the dedicated profile scripts instead; the
    returned-plan file still pins scan schema / pushed filters."""
    import __spark_entry__ as entrymod

    from data_sync_spark.session import get_spark

    spark = get_spark("bench-extra-plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    os.makedirs(os.path.join(REPO, "plans", "r08"), exist_ok=True)
    for name, fn in qs.items():
        if names and name not in names:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(REPO, "plans", "r08", f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"# plan {name} -> {name}_{tag}.txt", file=sys.stderr)


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if cmd == "ab":
        res = replay_ab([
            ("committer_v1", _set_committer("1")),
            ("committer_v2", _set_committer("2")),
        ], alternations=int(os.environ.get("AB_ALTERNATIONS", "3")))
        print(json.dumps(res))
    elif cmd == "queries":
        runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        res = run_queries(runs)
        print(json.dumps(res))
    elif cmd == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "before",
                      names=sys.argv[3].split(",") if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown command {cmd}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
