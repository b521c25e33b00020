"""Per-query job-level profiler (round-8 measurement tooling).

Runs one contract query with the Spark event log enabled, then parses the
log into a timeline of jobs (description, duration) and the driver-side
gaps between them — the empirical split the optimization guide's §1 asks
for: is the wall time in Spark jobs (which stage?) or in driver-serial
work (commit/manifest/py4j)?

Usage: python profile_query.py <query_name> [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    log_dir = f"/tmp/dss-eventlog-{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)

    from data_sync_spark.session import get_spark

    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = entrymod.queries()[name]
    walls = []
    marks = []
    for i in range(repeats):
        t0 = time.monotonic()
        wall_t0 = time.time() * 1000
        df = fn(spark, sf_dir)
        df.count()
        walls.append(round(time.monotonic() - t0, 3))
        marks.append((wall_t0, time.time() * 1000))
        print(f"# pass {i}: {walls[-1]}s", file=sys.stderr)
    spark.stop()

    # parse the event log: job timeline
    import glob

    jobs = {}
    paths = []
    for p in glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, f) for f in os.listdir(p) if "spark" in f.lower()
                or f.startswith("events")
            )
        else:
            paths.append(p)
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        )[:90],
                        "stages": len(ev.get("Stage IDs", [])),
                        "callsite": (ev.get("Properties") or {}).get(
                            "callSite.short", ""
                        ),
                    }
                elif ev.get("Event") == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    for p, (m0, m1) in enumerate(marks):
        print(f"\n== pass {p}: wall {walls[p]}s ==")
        inside = [
            (jid, j) for jid, j in sorted(jobs.items())
            if j.get("end") and j["start"] >= m0 - 50 and j["start"] <= m1 + 50
        ]
        prev_end = m0
        total_job = 0.0
        total_gap = 0.0
        for jid, j in inside:
            gap = (j["start"] - prev_end) / 1000
            dur = (j["end"] - j["start"]) / 1000
            total_job += dur
            total_gap += max(0, gap)
            label = j["desc"] or j["callsite"]
            print(f"  gap {gap:6.3f}s | job {jid:4d} {dur:6.3f}s "
                  f"({j['stages']} stages) {label}")
            prev_end = j["end"]
        print(f"  tail gap {(m1 - prev_end) / 1000:6.3f}s")
        print(f"  == jobs {total_job:.3f}s, driver gaps "
              f"{total_gap + (m1 - prev_end) / 1000:.3f}s ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
