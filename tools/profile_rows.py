"""Per-row job-attribution profiler (guide §1.1/§1.5): runs named
registry rows exactly like bench.py's timed action (noop sink), labels
each row's jobs with a job group, then reads the local UI REST API to
attribute wall time to individual Spark jobs (description, duration,
stage shuffle bytes). Output: per-row job table to stderr + one JSON
line to stdout.

Usage: python tools/profile_rows.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from deltacat_spark.session import build_session
    from deltacat_spark.workloads import REGISTRY

    spark = build_session(
        "profile-rows", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    out: dict[str, dict] = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                try:
                    spark.catalog.dropTempView(tbl.name)
                except Exception:
                    pass
        sc.setJobGroup(name, name)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        time.sleep(0.5)
        jobs = _api(base, "/jobs?status=succeeded")
        rows = []
        for j in jobs:
            if j.get("jobGroup") != name:
                continue
            dur = None
            if j.get("submissionTime") and j.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                dur = (
                    datetime.strptime(j["completionTime"], fmt)
                    - datetime.strptime(j["submissionTime"], fmt)
                ).total_seconds()
            rows.append(
                {
                    "jobId": j["jobId"],
                    "dur": round(dur, 3) if dur is not None else None,
                    "tasks": j.get("numCompletedTasks"),
                    "desc": (j.get("description") or "")[:40]
                    + " | "
                    + j.get("name", "")[:90],
                }
            )
        rows.sort(key=lambda r: r["jobId"])
        jobs_total = sum(r["dur"] or 0 for r in rows)
        print(
            f"\n== {name}: wall={wall:.2f}s jobs={len(rows)} "
            f"job_time_sum={jobs_total:.2f}s "
            f"(gaps/driver={wall - jobs_total:.2f}s)",
            file=sys.stderr,
        )
        for r in rows:
            print(
                f"  job {r['jobId']:>4} {r['dur'] if r['dur'] is not None else '?':>7} s"
                f" tasks={r['tasks']:>4}  {r['desc']}",
                file=sys.stderr,
            )
        out[name] = {
            "wall": round(wall, 3),
            "n_jobs": len(rows),
            "job_time_sum": round(jobs_total, 3),
            "jobs": rows,
        }
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "jobs"} for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
