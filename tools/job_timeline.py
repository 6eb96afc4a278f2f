"""Per-job timeline of one query execution (guide §1/§7.1, headless twin
of the UI's job list): run a named query's noop write once in a warm
session, then dump every Spark job's submission/completion wall-clock
offsets from the REST status API so overlap (or serialization) of
broadcast-build jobs is visible. Usage:

    python tools/job_timeline.py q52_tpch_q5 [more names...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wing_binlog_go_spark.registry import all_queries
from wing_binlog_go_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-timeline")
    registry = all_queries()
    registry["q01_parquet_scan"].spark(spark, sf_dir).collect()  # warm

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(min_job_id: int) -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            js = json.load(r)
        return sorted(
            (j for j in js if j["jobId"] >= min_job_id), key=lambda j: j["jobId"]
        )

    from datetime import datetime

    def _ms(s: str) -> float:
        return datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    for name in names:
        spec = registry[name]
        df = None
        # one untimed run to settle codegen caches, then the measured one
        for phase in ("warm", "measure"):
            spark.sparkContext.setJobDescription(f"{name}:{phase}:build")
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs"
            ) as r:
                seen = json.load(r)
            next_job = max((j["jobId"] for j in seen), default=-1) + 1
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            t_build = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(f"{name}:{phase}:noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_noop = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)  # let the status store catch up
        jobs = jobs_after(next_job)
        if not jobs:
            continue
        base = min(_ms(j["submissionTime"]) for j in jobs)
        print(f"\n=== {name}  build={t_build:.3f}s noop={t_noop:.3f}s ===")
        for j in jobs:
            sub = _ms(j["submissionTime"]) - base
            end = _ms(j["completionTime"]) - base
            desc = (j.get("description") or j["name"])[:90]
            ntask = j["numTasks"]
            bar_off = int(sub * 100)
            bar_len = max(1, int((end - sub) * 100))
            print(
                f"  job {j['jobId']:4d} {sub:7.3f}→{end:7.3f}s "
                f"({ntask:3d} tasks) {' ' * min(bar_off, 60)}{'#' * min(bar_len, 60)} {desc}"
            )


if __name__ == "__main__":
    main()
