"""Per-query profiling: split construction vs execution cost (guide §1).

For each headline query (or names passed on argv): time
  - build   : spec.spark(spark, sf_dir) — plan construction, includes any
              eager work (localCheckpoint, broadcast-side jobs)
  - noop    : df.write.format("noop") — computes every column, no collect
  - collect : .collect() — the bench's timed action
Prints one line per query and a JSON summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wing_binlog_go_spark.registry import all_queries
from wing_binlog_go_spark.session import get_spark


def main() -> None:
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    spark = get_spark("profile-queries")
    registry = all_queries()
    # warm like bench.py does
    registry["q01_parquet_scan"].spark(spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in names:
        spec = registry.get(name)
        if spec is None:
            continue
        builds, noops, collects = [], [], []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name}: build")
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            builds.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noops.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"{name}: collect")
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            collects.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "build_min": round(min(builds), 3),
            "noop_min": round(min(noops), 3),
            "collect_min": round(min(collects), 3),
        }
        print(
            f"{name:28s} build={min(builds):6.3f} noop={min(noops):6.3f} "
            f"collect={min(collects):6.3f}",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
