"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Paired-run protocol (the r10 verdict's drift adjudication, now built
in): set SPARK_GRAFT_BENCH_PAIRED_REF to a checkout of the reference
tree (the r8 bench tree, commit 4d1e4bb — ``git worktree add
.claude/worktrees/r8tree 4d1e4bb``) and bench.py runs N interleaved
pairs (SPARK_GRAFT_BENCH_PAIRS, default 5) of fresh-process bench runs
— reference tree vs this tree, alternating which goes first — and
writes paired medians to BENCH_PAIRED_r{round}.json. This box swings
±25 % across sessions, so single-tree round-over-round totals cannot
distinguish machine drift from a code regression; paired same-session
medians can.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wing_binlog_go_spark.registry import all_queries
from wing_binlog_go_spark.session import get_spark

HEADLINE = [
    "q01_parquet_scan",
    "q03_filter",
    "q06_inner_join",
    "q07_broadcast_join",
    "q12_range_join",
    "q14_tpch_q3",
    "q15_asof_join",
    "q15b_asof_merge",
    "q16_tpch_q1",
    "q17_count_distinct",
    "q19_rollup",
    "q22_window_ranking",
    "q24_window_frame",
    "q25_multi_key_sort",
    "q27_union",
    "q36_exact_dedup",
    "q37_minhash_dedup",
    "q38_ann_brute_force",
    "q39_word_count",
    "q39d_quality_score",
    "q52_tpch_q5",
    "q68_sessionization",
]


def _bench_round(repo_dir: str) -> int:
    """Round number = latest driver CORRECTNESS round + 1, so repeated
    bench runs within one round overwrite the same side artifacts."""
    correctness = [
        int(name[len("CORRECTNESS_r"):-len(".json")])
        for name in os.listdir(repo_dir)
        if name.startswith("CORRECTNESS_r") and name.endswith(".json")
        and name[len("CORRECTNESS_r"):-len(".json")].isdigit()
    ]
    return max(correctness, default=0) + 1


def _run_tree_once(tree: str) -> dict | None:
    """One fresh-process bench run of ``tree``; returns its parsed JSON
    line (None on failure). The child env strips the paired-mode vars
    so the run is a plain single-tree bench, and pins RUNS=2 (the r10
    adjudication protocol)."""
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_BENCH_PAIRED_REF", None)
    env["SPARK_GRAFT_BENCH_RUNS"] = env.get("SPARK_GRAFT_BENCH_PAIRED_RUNS", "2")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(tree, "bench.py")],
            cwd=tree, env=env, capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().rsplit("\n", 1)[-1]
        return json.loads(line)
    except Exception as exc:  # noqa: BLE001 - recorded in the artifact
        print(f"paired bench: run in {tree} failed: {exc}", file=sys.stderr)
        return None


def _paired_main(ref_tree: str) -> None:
    """Interleaved paired bench: N pairs of (reference tree, this tree)
    fresh-process runs, alternating which tree goes first so slow
    box-drift within the session cancels. Emits ONE JSON line with the
    paired medians and writes the full per-run record to
    BENCH_PAIRED_r{round}.json."""
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    n_pairs = int(os.environ.get("SPARK_GRAFT_BENCH_PAIRS", "5"))
    runs: list[dict] = []
    for i in range(n_pairs):
        order = [("ref", ref_tree), ("cur", repo_dir)]
        if i % 2:
            order.reverse()
        for tag, tree in order:
            res = _run_tree_once(tree)
            runs.append({"pair": i, "tree": tag, "result": res})
    totals = {
        tag: [r["result"]["value"] for r in runs
              if r["tree"] == tag and r["result"]]
        for tag in ("ref", "cur")
    }
    med = {tag: round(statistics.median(v), 3) if v else None
           for tag, v in totals.items()}
    per_query: dict[str, dict] = {}
    for tag in ("ref", "cur"):
        qs = [r["result"]["queries"] for r in runs
              if r["tree"] == tag and r["result"]]
        for name in qs[0] if qs else {}:
            vals = [q[name] for q in qs if name in q]
            per_query.setdefault(name, {})[tag] = round(
                statistics.median(vals), 3)
    for name, d in per_query.items():
        if d.get("ref") and d.get("cur"):
            d["ratio"] = round(d["cur"] / d["ref"], 3)
    result = {
        "metric": "paired_headline_median_total",
        "unit": "sec",
        "pairs": n_pairs,
        "ref_tree": ref_tree,
        "median_total": med,
        "cur_vs_ref": round(med["cur"] / med["ref"], 3)
        if med["ref"] and med["cur"] else None,
    }
    path = os.path.join(
        repo_dir, f"BENCH_PAIRED_r{_bench_round(repo_dir):02d}.json")
    with open(path, "w") as f:
        json.dump({**result, "per_query_median": per_query, "runs": runs},
                  f, indent=1)
    print(json.dumps(result))


def main() -> None:
    ref_tree = os.environ.get("SPARK_GRAFT_BENCH_PAIRED_REF")
    if ref_tree:
        _paired_main(ref_tree)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("wing-binlog-go-spark-bench")
    registry = all_queries()

    # warm the JVM + parquet footer caches so per-query numbers measure the
    # query, not session bring-up (driver compares across rounds).
    registry["q01_parquet_scan"].spark(spark, sf_dir).collect()

    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    dists: dict[str, dict] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            # a missing headline query means an operator module failed to
            # import — surface it instead of silently shrinking the total
            skipped.append(name)
            continue
        # n runs (default 3, SPARK_GRAFT_BENCH_RUNS): the later runs
        # reuse compiled codegen and parquet footer caches, so min()
        # measures the query rather than one-time session warmup or a
        # co-tenant CPU spike. The headline value stays the min (the
        # r1-r6 comparator); the full {min, median, max} distribution
        # is recorded under "dist" (r6 verdict ask #4: a single sample
        # cannot separate machine noise from a real regression).
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        n = len(samples)
        median = (
            samples[n // 2]
            if n % 2
            else (samples[n // 2 - 1] + samples[n // 2]) / 2
        )
        timings[name] = round(samples[0], 3)
        dists[name] = {
            "min": round(samples[0], 3),
            "median": round(median, 3),
            "max": round(samples[-1], 3),
        }

    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs_per_query": n_runs,
        "sf": sf_val,
    }
    if skipped:
        result["skipped"] = skipped
    # BASELINE.md contract: first green run records BENCH.json; later
    # runs compare against it (2× budget) without overwriting.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    bench_path = os.path.join(repo_dir, "BENCH.json")
    if not os.path.exists(bench_path):
        with open(bench_path, "w") as f:
            json.dump(result, f, indent=1)
    else:
        with open(bench_path) as f:
            baseline = json.load(f)
        if baseline.get("sf") == result["sf"] and baseline.get("value"):
            result["vs_baseline"] = round(result["value"] / baseline["value"], 3)
    # The per-query {min, median, max} distributions go to a committed
    # side artifact, NOT stdout: r7's single stdout line with the dist
    # map inlined overflowed the driver's tail capture and BENCH_r07
    # recorded parsed: null. The headline line must stay compact and
    # must be the LAST stdout line.
    dist_round = _bench_round(repo_dir)
    # if this round has a committed paired-protocol artifact, reference
    # it from the headline line so the driver's BENCH_r{N} points at
    # the drift-adjudicated numbers
    paired_path = f"BENCH_PAIRED_r{dist_round:02d}.json"
    if os.path.exists(os.path.join(repo_dir, paired_path)):
        result["paired_artifact"] = paired_path
    dist_path = os.path.join(repo_dir, f"BENCH_DIST_r{dist_round:02d}.json")
    with open(dist_path, "w") as f:
        json.dump(
            {"dist": dists, "runs_per_query": n_runs, "sf": sf_val,
             "headline_total_min_sec": result["value"]},
            f, indent=1,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
