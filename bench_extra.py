"""Round-7 optimization profiling harness (bench.py stays FROZEN).

Isolates the components of bench.py's headline `value` so each optimization
can be measured on its own:

  build   — timed build_index at --docs with per-phase splits, N reps
  init    — SearchEngine construction time (jobs + driver work), N reps
  queries — the exact BENCH_QUERIES mix + batch + multi_match, N reps each,
            min reported; per-query plans dumped to plans/r07/ when
            --plans is given
  jobs    — per-query Spark job/stage counts via the status tracker

Usage:
  python bench_extra.py --docs 10000 --reps 3 [--plans before|after]

Prints one JSON line. Not part of the driver contract; bench.py is the
frozen measurement surface.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.makedirs("/dev/shm/spark-local", exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

BENCH_QUERIES = [
    ("bm25_disj_head", ["w0", "w1", "w2"], "disjunctive", 10),
    ("bm25_disj_torso", ["w50", "w200", "w800"], "disjunctive", 10),
    ("bm25_conj_torso", ["w100", "w150"], "conjunctive", 10),
    ("bm25_conj_rare", ["rareterm7", "rareterm21"], "conjunctive", 10),
    ("bm25_conj_mixed", ["w3", "rareterm11"], "conjunctive", 10),
    ("bm25_disj_mixed", ["w10", "rareterm40"], "disjunctive", 10),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--shard-range", type=int, default=1 << 16)
    ap.add_argument("--plans", default=None,
                    help="dump plans to plans/r07/<q>_<tag>.txt")
    ap.add_argument("--skip-build-reps", action="store_true",
                    help="one build only (for query-focused runs)")
    args = ap.parse_args()

    from picdexer_spark.fixtures.pages import materialize_pages
    from picdexer_spark.index.build import IndexConfig, build_index
    from picdexer_spark.query.bm25 import SearchEngine
    from picdexer_spark.session import get_spark

    cpus = args.cpus
    out: dict = {"docs": args.docs, "cpus": cpus}

    # ---- build (bench.py session shape: 4x shuffle partitions, AQE off)
    spark = get_spark(
        f"bx-build-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    fix = materialize_pages(args.docs, seed=42)
    pages = spark.read.parquet(os.path.join(fix, "pages"))
    os.environ["PICDEXER_BUILD_TIMING"] = "0"
    # warmup
    wdir = tempfile.mkdtemp(prefix="bx_warm_")
    build_index(spark, pages, wdir, IndexConfig(shard_range=args.shard_range))
    shutil.rmtree(wdir, ignore_errors=True)
    builds = []
    phase_sets = []
    index_dir = tempfile.mkdtemp(prefix="bx_idx_")
    reps = 1 if args.skip_build_reps else args.reps
    for _ in range(reps):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        r = build_index(spark, pages, index_dir,
                        IndexConfig(shard_range=args.shard_range))
        builds.append(round(time.time() - t0, 3))
        phase_sets.append(r.phase_secs)
    out["build_secs"] = builds
    out["build_min"] = min(builds)
    out["build_phases_best"] = phase_sets[builds.index(min(builds))]
    # file counts per table (scan-overhead witness)
    snap = os.path.join(index_dir, "snapshots",
                        sorted(os.listdir(os.path.join(index_dir, "snapshots")))[-1])
    fc = {}
    for t in ("docs", "postings/field=text", "postings/field=url", "term_stats"):
        p = os.path.join(snap, t)
        if os.path.isdir(p):
            fc[t] = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    out["file_counts"] = fc
    spark.stop()

    # ---- query session (bench.py shape: shuffle_partitions=max(cpus,8))
    spark = get_spark(f"bx-query-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    inits = []
    for _ in range(args.reps):
        t0 = time.time()
        eng = SearchEngine(spark, index_dir)
        inits.append(round(time.time() - t0, 3))
    out["engine_init_secs"] = inits
    out["engine_init_min"] = min(inits)

    eng.search_topk(["w5"], "disjunctive", 10)  # warmup
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    qsec: dict[str, list] = {}
    jobs: dict[str, int] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r07")
    os.makedirs(plans_dir, exist_ok=True)

    def timed(name, fn, plan_df=None):
        if args.plans and plan_df is not None:
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"),
                      "w") as f:
                f.write(plan_df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        before = len(tracker.getJobIdsForGroup() or [])
        runs = []
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        qsec[name] = runs
        jobs[name] = (len(tracker.getJobIdsForGroup() or []) - before) // args.reps

    for name, terms, mode, k in BENCH_QUERIES:
        df = eng.search(terms, mode, k)
        timed(name, lambda t=terms, m=mode, kk=k: eng.search_topk(t, m, kk),
              plan_df=df)
    batch = [
        {"query_id": i, "terms": terms, "mode": mode, "k": k}
        for i, (_, terms, mode, k) in enumerate(BENCH_QUERIES)
    ]
    timed("bm25_batch_6q", lambda: eng.search_batch(batch).collect(),
          plan_df=eng.search_batch(batch))
    timed("multi_match_most",
          lambda: eng.multi_match(["w5", "site3"], 10, "most_fields").collect(),
          plan_df=eng.multi_match(["w5", "site3"], 10, "most_fields"))

    out["queries_min"] = {n: min(v) for n, v in qsec.items()}
    out["queries_all"] = qsec
    out["jobs_per_query"] = jobs
    spark.stop()
    shutil.rmtree(index_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
