"""A/B probe: input-split size (maxPartitionBytes) vs build time.

Usage: python tools/probe_split.py <cpus> <docs> <confA> <confB> [reps]
Runs A,B,A,B... each in a fresh JVM subprocess (150k warmup build first),
prints per-run seconds and the min per config.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(cpus: int, docs: int, mpb: str) -> float:
    code = f"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, {HERE!r})
os.makedirs("/dev/shm/spark-local", exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
from picdexer_spark.session import get_spark
from picdexer_spark.fixtures.pages import materialize_pages
from picdexer_spark.index.build import build_index, IndexConfig
spark = get_spark("probe", master="local[{cpus}]",
                  shuffle_partitions={4 * cpus},
                  extra_conf={{"spark.sql.adaptive.enabled": "false",
                              "spark.sql.files.maxPartitionBytes": {mpb!r}}})
wfix = materialize_pages(150000, seed=42)
wpages = spark.read.parquet(os.path.join(wfix, "pages"))
wd = tempfile.mkdtemp(prefix="probe_warm_")
build_index(spark, wpages, wd, IndexConfig(shard_range=1 << 16))
shutil.rmtree(wd, ignore_errors=True)
fix = materialize_pages({docs}, seed=42)
pages = spark.read.parquet(os.path.join(fix, "pages"))
d = tempfile.mkdtemp(prefix="probe_idx_")
t0 = time.time()
build_index(spark, pages, d, IndexConfig(shard_range=1 << 16))
print("PROBE_T", time.time() - t0)
shutil.rmtree(d, ignore_errors=True)
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=HERE)
    for ln in out.stdout.splitlines():
        if ln.startswith("PROBE_T"):
            return float(ln.split()[1])
    print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError("no PROBE_T line")


def main() -> None:
    cpus, docs = int(sys.argv[1]), int(sys.argv[2])
    confs = [sys.argv[3], sys.argv[4]]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    times: dict[str, list[float]] = {c: [] for c in confs}
    for r in range(reps):
        for c in confs:
            t = one_run(cpus, docs, c)
            times[c].append(t)
            print(f"rep{r} mpb={c}: {t:.1f}s", flush=True)
    print(json.dumps({c: {"runs": [round(t, 1) for t in ts],
                          "min": round(min(ts), 1)}
                      for c, ts in times.items()}))


if __name__ == "__main__":
    main()
