"""N-vs-4N scaling evidence (BASELINE.md): run the flagship extraction
job at two parallelism levels on the same input, report throughput at
both and the scaling efficiency (throughput ratio / cores ratio).

Two proxies for the two-cluster-size criterion, both reported:

- ``local`` — ``local[8]`` vs ``local[32]``: one JVM, thread count
  scaled. Cheap, but 4N shares ONE heap/GC/allocator across 32 tasks —
  a single-JVM artifact a real cluster does not have.
- ``cluster`` — ``local-cluster[1,8,m]`` vs ``local-cluster[4,8,m]``:
  separate executor JVMs (own heap, own GC, own Python worker pool),
  per-executor shape held constant (8 cores / fixed memory) while the
  EXECUTOR COUNT scales 1 -> 4 — the faithful single-box model of
  adding cluster nodes, isolating the single-JVM artifact from true
  scaling behavior.

The sandbox host is shared; each configuration takes the min of
``--reps`` runs (fresh subprocess per configuration because a
SparkSession's master is fixed for the JVM's lifetime), configurations
are interleaved so external load epochs hit both symmetrically, and
every report records the 1-minute load it saw.

Usage: python tools/bench_scaling.py [--sf-dir DIR] [--reps N]
       [--modes cluster,local]
Writes BENCH.md and prints the JSON result.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sherlock_spark.session import get_spark
from sherlock_spark.sources.transcripts import transcripts_from_documents
from sherlock_spark.operators.ner import annotate_mentions
from sherlock_spark.operators.rc import extract_triples
from sherlock_spark.model_stub import DEFAULT_NER_LEXICON, DEFAULT_RC_LABELS

import shutil, tempfile

master = sys.argv[1]
cores = int(sys.argv[2])
sf_dir = sys.argv[3]
reps = int(sys.argv[4])
replicate = int(sys.argv[5])
executor_mem = sys.argv[6]

extra = {}
if master.startswith("local-cluster"):
    # executors own the heap; the driver only plans/collects counts
    extra = {
        "spark.executor.memory": executor_mem,
        "spark.driver.memory": "8g",
    }
spark = get_spark(
    "scaling", cores=cores, shuffle_partitions=max(cores, 8),
    master=(None if master == "local" else master), extra_conf=extra,
)
spark.range(1000).count()  # warm JVM + workers

# UNMEASURED PREP: materialize the replicated transcript table as a
# partitioned parquet dir with a FIXED file count (identical content at
# both core counts). The north-rule input is an Iceberg transcript
# table — at 10^12 turns the scan has millions of splits — so the
# measured job is scan -> extract -> count over a properly-partitioned
# table; synthesizing + reshuffling the corpus inside the measured
# window would charge the benchmark for a single-file-scan artifact the
# production job does not have.
N_INPUT_FILES = 128
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
docs = docs.withColumn("doc_id", F.col("doc_id") * replicate + F.col("rep")).drop("rep")
input_dir = tempfile.mkdtemp(prefix="scaling_transcripts_")
transcripts_from_documents(docs, 100 * replicate).repartition(
    N_INPUT_FILES, F.col("conv_id")
).write.mode("overwrite").parquet(input_dir)
table = spark.read.parquet(input_dir)
turns = table.count()

def run():
    t = spark.read.parquet(input_dir)
    ann = annotate_mentions(spark, t, DEFAULT_NER_LEXICON)
    return extract_triples(
        spark, ann, DEFAULT_RC_LABELS, None,
        entity_handling="mark_entity", max_length=None, max_mentions=16,
    )

# two uncounted warmup runs (JIT/janino warmup spans more than one run
# at 32 threads; Python worker pool + imports on the first), then
# min-of-``reps`` measured runs in the same JVM — steady-state per
# config; min-taking across interleaved subprocess invocations happens
# in the parent
run().count()
run().count()
best = None
count = 0
for _ in range(reps):
    t0 = time.time()
    count = run().count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({
    "master": master, "cores": cores, "seconds": round(best, 3),
    "triples": count, "turns": turns,
    "triples_per_sec": round(count / best, 1),
    "turns_per_sec": round(turns / best, 1),
    "load_1m": open("/proc/loadavg").read().split()[0],
}))
spark.stop()
shutil.rmtree(input_dir, ignore_errors=True)
"""


def run_config(
    master: str, cores: int, sf_dir: str, reps: int, replicate: int,
    executor_mem: str,
) -> dict:
    out = subprocess.run(
        [
            sys.executable, "-c", WORKER, master, str(cores), sf_dir,
            str(reps), str(replicate), executor_mem,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=2400,
    )
    for line in out.stdout.strip().splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


MODE_CONFIGS = {
    # mode -> (small_master, small_cores, large_master, large_cores)
    "local": ("local", 8, "local", 32),
    "cluster": (
        "local-cluster[1,8,16384]", 8,
        "local-cluster[4,8,16384]", 32,
    ),
}


def measure_mode(mode: str, args) -> dict:
    small_master, small_cores, large_master, large_cores = MODE_CONFIGS[mode]
    if mode == "local":
        small_master = "local"  # worker builds local[cores]
    small_runs: list[dict] = []
    large_runs: list[dict] = []
    # interleave configurations so external load epochs (the host is
    # shared and bursty) hit both configs symmetrically; min per config
    for _ in range(args.rounds):
        small_runs.append(run_config(
            small_master if mode == "cluster" else "local",
            small_cores, args.sf_dir, args.reps, args.replicate, "16g"))
        large_runs.append(run_config(
            large_master if mode == "cluster" else "local",
            large_cores, args.sf_dir, args.reps, args.replicate, "16g"))
    small = min(small_runs, key=lambda r: r["seconds"])
    large = min(large_runs, key=lambda r: r["seconds"])
    speedup = small["seconds"] / large["seconds"]
    cores_ratio = large_cores / small_cores
    return {
        "mode": mode,
        "small": small,
        "large": large,
        "speedup": round(speedup, 3),
        "cores_ratio": cores_ratio,
        "scaling_efficiency": round(speedup / cores_ratio, 3),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--rounds", type=int, default=2)
    parser.add_argument("--replicate", type=int, default=10)
    parser.add_argument("--modes", default="cluster,local")
    args = parser.parse_args()

    results = {}
    for mode in args.modes.split(","):
        results[mode] = measure_mode(mode.strip(), args)
        print(json.dumps(results[mode]))

    with open("/root/repo/BENCH.md", "w") as handle:
        handle.write(render_bench_md(args, results))
    print("wrote BENCH.md", file=sys.stderr)


def render_bench_md(args, results: dict) -> str:
    any_result = next(iter(results.values()))
    turns = any_result["small"]["turns"]
    lines = [f"""# BENCH — measured throughput and N-vs-4N scaling

Flagship job: full triple extraction (partitioned transcript-table scan
-> fused tokenize+NER+span-decode (one iterator pandas UDF) -> per-turn
mention texts -> index-pair explode -> round-robin exchange -> RC model
forward (pandas UDF) -> argmax -> no_relation filter -> count). The
input is a 128-file parquet transcript table materialized (unmeasured)
from `{args.sf_dir}/documents.parquet` replicated x{args.replicate}
({turns} turns) — the north-rule input is a partitioned Iceberg
transcript table, so the measured job reads one like production would
instead of synthesizing + reshuffling the corpus inside the measured
window.

Protocol per configuration: {args.rounds} interleaved fresh-JVM
invocations, each doing 2 uncounted warmup runs then min-of-{args.reps}
measured runs; overall min per config. The host is shared with other
tenants (1-min load observed anywhere from 0.2 to 40), so configs are
interleaved to sample the same noise epochs, the min damps external
bursts, and each row records the load it saw.
"""]
    titles = {
        "cluster": (
            "## Multi-executor proxy — `local-cluster` (separate "
            "executor JVMs)\n\nPer-executor shape held constant (8 "
            "cores, 16g); executor COUNT scales 1 -> 4 — the faithful "
            "single-box model of adding cluster nodes (own heap/GC/"
            "Python pool per executor)."
        ),
        "local": (
            "## Single-JVM proxy — `local[8]` vs `local[32]`\n\nOne "
            "JVM, thread count scaled; 32 tasks share one heap/GC — an "
            "artifact a real cluster does not have (kept for "
            "comparability with earlier rounds)."
        ),
    }
    for mode, result in results.items():
        small, large = result["small"], result["large"]
        lines.append(f"""
{titles[mode]}

| config | wall (s) | triples | triples/sec | turns/sec | load_1m |
|---|---|---|---|---|---|
| {small['master']}[{small['cores']} cores] (N) | {small['seconds']} | {small['triples']} | {small['triples_per_sec']} | {small['turns_per_sec']} | {small['load_1m']} |
| {large['master']}[{large['cores']} cores] (4N) | {large['seconds']} | {large['triples']} | {large['triples_per_sec']} | {large['turns_per_sec']} | {large['load_1m']} |

- speedup (N -> 4N): **{result['speedup']}x** on a {result['cores_ratio']:.0f}x core ratio
- **scaling efficiency: {result['scaling_efficiency']}** (target >= 0.8)
""")
    lines.append(f"""
Reproduce: `python tools/bench_scaling.py --sf-dir {args.sf_dir}`.
Per-query timings: `SPARK_GRAFT_CPUS=32 python bench.py`.
Connected-components scale run: `python tools/bench_cc_scale.py`.
""")
    return "".join(lines)


if __name__ == "__main__":
    main()
