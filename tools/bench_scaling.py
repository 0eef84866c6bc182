"""N-vs-4N scaling evidence (BASELINE.md): run the flagship extraction
job at local[8] and local[32] on the same input, report throughput at
both and the scaling efficiency (throughput ratio / cores ratio).

The sandbox host is shared; each configuration takes the min of
``--reps`` runs (default 3) to damp external load bursts. Fresh
subprocess per configuration because a SparkSession's master is fixed
for the JVM's lifetime.

Usage: python tools/bench_scaling.py [--sf-dir DIR] [--reps N]
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

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
reps = int(sys.argv[3])
replicate = int(sys.argv[4])
spark = get_spark("scaling", cores=cores)
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
parallelism = spark.sparkContext.defaultParallelism
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
    "cores": cores, "seconds": round(best, 3), "triples": count,
    "turns": turns,
    "triples_per_sec": round(count / best, 1),
    "turns_per_sec": round(turns / best, 1),
    "load_1m": open("/proc/loadavg").read().split()[0],
}))
spark.stop()
shutil.rmtree(input_dir, ignore_errors=True)
"""


def run_config(cores: int, sf_dir: str, reps: int, replicate: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), sf_dir, str(reps), str(replicate)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=1800,
    )
    for line in out.stdout.strip().splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--small", type=int, default=8)
    parser.add_argument("--large", type=int, default=32)
    parser.add_argument("--replicate", type=int, default=10)
    args = parser.parse_args()

    # interleave configurations so external load epochs (the host is
    # shared and bursty) hit both configs symmetrically; min per config
    small_runs: list[dict] = []
    large_runs: list[dict] = []
    for _ in range(2):
        small_runs.append(run_config(args.small, args.sf_dir, args.reps, args.replicate))
        large_runs.append(run_config(args.large, args.sf_dir, args.reps, args.replicate))
    small = min(small_runs, key=lambda r: r["seconds"])
    large = min(large_runs, key=lambda r: r["seconds"])
    speedup = small["seconds"] / large["seconds"]
    cores_ratio = args.large / args.small
    efficiency = speedup / cores_ratio
    result = {
        "sf_dir": args.sf_dir,
        "small": small,
        "large": large,
        "speedup": round(speedup, 3),
        "cores_ratio": cores_ratio,
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(result))

    with open("/root/repo/BENCH.md", "w") as handle:
        handle.write(f"""# BENCH — measured throughput and N-vs-4N scaling

Flagship job: full triple extraction (partitioned transcript-table scan
-> fused tokenize+NER+span-decode (one iterator pandas UDF) -> per-turn
mention texts -> index-pair explode -> round-robin exchange -> RC model
forward (pandas UDF) -> argmax -> no_relation filter -> count). The
input is a 128-file parquet transcript table materialized (unmeasured)
from `{args.sf_dir}/documents.parquet` replicated x{args.replicate}
({small['turns']} turns) — the north-rule input is a partitioned
Iceberg transcript table, so the measured job reads one like production
would instead of synthesizing + reshuffling the corpus inside the
measured window.

Sandbox proxy for the two-cluster-size criterion (per driver
instruction): same job, same input, `local[{args.small}]` (N) vs
`local[{args.large}]` (4N); per configuration: 2 interleaved fresh-JVM
invocations, each doing 2 uncounted warmup runs then min-of-{args.reps}
measured runs; overall min per config. (The host is shared with other
tenants — 1-min load has been observed anywhere from 0.2 to 18 — so
configs are interleaved to sample the same noise epochs, the min damps
external bursts, and each report records the load it saw:
N saw load {small.get('load_1m', '?')}, 4N saw load {large.get('load_1m', '?')}.)

| config | wall (s) | triples | triples/sec | turns/sec |
|---|---|---|---|---|
| local[{args.small}] (N) | {small['seconds']} | {small['triples']} | {small['triples_per_sec']} | {small['turns_per_sec']} |
| local[{args.large}] (4N) | {large['seconds']} | {large['triples']} | {large['triples_per_sec']} | {large['turns_per_sec']} |

- speedup (N -> 4N): **{result['speedup']}x** on a {cores_ratio:.0f}x core ratio
- **scaling efficiency: {result['scaling_efficiency']}** (target >= 0.8, BASELINE.md)

Reproduce: `python tools/bench_scaling.py --sf-dir {args.sf_dir}`.
Per-query timings: `SPARK_GRAFT_CPUS=32 python bench.py`.
""")
    print("wrote BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
