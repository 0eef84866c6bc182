"""Measured recall of the approximate (LSH) paths vs their exact twins.

The oracle gates pin exact-verified OUTPUT correctness but the recall of
the bucketing itself was design-argued; this harness attaches numbers
to the knobs (``similarity.py lsh_topk_cosine`` docstring,
``dedup.py minhash_dedup_pairs``). Four studies:

1. ANN top-k recall: ``lsh_topk_cosine`` vs exact ``cosine_topk`` on
   the raw embeddings (i.i.d. random — the HARD case: neighbors sit at
   cos ~0.3-0.5, where hyperplane LSH has weak signal), across
   plane/band settings. Candidate-pair count is the cost proxy.
2. Planted near-dup recall: ``embedding_cosine_dedup_pairs`` vs the
   known planted clone pairs (cos ~0.9999 — the case the dedup path
   exists for), same settings.
3. MinHash near-dup recall: ``minhash_dedup_pairs`` vs exact
   ``ngram_jaccard_pairs`` at J>=0.8, across band settings.
4. IVF top-k recall: ``ivf_topk_cosine`` vs exact ``cosine_topk`` on
   the same random embeddings, across (n_centroids, nprobe) — the
   recall/cost trade is nprobe/n_centroids (fraction of the corpus
   scanned per query).

Run: ``python tools/recall_study.py [sf_dir]``. Prints one JSON line
per (study, setting) plus a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sherlock_spark.session import get_spark  # noqa: E402
from sherlock_spark.functions.dedup import (  # noqa: E402
    embedding_cosine_dedup_pairs,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from sherlock_spark.functions.similarity import (  # noqa: E402
    cosine_topk,
    hyperplane_lsh_candidates,
    ivf_assign,
    ivf_centroids_deterministic,
    ivf_topk_cosine,
    lsh_topk_cosine,
)

N_QUERIES = 64
K = 10
ANN_SETTINGS = [(16, 4), (16, 8), (32, 4)]  # (planes, bands)
MINHASH_SETTINGS = [(32, 16), (32, 8), (64, 16)]  # (hashes, bands)
# (n_centroids, nprobe); (16, 8) is the library default and gate config
IVF_SETTINGS = [(16, 1), (16, 4), (16, 8), (32, 4), (32, 8)]
CLONE_STEP = 5
CLONE_OFFSET = 100_000


def pair_set(df, a, b):
    return {(row[a], row[b]) for row in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("recall_study")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    results = []

    # -- 1. ANN top-k on raw (random) embeddings ------------------------
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        query: set()
        for query in range(N_QUERIES)
    }
    for row in cosine_topk(emb, queries, k=K).collect():
        exact[row["query_id"]].add(row["neighbor_id"])
    for planes, bands in ANN_SETTINGS:
        approx: dict[int, set] = {query: set() for query in exact}
        for row in lsh_topk_cosine(
            emb, queries, k=K, n_planes=planes, bands=bands
        ).collect():
            approx[row["query_id"]].add(row["neighbor_id"])
        recall = sum(
            len(exact[q] & approx[q]) / max(len(exact[q]), 1) for q in exact
        ) / len(exact)
        n_cand = hyperplane_lsh_candidates(
            emb, n_planes=planes, bands=bands
        ).count()
        results.append(
            {
                "study": "ann_topk_random",
                "planes": planes,
                "bands": bands,
                "recall": round(recall, 4),
                "candidate_pairs": n_cand,
            }
        )

    # -- 1b. IVF top-k on the same random embeddings --------------------
    for n_centroids, nprobe in IVF_SETTINGS:
        approx = {query: set() for query in exact}
        for row in ivf_topk_cosine(
            emb, queries, k=K, n_centroids=n_centroids, nprobe=nprobe
        ).collect():
            approx[row["query_id"]].add(row["neighbor_id"])
        recall = sum(
            len(exact[q] & approx[q]) / max(len(exact[q]), 1) for q in exact
        ) / len(exact)
        cents = ivf_centroids_deterministic(emb, n_centroids)
        n_cand = (
            ivf_assign(queries, cents, nprobe)
            .select(F.col("vid").alias("query_id"), "centroid_id")
            .join(
                ivf_assign(emb, cents, 1).select(
                    F.col("vid").alias("neighbor_id"), "centroid_id"
                ),
                "centroid_id",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .count()
        )
        results.append(
            {
                "study": "ivf_topk_random",
                "centroids": n_centroids,
                "nprobe": nprobe,
                "recall": round(recall, 4),
                "candidate_pairs": n_cand,
            }
        )

    # -- 1c. IVF with Lloyd-refined centroids (the production
    # quantizer; the deterministic one above is the SQL-replayable gate
    # config) at the library default (16 cells, nprobe 8) ---------------
    from sherlock_spark.functions.similarity import ivf_centroids_kmeans

    km_cents = ivf_centroids_kmeans(emb, 16, iterations=5)
    approx = {query: set() for query in exact}
    for row in ivf_topk_cosine(
        emb, queries, k=K, n_centroids=16, nprobe=8, centroids=km_cents
    ).collect():
        approx[row["query_id"]].add(row["neighbor_id"])
    recall = sum(
        len(exact[q] & approx[q]) / max(len(exact[q]), 1) for q in exact
    ) / len(exact)
    n_cand = (
        ivf_assign(queries, km_cents, 8)
        .select(F.col("vid").alias("query_id"), "centroid_id")
        .join(
            ivf_assign(emb, km_cents, 1).select(
                F.col("vid").alias("neighbor_id"), "centroid_id"
            ),
            "centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .count()
    )
    results.append(
        {
            "study": "ivf_topk_random_kmeans",
            "centroids": 16,
            "nprobe": 8,
            "recall": round(recall, 4),
            "candidate_pairs": n_cand,
        }
    )

    # -- 2. planted-clone dedup recall ----------------------------------
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    clones = base.filter(F.col("vec_id") % CLONE_STEP == 0).select(
        (F.col("vec_id") + CLONE_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i % 2 == 0, F.lit(0.01)).otherwise(F.lit(-0.01)),
        ).alias("embedding"),
    )
    corpus = base.unionByName(clones)
    truth = {
        (int(row["vec_id"]), int(row["vec_id"]) + CLONE_OFFSET)
        for row in base.filter(F.col("vec_id") % CLONE_STEP == 0)
        .select("vec_id")
        .collect()
    }
    for planes, bands in ANN_SETTINGS:
        found = pair_set(
            embedding_cosine_dedup_pairs(
                corpus, threshold=0.99, n_planes=planes, bands=bands
            ),
            "id_a",
            "id_b",
        )
        results.append(
            {
                "study": "planted_clone_dedup",
                "planes": planes,
                "bands": bands,
                "recall": round(len(found & truth) / len(truth), 4),
                "planted_pairs": len(truth),
            }
        )

    # -- 3. MinHash vs exact n-gram Jaccard -----------------------------
    exact_pairs = pair_set(
        ngram_jaccard_pairs(documents, n=3, threshold=0.8), "doc_a", "doc_b"
    )
    for hashes, bands in MINHASH_SETTINGS:
        found = pair_set(
            minhash_dedup_pairs(
                documents, threshold=0.8, n_hashes=hashes, bands=bands
            ),
            "doc_a",
            "doc_b",
        )
        n_cand = minhash_lsh_candidates(
            documents, n_hashes=hashes, bands=bands
        ).count()
        results.append(
            {
                "study": "minhash_vs_exact",
                "hashes": hashes,
                "bands": bands,
                "recall": round(len(found & exact_pairs) / len(exact_pairs), 4)
                if exact_pairs
                else None,
                "exact_pairs": len(exact_pairs),
                "candidate_pairs": n_cand,
            }
        )

    for record in results:
        print(json.dumps(record))

    print("\n| study | setting | recall | cost (candidate pairs) |")
    print("|---|---|---|---|")
    for record in results:
        if "centroids" in record:
            setting = (
                f"{record['centroids']} cells, nprobe {record['nprobe']}"
            )
        else:
            setting = (
                f"{record.get('planes', record.get('hashes'))} x "
                f"{record['bands']} bands"
            )
        cost = record.get("candidate_pairs", "-")
        print(
            f"| {record['study']} | {setting} | {record['recall']} | {cost} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
