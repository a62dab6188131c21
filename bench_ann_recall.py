#!/usr/bin/env python3
"""ANN quality benchmark: recall@10 vs exact brute force for each of
the three approximate paths (LSH buckets, IVF-Flat, PQ+ADC) on the
driver's embeddings table, plus candidate-scan fractions — the
accuracy half of the speed/accuracy tradeoff (speed is in
BENCH/scale_step.json).

Writes BENCH/ann_recall.json and prints one JSON line.
Usage: python bench_ann_recall.py   (~1 min)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from quanta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 10


def main() -> None:
    from quanta_spark.operators.similarity import (
        axis_lsh_cosine_topk,
        brute_force_cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
        pq_adc_topk,
    )

    spark = get_spark(app_name="quanta_ann_recall", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    ).cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 10 == 0).limit(50)

    def topk_sets(df) -> dict[int, set[int]]:
        out: dict[int, set[int]] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    truth = topk_sets(brute_force_cosine_topk(emb, queries, k=K))

    def recall_row(df, scan_fraction) -> dict:
        got = topk_sets(df)
        recalls = [
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items() if t
        ]
        return {
            "recall_at_10": round(sum(recalls) / len(recalls), 4),
            "queries": len(recalls),
            "approx_scan_fraction": scan_fraction,
        }

    paths = {
        # (df, candidate fraction of corpus scanned per query)
        "lsh_hyperplane_8bit": (
            lsh_cosine_topk(emb, queries, k=K, n_bits=8), 1 / 256
        ),
        "lsh_axis_4bit": (
            axis_lsh_cosine_topk(emb, queries, k=K, n_bits=4), 1 / 16
        ),
        "ivf_auto_nprobe4": (ivf_cosine_topk(emb, queries, k=K, nprobe=4), None),
        "pq_adc_8x16": (pq_adc_topk(emb, queries, k=K), 1.0),
    }
    results: dict[str, dict] = {}
    for name, (df, frac) in paths.items():
        results[name] = recall_row(df, frac)
    # IVF scan fraction = nprobe / auto cells
    from quanta_spark.operators.similarity import auto_n_cells

    results["ivf_auto_nprobe4"]["approx_scan_fraction"] = round(
        min(1.0, 4 / auto_n_cells(n)), 4
    )
    # two-stage retrieval: ADC shortlist (top-50 codes-only) -> exact
    # cosine rerank -> top-10. The standard PQ deployment shape: the
    # raw-vector fetch touches only the 50-candidate shortlist. The
    # rerank reuses the LIBRARY's top-k window so tie-break rules can
    # never drift from the operators being measured.
    from quanta_spark.operators.similarity import _cosine_bp, _topk_window

    shortlist = pq_adc_topk(emb, queries, k=50).select("query_id", "vec_id")
    q_emb = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    rer = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(q_emb), "query_id")
        .select("query_id", "vec_id", _cosine_bp("embedding", "qe").alias("sim_bp"))
    )
    results["pq_adc_top50_exact_rerank"] = recall_row(
        _topk_window(rer, K), round(50 / n, 4)
    )

    for name, r in results.items():
        frac = r["approx_scan_fraction"]
        if frac and frac < 1.0:
            # recall / scan-fraction: how much better than a random
            # same-sized candidate subset the index ranks. The driver's
            # synthetic embeddings have no cluster structure, so
            # absolute recall tracks the scan fraction — lift is the
            # honest quality signal here; on clustered real corpora
            # absolute recall rises with structure.
            r["lift_vs_random_subset"] = round(r["recall_at_10"] / frac, 2)
    payload = {
        "metric": f"ANN recall@{K} vs exact brute force (cosine), {n}-vector corpus",
        "corpus": n,
        "paths": results,
        "note": (
            "pq scans 100% of CODES (8 bytes/vector, 32x smaller than raw) — "
            "its saving is memory-bound, not candidate-bound; lsh/ivf shrink "
            "the candidate set itself. Synthetic embeddings are unclustered, "
            "so judge lift_vs_random_subset, not absolute recall."
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ann_recall.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
