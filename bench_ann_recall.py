#!/usr/bin/env python3
"""ANN quality benchmark: recall@10 vs exact brute force for each of
the approximate paths (LSH buckets, IVF-Flat, PQ+ADC, PQ->exact
rerank) on TWO corpora:

- the driver's embeddings table (isotropic — no cluster structure, so
  absolute recall tracks the scan fraction and only lift-vs-random is
  judged);
- a deterministic mixture-of-Gaussians corpus
  (datagen.generate_clustered_embeddings) with the modal structure real
  embeddings have — here ABSOLUTE recall is the quality bar: IVF must
  reach recall@10 >= 0.8 at <= 20% scan fraction.

Writes BENCH/ann_recall.json and prints one JSON line.
Usage: python bench_ann_recall.py   (~2 min)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from quanta_spark.operators.similarity import DEFAULT_NPROBE  # noqa: E402
from quanta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 10


def measure(spark, emb, n: int) -> dict[str, dict]:
    from quanta_spark.operators.similarity import (
        auto_n_cells,
        axis_lsh_cosine_topk,
        brute_force_cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
        pq_adc_topk,
        pq_rerank_topk,
    )

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

    shortlist = min(50, n - 1)
    paths = {
        # (df, candidate fraction of corpus scanned per query)
        "lsh_hyperplane_8bit": (
            lsh_cosine_topk(emb, queries, k=K, n_bits=8, extra_probes=0), 1 / 256
        ),
        # the tuned default (VERDICT r04 ask #8): +4 nearest-margin
        # bit-flip probes per query
        "lsh_hyperplane_8bit_mp4": (
            lsh_cosine_topk(emb, queries, k=K, n_bits=8, extra_probes=4), 5 / 256
        ),
        "lsh_axis_4bit": (
            axis_lsh_cosine_topk(emb, queries, k=K, n_bits=4), 1 / 16
        ),
        "ivf_auto_nprobe": (
            ivf_cosine_topk(emb, queries, k=K),
            round(min(1.0, DEFAULT_NPROBE / auto_n_cells(n)), 4),
        ),
        # trained coarse quantizer (spherical k-means, 3 Lloyd rounds)
        # vs the seed stand-in above — same cells, same nprobe, so any
        # recall delta is purely centroid quality
        "ivf_trained_3it": (
            ivf_cosine_topk(emb, queries, k=K, train_iters=3),
            round(min(1.0, DEFAULT_NPROBE / auto_n_cells(n)), 4),
        ),
        "pq_adc_8x16": (pq_adc_topk(emb, queries, k=K), 1.0),
        # trained per-subspace k-means codebooks vs the seed stand-in
        # above — same codes-only scan, so any delta is codebook quality
        "pq_adc_trained_3it": (
            pq_adc_topk(emb, queries, k=K, train_iters=3), 1.0
        ),
        # two-stage retrieval: ADC shortlist (codes-only) -> exact
        # cosine rerank -> top-10; raw-vector fetch touches only the
        # shortlist (the q66 gate operator).
        "pq_rerank_top50": (
            pq_rerank_topk(emb, queries, k=K, shortlist=shortlist),
            round(shortlist / n, 4),
        ),
        # constant-fraction shortlist: at a fixed top-50 the fetch
        # fraction (and with it recall) falls as the corpus grows —
        # sizing the shortlist as a corpus percentage is the
        # scale-stable deployment shape.
        "pq_rerank_5pct": (
            pq_rerank_topk(emb, queries, k=K, shortlist=max(shortlist, n // 20)),
            round(max(shortlist, n // 20) / n, 4),
        ),
        "pq_rerank_5pct_trained_3it": (
            pq_rerank_topk(
                emb, queries, k=K, shortlist=max(shortlist, n // 20), train_iters=3
            ),
            round(max(shortlist, n // 20) / n, 4),
        ),
    }
    results: dict[str, dict] = {}
    for name, (df, frac) in paths.items():
        results[name] = recall_row(df, frac)

    for r in results.values():
        frac = r["approx_scan_fraction"]
        if frac and frac < 1.0:
            # recall / scan-fraction: how much better than a random
            # same-sized candidate subset the index ranks.
            r["lift_vs_random_subset"] = round(r["recall_at_10"] / frac, 2)
    return results


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    from quanta_spark.datagen import generate_clustered_embeddings

    spark = get_spark(app_name="quanta_ann_recall", cores=8, shuffle_partitions=8)

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    ).cache()
    n = emb.count()
    unclustered = measure(spark, emb, n)

    # clustered corpus: fixed 20k vectors (the driver's sf0.01 table is
    # only ~500 — too small for IVF scan fractions to mean anything),
    # written to parquet so the Spark path is identical
    # (scan -> operator), not a driver-created DataFrame.
    n_c = max(n, 20_000)
    mog = generate_clustered_embeddings(n_c, seed=7)
    d = tempfile.mkdtemp(prefix="qs_mog_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(mog["vec_id"], pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in mog["embedding"]],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        os.path.join(d, "emb.parquet"),
    )
    emb_c = spark.read.parquet(os.path.join(d, "emb.parquet")).cache()
    clustered = measure(spark, emb_c, n_c)

    # hyperplane-LSH frontier on the clustered corpus (VERDICT r04 ask
    # #8): n_bits x multi-probe sweep so the default is a measured
    # choice, not a guess
    from quanta_spark.operators.similarity import (
        brute_force_cosine_topk,
        lsh_cosine_topk,
    )

    sweep_queries = emb_c.filter(F.col("vec_id") % 10 == 0).limit(50)
    truth_rows: dict[int, set[int]] = {}
    for r in brute_force_cosine_topk(emb_c, sweep_queries, k=K).collect():
        truth_rows.setdefault(r["query_id"], set()).add(r["vec_id"])
    sweep: dict[str, dict] = {}
    for n_bits in (6, 8, 10):
        for probes in (0, 2, 4, 8):
            got: dict[int, set[int]] = {}
            df = lsh_cosine_topk(
                emb_c, sweep_queries, k=K, n_bits=n_bits, extra_probes=probes
            )
            for r in df.collect():
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            recalls = [
                len(got.get(q, set()) & t) / len(t) for q, t in truth_rows.items() if t
            ]
            frac = (1 + min(probes, n_bits)) / (1 << n_bits)
            rec = round(sum(recalls) / len(recalls), 4)
            sweep[f"bits{n_bits}_mp{probes}"] = {
                "recall_at_10": rec,
                "approx_scan_fraction": round(frac, 5),
                "lift_vs_random_subset": round(rec / frac, 1),
            }

    ivf = clustered["ivf_auto_nprobe"]
    payload = {
        "metric": f"ANN recall@{K} vs exact brute force (cosine), {n}-vector corpus",
        "corpus": n,
        "unclustered_driver_testdata": unclustered,
        "clustered_mog": clustered,
        "lsh_sweep_clustered": sweep,
        "ivf_clustered_bar": {
            "target": "recall_at_10 >= 0.8 at scan fraction <= 0.2",
            "met": bool(
                ivf["recall_at_10"] >= 0.8 and ivf["approx_scan_fraction"] <= 0.2
            ),
        },
        "note": (
            "pq scans 100% of CODES (8 bytes/vector, 32x smaller than raw) — "
            "its saving is memory-bound, not candidate-bound; lsh/ivf shrink "
            "the candidate set itself. The driver's synthetic embeddings are "
            "unclustered (judge lift_vs_random_subset there); the clustered "
            "MoG section is where absolute recall is meaningful and the IVF "
            "defaults are tuned."
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ann_recall.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
