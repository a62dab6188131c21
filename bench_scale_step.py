#!/usr/bin/env python3
"""Scale-step benchmark: every batch training-data operator at sf0.1-
equivalent and sf1-equivalent input (10x rows), same seeded generator,
so the TIME RATIO measures how the plan scales — the measured evidence
behind the "would survive 100x" claims (the streaming legs have their
own 21.7M-turn scaling curve in BENCH/BASELINE.md; this covers the
batch/document side the driver tables only provide up to sf0.1).

Interpretation: ratio ~10 = linear (one scan / one bounded shuffle);
minhash/simhash carry an n log n-ish shuffle; exact all-pairs cosine is
inherently O(n^2) COMPUTE (its ratio is expected ~100x in flops) but
auto-blocking must keep per-task memory flat — the wall-clock ratio
stays far below 100 while BLAS soaks the extra flops.

Usage: python bench_scale_step.py   (idle box! ~5-10 min)
Writes BENCH/scale_step.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from quanta_spark.datagen import write_documents_embeddings, write_events  # noqa: E402
from quanta_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# (n_docs, n_vecs, n_events) per scale tag — events run 20x the doc
# count so the events-table legs clear the fixed-overhead floor (at
# 20k/200k all three measured < 1.0x, i.e. pure noise)
SCALES = {"sf0.1eq": (5_000, 2_000, 100_000), "sf1eq": (50_000, 20_000, 1_000_000)}
# per-scale values the op lambdas read; set by main() BEFORE timing
_SCALE_CTX: dict = {}


def _input_dir(tag: str, n_docs: int, n_vecs: int) -> str:
    d = f"/tmp/qs_scale_{tag}_{n_docs}_{n_vecs}"
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_documents_embeddings(d, n_docs, n_vecs, seed=42)
        open(marker, "w").close()
    return d


def _fuzzy_link_docs(docs):
    """fuzzy_link leg: md5-derived 12-hex master keys from doc_id with
    the q141 corruption pattern (1/2/3 substitutions)."""
    from quanta_spark.operators.dedup import fuzzy_link

    m = docs.selectExpr(
        "doc_id AS m_id", "substr(md5(CAST(doc_id AS STRING)), 1, 12) AS key"
    )
    s = m.selectExpr(
        "m_id", "key",
        "CAST(m_id % 12 AS INT) + 1 AS p1",
        "CAST((m_id div 7) % 12 AS INT) + 1 AS p2",
    ).selectExpr(
        "m_id", "key", "p2",
        "concat(substr(key, 1, p1 - 1), 'z', substr(key, p1 + 1, 12 - p1)) AS s1",
    )
    v = s.selectExpr(
        "m_id AS v_id",
        """CASE WHEN m_id % 9 = 0 THEN concat('zzz', substr(key, 4, 9))
               WHEN m_id % 2 = 0 THEN concat(substr(s1, 1, p2 - 1), 'q', substr(s1, p2 + 1, 12 - p2))
               ELSE s1 END AS key""",
    )
    return fuzzy_link(m, v, "m_id", "v_id", "key", max_subs=2)


def _edit_link_docs(docs):
    """edit_link leg: md5-derived 12-hex master keys with the q154
    corruption pattern (1 sub / 1 del / ins+sub / 3-sub negative)."""
    from quanta_spark.operators.dedup import edit_link

    m = docs.selectExpr(
        "doc_id AS m_id", "substr(md5(CAST(doc_id AS STRING)), 1, 12) AS key"
    )
    v = m.selectExpr(
        "m_id", "key", "CAST(m_id % 12 AS INT) + 1 AS p1",
        "CAST((m_id div 7) % 13 AS INT) + 1 AS p2",
    ).selectExpr(
        "m_id", "key", "p1", "p2",
        "concat(substr(key, 1, p1 - 1), 'q', substr(key, p1, 13 - p1)) AS ins",
    ).selectExpr(
        "m_id AS v_id",
        """CASE
             WHEN m_id % 10 = 0 THEN concat('zzz', substr(key, 4, 9))
             WHEN m_id % 3 = 1 THEN concat(substr(key, 1, p1 - 1), 'z', substr(key, p1 + 1, 12 - p1))
             WHEN m_id % 3 = 2 THEN concat(substr(key, 1, p1 - 1), substr(key, p1 + 1, 12 - p1))
             ELSE concat(substr(ins, 1, p2 - 1), 'z', substr(ins, p2 + 1, 13 - p2))
           END AS key""",
    )
    return edit_link(m, v, "m_id", "v_id", "key", max_edits=2)


def _maxsim(emb):
    from quanta_spark.operators.similarity import maxsim_topk, tokenize_vectors

    toks = tokenize_vectors(emb, n_tokens=4)
    qtoks = toks.filter(F.col("vec_id") % 50 == 0).filter(F.col("vec_id") < 2500).select(
        F.col("vec_id").alias("query_id"), "token_idx", "tvec"
    )
    return maxsim_topk(toks, qtoks, k=5)


def _maxsim_blocked(emb):
    from quanta_spark.operators.similarity import maxsim_topk_blocked

    queries = emb.filter(F.col("vec_id") % 50 == 0).filter(F.col("vec_id") < 2500)
    return maxsim_topk_blocked(emb, queries, k=5)


def _script_profile(docs):
    from quanta_spark.operators.text import script_profile

    return script_profile(docs)


def _cdc_snapshot(spark, events_dir):
    from quanta_spark.operators.rollup import latest_aggregate

    ev = spark.read.parquet(os.path.join(events_dir, "events.parquet"))
    return latest_aggregate(ev, ["user_id"], payload_cols=("event_type",))


def _pca_cov(emb, **kw):
    from quanta_spark.operators.clustering import pca_covariance

    return pca_covariance(emb, **kw)


def _triangle_docs(docs):
    """triangle_count leg: the q147 planted graph scaled to n_docs
    vertices (ring + skip + chord families, ~2.2 edges/vertex)."""
    from quanta_spark.operators.graph import triangle_count

    n = _SCALE_CTX["n_docs"]
    base = docs.select((F.col("doc_id") % n).alias("v")).distinct()
    e1 = base.select(F.col("v").alias("src"), ((F.col("v") + 1) % n).alias("dst"))
    e2 = base.select(F.col("v").alias("src"), ((F.col("v") + 2) % n).alias("dst"))
    e3 = base.filter(F.col("v") % 5 == 0).select(
        F.col("v").alias("src"), ((F.col("v") * 3 + 7) % n).alias("dst")
    )
    return triangle_count(e1.unionByName(e2).unionByName(e3))


def _ops():
    from quanta_spark.operators.dedup import (
        dedup_components,
        exact_dedup_groups,
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from quanta_spark.operators.sampling import (
        deterministic_sample,
        token_budget_per_stratum,
    )
    from quanta_spark.operators.dedup import exact_dedup_keep_first
    from quanta_spark.operators.similarity import (
        axis_lsh_cosine_topk,
        exact_allpairs_cosine,
        ivf_cosine_topk,
        pq_adc_topk,
        quantize_int8,
    )
    from quanta_spark.operators.sampling import robust_outliers as _outliers
    from quanta_spark.operators.similarity import pq_rerank_topk as _pq_rerank
    from quanta_spark.operators.text import (
        bm25_scores as _bm25,
        cdc_chunks,
        chunk_documents,
        decontaminate,
        quality_features,
        quality_keep,
        repetition_ratio as _rep_ratio,
        ws_token_count,
    )
    _wtc = ws_token_count
    from quanta_spark.operators.dedup import (
        neardup_index as _nd_index,
        stream_neardup_gate as _nd_gate,
    )
    from quanta_spark.operators.packing import (
        pack_lm_examples as _pack_lm,
        pack_turns as _pack,
    )
    from quanta_spark.operators.sampling import (
        systematic_weighted_sample as _wsample,
    )
    from quanta_spark.operators.sketches import cms_heavy_hitters as _cms_hh
    from quanta_spark.operators.filters import (
        bloom_bitset as _bloom_bits,
        bloom_prefilter as _bloom_pref,
    )
    from quanta_spark.operators.sketches import (
        histogram_counts as _hist_counts,
        histogram_quantiles as _hist_q,
    )
    from quanta_spark.operators.text import bigram_lm_scores as _bigram_lm
    from quanta_spark.operators.sampling import dsir_weights as _dsir
    from quanta_spark.operators.text import (
        duplicate_spans as _dup_spans,
        gopher_quality_filters as _gopher,
    )
    from quanta_spark.operators.dedup import paragraph_dedup as _para_dedup
    from quanta_spark.operators.sampling import (
        shuffle_shards as _shards,
        temperature_mix as _temp_mix,
    )
    from quanta_spark.operators.clustering import (
        kmeans_train_quantized as _kmeans,
        random_project as _rproj,
    )
    from quanta_spark.operators.clustering import class_centroid_accuracy as _cc_acc
    from quanta_spark.operators.dedup import (
        keep_best_survivors as _kbs,
        snapshot_diff as _snap_diff,
    )
    from quanta_spark.operators.dedup import containment_pairs as _containment
    from quanta_spark.operators.graph import pagerank as _pagerank
    from quanta_spark.operators.text import inverted_index as _inv_idx
    from quanta_spark.operators.text import zipf_fit as _zipf
    from quanta_spark.operators.text import pmi_collocations as _pmi
    from quanta_spark.operators.validate import (
        constraint_report as _crep,
        uniqueness_check as _uniq,
        validate_rows as _vrows,
    )

    def bench_set(docs):
        from quanta_spark.operators.dedup import normalized

        return docs.filter(F.col("doc_id") % 50 == 0).select(
            F.array_join(
                F.slice(F.split(normalized(F.col("text")), " "), 1, 12), " "
            ).alias("text")
        )

    def budget_in(docs):
        return docs.select(
            "doc_id", "lang", ws_token_count(F.col("text")).alias("n_tokens")
        )

    from quanta_spark.operators.dedup import semantic_dedup as _sem_dedup
    from quanta_spark.plans.bucketing import (
        cocluster_join as _cojoin,
        write_bucketed as _wbucket,
    )

    def _bucketed_cocluster(docs):
        # layout-write + exchange-free co-located join&agg, timed
        # TOGETHER: the write is the once-per-layout shuffle this
        # design pays so every later conv_id join/groupBy pays none
        spark = _SCALE_CTX["spark"]
        tag = _SCALE_CTX["tag"]
        turns = docs.select(
            (F.col("doc_id") / 10).cast("long").alias("conv_id"),
            (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
            "text",
        )
        convs = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
        lt, rt = f"qs_ss_turns_{tag.replace('.', '_')}", f"qs_ss_convs_{tag.replace('.', '_')}"
        base = f"/tmp/qs_ss_bucketed_{tag}"
        for name, df_, sub in ((lt, turns, "turns"), (rt, convs, "convs")):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            _wbucket(df_, name, n_buckets=32, key="conv_id", path=os.path.join(base, sub))
        return (
            _cojoin(spark, lt, rt, "conv_id")
            .groupBy("conv_id", "n_turns")
            .agg(F.max("turn_idx").alias("max_idx"))
        )

    return {
        "exact_dedup": lambda docs, emb: exact_dedup_groups(docs),
        "quality_features": lambda docs, emb: quality_features(docs),
        "ngram_jaccard": lambda docs, emb: ngram_jaccard_pairs(docs),
        "minhash_xxhash64": lambda docs, emb: minhash_near_dup_pairs(
            docs, threshold=0.8, hasher="xxhash64"
        ),
        "simhash_xxhash64": lambda docs, emb: simhash_near_dup_pairs(
            docs, max_hamming=3, hasher="xxhash64"
        ),
        "dedup_components": lambda docs, emb: dedup_components(
            minhash_near_dup_pairs(docs, threshold=0.8, hasher="xxhash64").select(
                "doc_a", "doc_b"
            )
        ),
        "chunk_documents": lambda docs, emb: chunk_documents(
            docs, chunk_tokens=16, overlap=4
        ),
        "decontaminate": lambda docs, emb: decontaminate(docs, bench_set(docs), n=8),
        "stratified_sample": lambda docs, emb: deterministic_sample(
            docs, {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25}
        ),
        "token_budget_mix": lambda docs, emb: token_budget_per_stratum(
            budget_in(docs), budget=20_000, tokens_col="n_tokens"
        ),
        "lsh_cosine_topk": lambda docs, emb: axis_lsh_cosine_topk(
            emb, emb.filter(F.col("vec_id") % 50 == 0).limit(200), k=5
        ),
        "allpairs_cosine_auto": lambda docs, emb: exact_allpairs_cosine(
            emb, threshold=0.4
        ),
        # n_cells=None -> auto ~sqrt(n) cells: candidate work per query
        # is O(sqrt(n)), vs linear at any static cell count (a static
        # 16 measured 10.3x wall at 10x rows)
        "ivf_cosine_topk": lambda docs, emb: ivf_cosine_topk(
            emb,
            emb.filter(F.col("vec_id") % 50 == 0).limit(200),
            k=5,
            nprobe=4,
        ),
        "quantize_int8": lambda docs, emb: quantize_int8(emb),
        "pq_adc_topk": lambda docs, emb: pq_adc_topk(
            emb, emb.filter(F.col("vec_id") % 50 == 0).limit(200), k=5
        ),
        "cdc_chunks": lambda docs, emb: cdc_chunks(docs),
        "pq_rerank_topk": lambda docs, emb: _pq_rerank(
            emb, emb.filter(F.col("vec_id") % 50 == 0).limit(200), k=5, shortlist=50
        ),
        "bm25_scores": lambda docs, emb: _bm25(
            docs, ["join", "vector", "stream"]
        ),
        "repetition_ratio": lambda docs, emb: _rep_ratio(docs, n=3),
        "robust_outliers": lambda docs, emb: _outliers(
            docs, _wtc(F.col("text")), stratum_col="lang"
        ),
        "pack_turns": lambda docs, emb: _pack(
            docs.select(
                F.concat(F.lit("c"), (F.col("doc_id") / 10).cast("long").cast("string")).alias("conv_id"),
                (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
                "text",
            ),
            budget=64,
        ),
        # threshold precomputed per scale (main() fills _SCALE_CTX
        # before timing) — a docs.count() here would add a full corpus
        # action to the measured wall
        "cms_heavy_hitters": lambda docs, emb: _cms_hh(
            docs.select(
                F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), " ")).alias("tok")
            ),
            "tok",
            threshold=_SCALE_CTX["cms_threshold"],
        ),
        "weighted_sample": lambda docs, emb: _wsample(
            docs, _wtc(F.col("text")), stride=250
        ),
        "bigram_lm_scores": lambda docs, emb: _bigram_lm(docs),
        # NOTE: unlike the stream bench (_run_gate, index untimed), the
        # batch gate leg times build+probe together — it measures the
        # one-shot batch flavor, not the maintained-index flavor
        "neardup_gate_batch": lambda docs, emb: _nd_gate(
            docs.filter(F.col("doc_id") % 50 == 0)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
            .withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))),
            _nd_index(docs),
        ),
        # bitset build (bounded collect) is deliberately INSIDE the
        # timed lambda: build+probe is the one-shot batch flavor
        "bloom_prefilter": lambda docs, emb: _bloom_pref(
            docs.select("doc_id", "lang"),
            "doc_id",
            _bloom_bits(
                docs.filter(F.col("doc_id") % 50 == 0).select("doc_id"), "doc_id"
            ),
        ),
        "quantile_histogram": lambda docs, emb: _hist_q(
            _hist_counts(docs, _wtc(F.col("text")), 0, 4096, 64),
            [5000, 9000, 9900],
            0,
            4096,
            64,
        ),
        # events-table relational shapes (VERDICT r04 ask #7): reuse the
        # REGISTERED query fns verbatim over a 10x seeded events dir
        # (_prepare registers the view from sf_dir) so the measured
        # plan is exactly the gated one
        "retention_cohorts": lambda docs, emb: _SCALE_CTX["q"]["q96_retention_cohorts"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "funnel": lambda docs, emb: _SCALE_CTX["q"]["q97_funnel_conversion"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "interval_join_concurrency": lambda docs, emb: _SCALE_CTX["q"][
            "q98_interval_join"
        ](_SCALE_CTX["spark"], _SCALE_CTX["events_dir"]),
        "training_pipeline": lambda docs, emb: chunk_documents(
            deterministic_sample(
                exact_dedup_keep_first(docs.filter(quality_keep("text"))),
                {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25},
            ),
            chunk_tokens=24,
            overlap=6,
        ),
        # fixed expected cell size -> within-cell pair work linear in
        # the corpus (dedup.DEDUP_CELL_TARGET); zero dup pairs in the
        # synthetic vectors, so this times assignment + scoring
        "semantic_dedup": lambda docs, emb: _sem_dedup(emb, n_cells=None),
        "bucketed_cocluster": lambda docs, emb: _bucketed_cocluster(docs),
        "duplicate_spans": lambda docs, emb: _dup_spans(docs, k=8),
        "gopher_quality": lambda docs, emb: _gopher(
            docs, stopwords=["the", "a", "fast", "slow", "join", "query", "scan", "merge"]
        ),
        "dsir_weights": lambda docs, emb: _dsir(
            docs, target=F.col("text").contains("spark")
        ),
        "paragraph_dedup": lambda docs, emb: _para_dedup(docs),
        "pack_lm_examples": lambda docs, emb: _pack_lm(docs, seq_len=2048),
        "temperature_mix": lambda docs, emb: _temp_mix(
            budget_in(docs), budget=20_000, alpha=0.5
        ),
        "shuffle_shards": lambda docs, emb: _shards(docs, n_shards=64),
        # round-6 additions
        "inverted_index": lambda docs, emb: _inv_idx(docs),
        # one-scan conditional-sum suite + key uniqueness (the
        # referential legs are covered by the events-table joins above)
        "data_quality_suite": lambda docs, emb: _crep(
            [
                _vrows(
                    docs,
                    {
                        "short_text": F.length("text") < 15,
                        "empty_text": F.length("text") == 0,
                        "unknown_lang": ~F.col("lang").isin("en", "de", "fr", "es"),
                    },
                ),
                _uniq(docs, ["doc_id"]),
            ]
        ),
        # iterative: 2 Lloyd rounds x (Arrow partial-sum pass + k*d
        # reduce); wall should scale with rows, not k*d
        "kmeans_train": lambda docs, emb: _kmeans(emb, k=16, n_iter=2),
        "dedup_keep_best": lambda docs, emb: _kbs(
            docs.withColumn("quality", (F.col("doc_id") * 37 % 101).cast("int")),
            minhash_near_dup_pairs(docs, threshold=0.8, hasher="xxhash64").select(
                "doc_a", "doc_b"
            ),
            "quality",
        ),
        "ewma_user_value": lambda docs, emb: _SCALE_CTX["q"]["q122_ewma_user_value"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "reply_latency": lambda docs, emb: _SCALE_CTX["q"][
            "q123_reply_latency_histogram"
        ](_SCALE_CTX["spark"], _SCALE_CTX["events_dir"]),
        "psi_drift": lambda docs, emb: _SCALE_CTX["q"]["q126_psi_drift"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "random_projection": lambda docs, emb: _rproj(emb, in_dim=64, out_dim=16),
        "role_trigrams": lambda docs, emb: _SCALE_CTX["q"]["q128_role_trigrams"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "snapshot_diff": lambda docs, emb: _snap_diff(
            docs,
            docs.filter(F.col("doc_id") % 10 != 3)
            .select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" changed")),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 5 == 0).select(
                    (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
                )
            ),
        ),
        "class_centroid_eval": lambda docs, emb: _cc_acc(
            emb.withColumn("label", (F.col("vec_id") % 10).cast("long"))
        ),
        # round-6 late additions
        "containment_neardup": lambda docs, emb: _containment(
            docs, n=12, max_df=64, min_shared=8
        ),
        # graph grows WITH the corpus (nodes = doc ids): 8 supersteps
        # over 2|V| planted edges — wall should scale with |E|, not
        # iterations^2
        "pagerank": lambda docs, emb: _pagerank(
            docs.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 7 + 3) % _SCALE_CTX["n_docs"]).alias("dst"),
            ).unionByName(
                docs.select(
                    F.col("doc_id").alias("src"),
                    ((F.col("doc_id") * 13 + 5) % _SCALE_CTX["n_docs"]).alias("dst"),
                )
            ),
            iters=8,
        ),
        "zipf_fit": lambda docs, emb: _zipf(docs, max_rank=1000),
        "gapfill_locf": lambda docs, emb: _SCALE_CTX["q"]["q134_gapfill"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "scd2_history": lambda docs, emb: _SCALE_CTX["q"]["q135_scd2_history"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "pmi_collocations": lambda docs, emb: _pmi(docs, min_count=5, top_n=200),
        "fuzzy_link": lambda docs, emb: _fuzzy_link_docs(docs),
        "m4_downsample": lambda docs, emb: _SCALE_CTX["q"]["q143_m4_downsample"](
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "incremental_rollup": lambda docs, emb: _SCALE_CTX["q"][
            "q145_incremental_rollup"
        ](_SCALE_CTX["spark"], _SCALE_CTX["events_dir"]),
        "triangle_count": lambda docs, emb: _triangle_docs(docs),
        "pca_covariance": lambda docs, emb: _pca_cov(emb, in_dim=64, scale=10_000),
        "edit_link": lambda docs, emb: _edit_link_docs(docs),
        "cdc_snapshot": lambda docs, emb: _cdc_snapshot(
            _SCALE_CTX["spark"], _SCALE_CTX["events_dir"]
        ),
        "maxsim_topk": lambda docs, emb: _maxsim(emb),
        "maxsim_blocked": lambda docs, emb: _maxsim_blocked(emb),
        "script_profile": lambda docs, emb: _script_profile(docs),
    }


def main() -> None:
    spark = get_spark(
        app_name="quanta_scale_step", cores=CPUS, shuffle_partitions=CPUS
    )
    from quanta_spark import queries as q

    _SCALE_CTX["q"] = q.QUERY_FNS
    ops = _ops()
    only = os.environ.get("SCALE_STEP_ONLY")
    if only:
        sel = {n.strip() for n in only.split(",")}
        unknown = sel - set(ops)
        if unknown:
            raise SystemExit(f"SCALE_STEP_ONLY names not in ops: {sorted(unknown)}")
        ops = {n: f for n, f in ops.items() if n in sel}
    results: dict[str, dict] = {name: {} for name in ops}
    for tag, (n_docs, n_vecs, n_events) in SCALES.items():
        _SCALE_CTX["cms_threshold"] = max(50, n_docs // 100)
        _SCALE_CTX["spark"] = spark
        _SCALE_CTX["tag"] = tag
        _SCALE_CTX["n_docs"] = n_docs
        d = _input_dir(tag, n_docs, n_vecs)
        ed = f"/tmp/qs_scale_events_{tag}_{n_events}"
        if not os.path.exists(os.path.join(ed, "_DONE")):
            write_events(ed, n_events, seed=42)
            open(os.path.join(ed, "_DONE"), "w").close()
        _SCALE_CTX["events_dir"] = ed
        spark.read.parquet(os.path.join(ed, "events.parquet")).count()  # warm listing
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        docs.count()  # warm file listing before timing
        # one untimed pass so the first TIMED op doesn't absorb
        # codegen + python-worker cold start for the whole scale
        for warm in list(ops)[:2]:
            ops[warm](docs, emb).count()
        for name, fn in ops.items():
            t0 = time.perf_counter()
            out = fn(docs, emb)
            n_rows = out.count()
            dt = time.perf_counter() - t0
            results[name][tag] = {"sec": round(dt, 3), "rows": n_rows}
    for name, r in results.items():
        r["time_ratio_10x"] = round(r["sf1eq"]["sec"] / max(r["sf0.1eq"]["sec"], 1e-9), 2)
    payload = {
        "metric": "batch operator wall-sec at sf0.1-eq vs sf1-eq (10x rows, same generator seed)",
        "cores": CPUS,
        "scales": {
            k: {"n_docs": v[0], "n_vecs": v[1], "n_events": v[2]}
            for k, v in SCALES.items()
        },
        "ops": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    if only and os.path.exists("BENCH/scale_step.json"):
        # partial run: merge the selected ops into the existing table
        with open("BENCH/scale_step.json") as f:
            prev = json.load(f)
        prev.get("ops", {}).update(results)
        prev["scales"] = payload["scales"]
        payload = prev
    with open("BENCH/scale_step.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
