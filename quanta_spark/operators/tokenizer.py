"""Distributed BPE tokenizer training.

The last missing piece of a training-data pipeline: the tokenizer
itself is trained ON the corpus (byte-pair encoding — merge the most
frequent adjacent symbol pair, repeat). The scale trick that makes
this a vocab-sized problem instead of a corpus-sized one: BPE's
statistics depend only on the WORD FREQUENCY table, so one corpus
pass builds (word, count) and every merge iteration then shuffles
vocabulary-sized data (10^7-10^8 rows at web scale, not 10^12).

Iteration = one aggregation (pair counts, weighted by word count),
one O(1)-row driver action (the argmax pair — same bounded-action
pattern as dedup_components' convergence checksum), one pure-codegen
merge application. Cross-engine determinism: symbols are kept as a
'<s1><s2>...' wrapped string, so applying a merge IS non-overlapping
left-to-right string replace — identical semantics in Spark
(``F.replace``), DuckDB and Python — and greedy BPE ("aaa" + (a,a)
-> ["aa","a"]) falls out of the scan order. '<'/'>' cannot collide:
symbols start as [a-z0-9] characters of normalized words and merges
only concatenate them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quanta_spark.operators.dedup import normalized

_SYM_RE = "<([^>]*)>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the normalized corpus — the one corpus-sized
    pass; everything after is vocabulary-sized."""
    return (
        df.select(
            F.explode(F.split(normalized(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(cur: DataFrame) -> DataFrame:
    arr = F.regexp_extract_all(F.col("syms"), F.lit(_SYM_RE), 1)
    sized = cur.select(arr.alias("_a"), "n").filter(F.size("_a") >= 2)
    pairs = sized.select(
        F.explode(
            F.zip_with(
                F.slice("_a", 1, F.size("_a") - 1),
                F.slice(F.col("_a"), 2, F.size("_a") - 1),
                lambda x, y: F.struct(x.alias("l"), y.alias("r")),
            )
        ).alias("p"),
        "n",
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("n").alias("cnt"))


def bpe_train(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the merge
    table (step, left_sym, right_sym, pair_count) — the artifact a
    tokenizer ships. Deterministic: pair argmax breaks ties by
    (count desc, left asc, right asc); counts are integers.

    Each iteration materializes the merged symbol table (cache +
    count) so lineage doesn't stack n_merges replace() layers, the
    same round-truncation discipline as dedup_components."""
    spark = df.sparkSession
    cur = word_counts(df, text_col).select(
        F.regexp_replace("w", "(.)", "<$1>").alias("syms"), "n"
    )
    cur = cur.cache()
    cur.count()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(n_merges):
            best = (
                _pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .first()
            )  # O(1)-row driver action per round
            if best is None:
                break
            left, right, cnt = best["l"], best["r"], int(best["cnt"])
            merges.append((step, left, right, cnt))
            nxt = cur.withColumn(
                "syms",
                F.replace(
                    "syms",
                    F.lit(f"<{left}><{right}>"),
                    F.lit(f"<{left}{right}>"),
                ),
            ).cache()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count long"
    )


def bpe_encode(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a trained merge list to a corpus: per-word symbol strings
    run through the merges IN ORDER (each a pure-codegen replace) —
    the tokenize step, fully distributed, no Python. Returns the input
    plus ``tokens`` (array of symbols) and ``n_tokens``."""
    out = df.withColumn(
        "_syms",
        F.array_join(
            F.transform(
                F.split(normalized(F.col(text_col)), " "),
                lambda w: F.regexp_replace(w, "(.)", "<$1>"),
            ),
            "|",
        ),
    )
    for left, right in merges:
        out = out.withColumn(
            "_syms",
            F.replace(
                "_syms", F.lit(f"<{left}><{right}>"), F.lit(f"<{left}{right}>")
            ),
        )
    toks = F.regexp_extract_all(F.col("_syms"), F.lit(_SYM_RE), 1)
    return out.withColumn("tokens", toks).withColumn(
        "n_tokens", F.size("tokens")
    ).drop("_syms")
