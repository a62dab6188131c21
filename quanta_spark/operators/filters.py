"""Broadcast bloom-filter semi-join prefilter.

At 100 TB the dominant cost of a selective join is shuffling the fact
side to meet a small key set. When that key set fits a few hundred KB
as a bit array, the right plan is: build the bitset from the key side
(one bounded aggregation), broadcast it, and test membership inside
the fact table's scan stage — the fact side never shuffles, and only
rows passing the filter (true matches plus a bounded false-positive
tail) reach the exact join. Spark's AQE runtime row-level bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects this
automatically for plain equi-joins; this operator makes the same
pattern available *explicitly*: against any key expression, reusable
across queries (build once, filter many), and with a portable md5
hash family the DuckDB oracle re-derives bit-for-bit (same two-family
scheme as dedup.py minhash / sketches.py CMS — ``xxhash64`` is the
production default with the identical plan shape).

Layout note: bitset words carry 63 usable bits (bit index =
``pos % 63``), never the sign bit — ``1 << 63`` overflows BIGINT in
DuckDB (raises) while Spark wraps silently, so a 64-bit layout could
never be oracle-checked. One wasted bit per word costs ~1.6% space.

No reference counterpart (quanta's Go engine has no join layer at
all); this is part of the training-data-pipeline surface the target
spec adds on top of the reference semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hard ceiling on the collected bitset: 65_536 words = 512 KiB on the
#: driver / per-executor broadcast. Past this, a bloom prefilter stops
#: being "free to broadcast" and a real join is the better plan.
BLOOM_MAX_WORDS = 65_536

BLOOM_BITS = 1 << 16  # default m: 65_536 bits => ~1041 words, 8 KiB
BLOOM_K = 3  # default hash count

_WORD_BITS = 63  # usable bits per BIGINT word (sign bit unused)


def _bloom_pos(key_str: Column, seed: Column, m_bits: int, hasher: str) -> Column:
    """Hash ``seed``'s bit position for ``key_str`` in ``[0, m_bits)``.

    Both families hash the STRING form of the key prefixed by the seed
    (``"{seed}:{key}"`` for md5, ``xxhash64(seed, key)`` for the
    production family) so the md5 flavor is exactly re-derivable in
    DuckDB via the strpos-over-hex arithmetic (queries._md5int7).
    ``seed`` must be an INT column/literal on BOTH the build and probe
    paths — xxhash64 output depends on the input's physical type."""
    if hasher == "xxhash64":
        return F.pmod(F.xxhash64(seed, key_str), F.lit(m_bits))
    if hasher == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit(":"), key_str)), 1, 7
            ),
            16,
            10,
        ).cast("long")
        return h % m_bits
    raise ValueError(f"unknown hasher {hasher!r} (expected xxhash64|md5)")


def _bit_mask(pos: Column) -> Column:
    """``1 << (pos % 63)`` as a long — via ``pow(2, bit)``, exact for
    bits 0..62 (powers of two carry no mantissa), because shiftleft()
    takes only a literal shift and 63-bit words never touch the sign
    bit (the DuckDB-portability constraint, see module docstring)."""
    return F.pow(F.lit(2.0), (pos % _WORD_BITS).cast("int")).cast("long")


def _check_params(m_bits: int, k: int) -> None:
    n_words = m_bits // _WORD_BITS + 1
    if m_bits < _WORD_BITS or n_words > BLOOM_MAX_WORDS:
        raise ValueError(
            f"m_bits={m_bits} out of range: need {_WORD_BITS} <= m_bits and "
            f"<= {BLOOM_MAX_WORDS} words of {_WORD_BITS} bits "
            f"(= {BLOOM_MAX_WORDS * _WORD_BITS} bits, 512 KiB broadcast budget)"
        )
    if k < 1 or k > 16:
        raise ValueError(f"k={k} out of range (need 1 <= k <= 16)")


def bloom_bitset(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    hasher: str = "xxhash64",
) -> list[int]:
    """Build the bitset from the key side: one distinct + one
    fixed-size aggregation (at most ``m_bits // 63 + 1`` word rows
    regardless of key count — the collect is bounded by construction,
    the bloom twin of similarity.MAX_BROADCAST_QUERIES). NULL keys are
    dropped: NULL never equi-matches, so it must never set bits."""
    _check_params(m_bits, k)
    key = F.col(key_col).cast("string")
    probes = (
        keys.select(key.alias("_key"))
        .where(F.col("_key").isNotNull())
        .distinct()
        .select(
            "_key",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
        )
    )
    # one row per (key, seed) -> position -> (word, mask); fold by word
    pos = _bloom_pos(F.col("_key"), F.col("_i"), m_bits, hasher)
    words = (
        probes.select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / _WORD_BITS).cast("int").alias("_word"),
            _bit_mask(F.col("_pos")).alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    out = [0] * (m_bits // _WORD_BITS + 1)
    for r in words:
        out[r["_word"]] = r["_bits"]
    return out


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    hasher: str = "xxhash64",
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Append a boolean membership column without filtering (for
    audit / FPR-measurement shapes). The bitset rides along as ONE
    broadcast single-row array (shipped once per executor, not
    inlined per-probe into the expression tree); every probe is pure
    JVM codegen: hash -> element_at -> bitwiseAND. NULL keys get
    ``false``."""
    _check_params(m_bits, k)
    if flag_col in df.columns or "_bloom_words" in df.columns:
        raise ValueError(
            f"column {flag_col!r}/_bloom_words already present on the input"
        )
    if len(words) != m_bits // _WORD_BITS + 1:
        raise ValueError(
            f"bitset has {len(words)} words, expected {m_bits // _WORD_BITS + 1} "
            f"for m_bits={m_bits} (was it built with different parameters?)"
        )
    spark = df.sparkSession
    bits = spark.createDataFrame([(words,)], "_bloom_words array<long>")
    key = F.col(key_col).cast("string")
    checks = []
    for s in range(k):
        pos = _bloom_pos(key, F.lit(s), m_bits, hasher)
        word = F.element_at(
            F.col("_bloom_words"), (pos / _WORD_BITS).cast("int") + 1
        )
        checks.append(word.bitwiseAND(_bit_mask(pos)) != 0)
    flag = key.isNotNull() & reduce(lambda a, b: a & b, checks)
    return (
        df.crossJoin(F.broadcast(bits))
        .withColumn(flag_col, flag)
        .drop("_bloom_words")
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Filter ``df`` to rows whose key MIGHT be in the set the bitset
    was built from: no false negatives ever; false positives bounded
    by ~(1 - e^(-k*n/m))^k. The 100 TB shape: the fact side is scanned
    once, the membership test runs inside that scan stage, and no
    shuffle happens before the (optional) exact residual join."""
    out = with_bloom_flag(
        df, key_col, words, m_bits, k, hasher, flag_col="_bloom_flag"
    )
    return out.filter(F.col("_bloom_flag")).drop("_bloom_flag")
