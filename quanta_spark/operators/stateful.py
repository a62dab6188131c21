"""Stateful operators: per-conversation turn-ordering enforcement and
the user↔assistant stream-stream join.

Reference semantics being generalized: the reference guarantees
per-partition total order by construction — one synchronous goroutine
per Kafka partition claim (driver_sarama.go:114-214, runner bound at
runner.go:206), so frames of a conversation (keyed by conv_id,
frame.proto:36) are processed strictly in produce order. Spark makes
no cross-batch row-order promise, so the target requires an explicit
operator: buffer out-of-order turns per conversation and emit them in
contiguous ``turn_idx`` order (BASELINE.json north_star:
'per-conversation turn-ordering enforcement').

Realization: ``applyInPandasWithState`` keyed by ``conv_id``
(Arrow-batched; state in the RocksDB state store). State is
(next expected idx, buffered pending turns). Each trigger:

1. append the batch's rows to the buffer (dropping stale rows with
   ``turn_idx`` < next — already emitted, i.e. replays/duplicates);
2. emit the contiguous prefix starting at next;
3. set an event-time timeout just past the current watermark; when it
   fires with no new data, flush whatever is buffered IN ORDER
   (gaps are declared permanently missing — same availability-over-
   completeness stance as the reference's drop-on-retry-exhaustion,
   runner.go:147-156, but explicit: flushed rows are marked).

State is bounded: the watermark-timeout flush guarantees no buffer
outlives the watermark horizon, so state size is O(convs active within
the horizon) — the property that lets this run at 10^12 turns.

Model assumption (holds for transcripts by construction): event time
``ts`` is non-decreasing in ``turn_idx`` within a conversation; the
flush rule "ts <= watermark => missing predecessors are permanently
late" relies on it.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output: transcript columns + emission diagnostics
ORDERED_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("flushed", T.BooleanType(), False),
    ]
)

# state: next expected idx + parallel arrays of buffered turns
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_idx", T.IntegerType(), False),
        T.StructField("buf_idx", T.ArrayType(T.IntegerType()), True),
        T.StructField("buf_role", T.ArrayType(T.StringType()), True),
        T.StructField("buf_text", T.ArrayType(T.StringType()), True),
        T.StructField("buf_tool", T.ArrayType(T.StringType()), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType()), True),  # epoch micros
    ]
)

_US = 1_000_000


def _rows_to_pdf(conv_id: str, rows: list[tuple], flushed: bool) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pd.array([r[0] for r in rows], dtype="int32"),
            "role": [r[1] for r in rows],
            "text": [r[2] for r in rows],
            "tool": [r[3] for r in rows],
            "ts": pd.to_datetime([r[4] for r in rows], unit="us"),
            "flushed": flushed,
        }
    )


def _order_fn(
    key: Tuple[str], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]

    if state.exists:
        next_idx, b_idx, b_role, b_text, b_tool, b_ts = state.get
        buf: dict[int, tuple] = {
            i: (i, r, x, tl, t)
            for i, r, x, tl, t in zip(b_idx, b_role, b_text, b_tool, b_ts)
        }
    else:
        next_idx, buf = 0, {}

    if state.hasTimedOut:
        # Evict exactly the turns the watermark has passed: a flushed
        # row's missing predecessor has an even older ts, so Spark's
        # late-data filter would drop it anyway — the gap is provably
        # permanent. Turns with ts still ahead of the watermark stay
        # buffered (flushing them would orphan an in-flight
        # predecessor). Explicit availability-over-completeness, the
        # reference's stance on retry exhaustion (runner.go:147-156),
        # but watermark-correct.
        wm_us = state.getCurrentWatermarkMs() * 1000
        ripe = sorted(v for v in buf.values() if v[4] <= wm_us)
        unblocked: list[tuple] = []
        if ripe:
            for v in ripe:
                del buf[v[0]]
            next_idx = max(next_idx, ripe[-1][0] + 1)
            # drop now-stale survivors (idx below the new frontier)
            buf = {i: v for i, v in buf.items() if i >= next_idx}
            # the flush may unblock buffered successors — emit them as
            # normal (nothing was skipped past them)
            while next_idx in buf:
                unblocked.append(buf.pop(next_idx))
                next_idx += 1
        if buf or ripe:
            state.update(
                (
                    next_idx,
                    [v[0] for v in buf.values()],
                    [v[1] for v in buf.values()],
                    [v[2] for v in buf.values()],
                    [v[3] for v in buf.values()],
                    [v[4] for v in buf.values()],
                )
            )
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(wm + 1 if wm > 0 else 1)
        else:
            state.remove()
        if ripe:
            yield _rows_to_pdf(conv_id, ripe, flushed=True)
        if unblocked:
            yield _rows_to_pdf(conv_id, unblocked, flushed=False)
        return

    for pdf in pdf_iter:
        for r in pdf.itertuples(index=False):
            idx = int(r.turn_idx)
            if idx < next_idx:
                continue  # stale duplicate / already emitted
            buf[idx] = (
                idx,
                r.role,
                r.text,
                r.tool if isinstance(r.tool, str) else None,
                int(pd.Timestamp(r.ts).value // 1000),
            )

    emit: list[tuple] = []
    while next_idx in buf:
        emit.append(buf.pop(next_idx))
        next_idx += 1

    state.update(
        (
            next_idx,
            [v[0] for v in buf.values()],
            [v[1] for v in buf.values()],
            [v[2] for v in buf.values()],
            [v[3] for v in buf.values()],
            [v[4] for v in buf.values()],
        )
    )
    # schedule a flush just past the watermark so stragglers can't pin
    # state forever (bounded state at 10^12-turn scale)
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(wm + 1 if wm > 0 else 1)

    if emit:
        yield _rows_to_pdf(conv_id, emit, flushed=False)


def enforce_turn_order(
    df: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming turn-order enforcement keyed by ``conv_id``.

    The batch-mode oracle for this operator is simply
    ``ORDER BY conv_id, turn_idx`` with duplicates dropped — streaming
    output must equal it as a set, with per-conversation emission order
    contiguous in ``turn_idx``.
    """
    if not df.isStreaming:
        return (
            df.dropDuplicates(["conv_id", "turn_idx"])
            .withColumn("flushed", F.lit(False))
            .select([f.name for f in ORDERED_OUTPUT_SCHEMA.fields])
        )
    return (
        df.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _order_fn,
            outputStructType=ORDERED_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def join_user_replies(
    df: DataFrame,
    watermark: str = "1 hour",
    max_reply_delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream stateful join: each user turn joined to its direct
    reply (assistant or tool turn at ``turn_idx + 1`` in the same
    conversation, within ``max_reply_delay`` event time).

    Both sides carry watermarks + a time-range predicate, so Spark's
    join state store evicts rows once the watermark passes — bounded
    state (north_rule: 'stateful stream-stream joins ... on conv_id').
    The join shuffles both sides on conv_id; AQE/salting handles
    mega-conversation skew (see operators/skew.py).

    Works identically on batch DataFrames (the oracle path).
    """
    users = df.filter(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("text").alias("user_text"),
        F.col("ts").alias("user_ts"),
    )
    replies = df.filter(F.col("role").isin("assistant", "tool")).select(
        F.col("conv_id").alias("r_conv_id"),
        F.col("turn_idx").alias("reply_turn_idx"),
        F.col("role").alias("reply_role"),
        F.col("text").alias("reply_text"),
        F.col("tool").alias("reply_tool"),
        F.col("ts").alias("reply_ts"),
    )
    if df.isStreaming:
        users = users.withWatermark("user_ts", watermark)
        replies = replies.withWatermark("reply_ts", watermark)
    cond = (
        (users.conv_id == replies.r_conv_id)
        & (replies.reply_turn_idx == users.user_turn_idx + 1)
        & (replies.reply_ts >= users.user_ts)
        & (replies.reply_ts <= users.user_ts + F.expr(f"INTERVAL {max_reply_delay}"))
    )
    out = users.join(replies, cond, "inner")
    return out.select(
        "conv_id",
        "user_turn_idx",
        "user_text",
        "user_ts",
        "reply_turn_idx",
        "reply_role",
        "reply_text",
        "reply_tool",
        "reply_ts",
        (
            # via micros: NTZ-safe (cast TIMESTAMP_NTZ -> DOUBLE is
            # disallowed) and bit-identical to DuckDB's epoch() double
            F.unix_micros(F.col("reply_ts").cast("timestamp")) / 1_000_000.0
            - F.unix_micros(F.col("user_ts").cast("timestamp")) / 1_000_000.0
        ).alias("reply_latency_s"),
    )
