"""Transform stages with status routing — the reference's single
transform operator, rebuilt Spark-first.

The reference processes one frame at a time through an ordered chain
of gRPC plugin stages; each call returns a Status that routes the
frame (reference: internal/pipeline/runner.go:120-200, status enum
api/proto/v1/transformer.proto:79-84):

- OK    -> 0..N output events continue down the chain (fan-out:
           runner.go:90-118)
- DROP  -> frame discarded AND acked (runner.go:161-164)
- ERROR/RETRY -> bounded retry with fixed backoff; on exhaustion the
           reference DROPS + ACKS (data loss, runner.go:147-156,
           README.md:75). We keep the retry policy but route
           exhausted rows to a DEAD-LETTER status instead of silently
           dropping — explicit and observable (SURVEY.md §4.2 custom #4).

Spark realization: a stage is either

- a NATIVE stage — a ``DataFrame -> DataFrame`` function built from
  Column expressions. Catalyst fuses chained native stages into one
  WholeStageCodegen pipeline; this is the fast path and the default.
- a VECTORIZED stage — a ``pandas.DataFrame -> pandas.DataFrame``
  function executed via ``mapInPandas`` over Arrow batches. This is
  the designated replacement for the reference's per-event gRPC hop:
  the process boundary becomes the JVM<->Python Arrow channel, paid
  once per batch instead of once per row. Fan-out (1->N) and drop
  (1->0) fall out of returning more/fewer rows.

Status is carried in a ``_status`` column; the chain filters DROPs
eagerly (so downstream stages never see them — same as the reference
short-circuit at runner.go:186-189) and carries ERROR rows to the end
of the chain, where the sink splits them to the DLQ in the same
commit (single-source-of-truth exactly-once).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS_OK = "OK"
STATUS_DROP = "DROP"
STATUS_ERROR = "ERROR"

STATUS_COL = "_status"
ERROR_COL = "_error"
ATTRS_COL = "_attrs"  # ≙ EventMetadata.attributes (transformer.proto:45-51)


@dataclass(frozen=True)
class RetryPolicy:
    """Mirror of the reference's per-stage policy
    (internal/spec/spec.go:22-27; example pipeline.yml:14-18)."""

    attempts: int = 3
    backoff_ms: int = 200
    timeout_ms: int = 1000  # advisory; Spark task scheduling owns real timeouts


@dataclass(frozen=True)
class Stage:
    """One named transform stage.

    Exactly one of ``native`` / ``batch_fn`` is set:
    - ``native(df) -> df``: Column-expression transform (codegen path).
    - ``batch_fn(pdf) -> pdf``: pandas transform over an Arrow batch;
      may change row count (1->0 drop, 1->N fan-out); may raise to
      signal ERROR (retried per ``retry``).
    """

    name: str
    native: Callable[[DataFrame], DataFrame] | None = None
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None
    retry: RetryPolicy = field(default_factory=RetryPolicy)

    def __post_init__(self) -> None:
        if (self.native is None) == (self.batch_fn is None):
            raise ValueError(f"stage {self.name!r}: exactly one of native/batch_fn")


# ---------------------------------------------------------------------------
# registry — replaces the reference's plugin address book
# (internal/pipeline/compiler.go:53-66 dials one gRPC conn per stage name)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, Stage] = {}


def register(stage: Stage) -> Stage:
    _REGISTRY[stage.name] = stage
    return stage


def get_stage(name: str) -> Stage:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


# ---------------------------------------------------------------------------
# chain application
# ---------------------------------------------------------------------------


def _ensure_status_cols(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    if STATUS_COL not in cols:
        df = df.withColumn(STATUS_COL, F.lit(STATUS_OK))
    if ERROR_COL not in cols:
        df = df.withColumn(ERROR_COL, F.lit(None).cast("string"))
    if ATTRS_COL not in cols:
        df = df.withColumn(
            ATTRS_COL, F.create_map().cast("map<string,string>")
        )
    return df


def _vectorized_runner(
    stage: Stage, out_schema_ddl: str
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Wrap a pandas batch_fn with the reference's retry loop
    (runner.go:135-176): fixed backoff, bounded attempts, then route
    the whole failed batch to ERROR (dead-letter) instead of raising
    — the batch's *other* data must still commit."""
    fn = stage.batch_fn
    policy = stage.retry
    name = stage.name

    def runner(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            err: str | None = None
            out: pd.DataFrame | None = None
            for attempt in range(policy.attempts + 1):
                try:
                    out = fn(pdf.copy())
                    err = None
                    break
                except Exception as exc:  # noqa: BLE001 — stage errors are data
                    err = f"{type(exc).__name__}: {exc}"
                    if attempt < policy.attempts:
                        time.sleep(policy.backoff_ms / 1000.0)
            if err is not None:
                bad = pdf.copy()
                bad[STATUS_COL] = STATUS_ERROR
                bad[ERROR_COL] = f"stage={name}: {err}"
                yield bad
                continue
            assert out is not None
            if STATUS_COL not in out.columns:
                out[STATUS_COL] = STATUS_OK
            if ERROR_COL not in out.columns:
                out[ERROR_COL] = None
            yield out

    return runner


def apply_stage(df: DataFrame, stage: Stage) -> DataFrame:
    """Apply one stage; input/output schema is identical (the chain's
    frame envelope). DROP rows are filtered eagerly; ERROR rows
    bypass the stage (reference short-circuits dropped frames,
    runner.go:186-189)."""
    df = _ensure_status_cols(df)
    if stage.native is not None:
        ok = df.filter(F.col(STATUS_COL) == STATUS_OK)
        passthru = df.filter(F.col(STATUS_COL) == STATUS_ERROR)
        out = _ensure_status_cols(stage.native(ok)).select(df.columns)
        return out.filter(F.col(STATUS_COL) != STATUS_DROP).unionByName(passthru)
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    ok = df.filter(F.col(STATUS_COL) == STATUS_OK)
    passthru = df.filter(F.col(STATUS_COL) == STATUS_ERROR)
    out = ok.mapInPandas(_vectorized_runner(stage, ddl), schema=df.schema)
    return out.filter(F.col(STATUS_COL) != STATUS_DROP).unionByName(passthru)


def apply_chain(df: DataFrame, stages: list[Stage | str]) -> DataFrame:
    """Sequential stage composition — YAML order in the reference
    (compiler.go:53-66, design_doc.md:81). Returns a DataFrame whose
    ``_status`` is OK or ERROR; the sink splits ERROR to the DLQ."""
    df = _ensure_status_cols(df)
    for s in stages:
        stage = get_stage(s) if isinstance(s, str) else s
        df = apply_stage(df, stage)
    return df


def split_ok_dlq(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a chained result into (ok, dead-letter)."""
    df = _ensure_status_cols(df)
    ok = df.filter(F.col(STATUS_COL) == STATUS_OK)
    dlq = df.filter(F.col(STATUS_COL) == STATUS_ERROR)
    return ok, dlq


# ---------------------------------------------------------------------------
# built-in stages — incl. the reference's example plugin
# ---------------------------------------------------------------------------


def native_map(name: str, **col_exprs: Column) -> Stage:
    """1->1 map stage from Column expressions (codegen fast path)."""

    def fn(df: DataFrame) -> DataFrame:
        for c, e in col_exprs.items():
            df = df.withColumn(c, e)
        return df

    return Stage(name=name, native=fn)


def native_filter(name: str, predicate: Column) -> Stage:
    """Filter stage — Status_DROP for rows failing the predicate
    (reference: runner.go:161-164; dropped rows still commit because
    unwritten rows advance the offset log)."""

    def fn(df: DataFrame) -> DataFrame:
        return df.filter(predicate)

    return Stage(name=name, native=fn)


def uppercase_annotate_stage() -> Stage:
    """The reference's example plugin, as a native stage: uppercase the
    text and record ``transformed_by`` in attributes
    (examples/transformers/uppercase/main.go:61-97 — non-JSON branch
    uppercases; attributes set at :88-91)."""

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumn("text", F.upper(F.col("text"))).withColumn(
            ATTRS_COL,
            F.map_concat(
                F.col(ATTRS_COL),
                F.create_map(F.lit("transformed_by"), F.lit("uppercase")),
            ),
        )

    return Stage(name="uppercase", native=fn)


register(uppercase_annotate_stage())
