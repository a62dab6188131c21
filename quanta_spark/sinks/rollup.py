"""Streaming continuous-aggregate sink: fold every micro-batch into a
persisted rollup, exactly once, without ever rescanning raw history.

``foreachBatch`` + :mod:`quanta_spark.operators.rollup`: each batch is
reduced to a delta rollup (O(batch rows) work, map-side partials) and
merged into the previous generation's table (O(groups) work). Because
the merge is associative/commutative and keyed only by the group
columns, this sink needs NO watermark and never drops late rows — a
turn arriving a month late simply folds into its group, which is the
semantics a corpus-statistics rollup wants (contrast the windowed
operators, where lateness must be bounded to retire state).

Exactly-once under replay (Structured Streaming re-runs the last
uncommitted batch after a crash) comes from a generation protocol, the
same shape as IdempotentSink.compact()'s manifest commit:

1. write the merged state to ``gen=<batch_id>/`` (invisible — readers
   only follow the marker);
2. atomically rename ``_latest.json.tmp -> _latest.json`` recording
   the folded batch id — THE commit point;
3. delete generations older than ``keep_gens`` (idempotent cleanup).

A replayed batch id <= the marker is skipped entirely; a crash between
1 and 2 re-runs the fold from the UNMOVED previous marker and
overwrites the orphan directory. Either way every batch folds exactly
once.

Scale: the rollup table is O(groups), not O(rows) — per-batch cost is
one aggregate of the delta plus one O(groups) join-rewrite (with the
generation written bucketed on the keys the join side of the next fold
would be exchange-free too; at this table size a plain parquet rewrite
is already cheap). Raw history is never touched after its batch folds.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from quanta_spark.operators.rollup import rollup_aggregate, rollup_merge


@dataclass
class RollupSink:
    """foreachBatch callable maintaining a continuous rollup at
    ``base_dir`` grouped by ``keys`` over ``value_col`` (and an
    optional HLL of ``distinct_col``)."""

    base_dir: str
    keys: tuple[str, ...] = ("role",)
    value_col: str = "value"
    distinct_col: str | None = None
    lg_k: int = 12
    #: (lo, hi, n_bins) — maintain a mergeable per-group histogram so
    #: rollup_quantiles() answers live percentiles off the rollup
    hist: tuple[int, int, int] | None = None
    keep_gens: int = 2
    batches_folded: list[int] = field(default_factory=list)
    batches_skipped: list[int] = field(default_factory=list)

    @property
    def _marker(self) -> str:
        return os.path.join(self.base_dir, "_latest.json")

    def latest_gen(self) -> int | None:
        try:
            with open(self._marker) as f:
                return int(json.load(f)["gen"])
        except (FileNotFoundError, KeyError, ValueError):
            return None

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.base_dir, f"gen={gen}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        latest = self.latest_gen()
        if latest is not None and batch_id <= latest:
            # replay of an already-folded batch: exactly-once no-op
            self.batches_skipped.append(batch_id)
            return
        spark = batch_df.sparkSession
        delta = rollup_aggregate(
            batch_df,
            list(self.keys),
            self.value_col,
            distinct_col=self.distinct_col,
            lg_k=self.lg_k,
            hist=self.hist,
        )
        if latest is not None:
            prev = spark.read.parquet(self._gen_dir(latest))
            state = rollup_merge(prev, delta)
        else:
            state = delta
        state.write.mode("overwrite").parquet(self._gen_dir(batch_id))
        tmp = self._marker + ".tmp"
        os.makedirs(self.base_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"gen": batch_id}, f)
        os.replace(tmp, self._marker)  # commit point (atomic rename)
        self.batches_folded.append(batch_id)
        kept = {batch_id, latest} if latest is not None else {batch_id}
        for name in os.listdir(self.base_dir):
            if not name.startswith("gen="):
                continue
            g = int(name.split("=", 1)[1])
            if g not in kept and g <= batch_id - self.keep_gens:
                shutil.rmtree(os.path.join(self.base_dir, name), ignore_errors=True)

    def read_rollup(self, spark: SparkSession) -> DataFrame:
        """The committed rollup (latest published generation)."""
        gen = self.latest_gen()
        if gen is None:
            raise FileNotFoundError(f"no committed rollup under {self.base_dir}")
        return spark.read.parquet(self._gen_dir(gen))
