"""Shared fixtures: one SparkSession per test session, small transcript
fixtures generated deterministically (seed=42) into tmp dirs."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quanta_spark.datagen import GenSpec, write_transcripts
from quanta_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="quanta_tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_spec() -> GenSpec:
    return GenSpec(n_convs=60, mean_turns=8, seed=42)


@pytest.fixture(scope="session")
def transcripts_dir(small_spec):
    d = tempfile.mkdtemp(prefix="qs_transcripts_")
    write_transcripts(d, small_spec, n_files=8)
    baseline = sorted(os.listdir(d))
    yield d
    # tripwire: this dir is SESSION-scoped and read-only by contract.
    # A test that appends files here (e.g. a heartbeat) silently adds
    # rows to every later test that streams it — copy to a private dir
    # (tmp_workdir) first. Caught live in r6: dq_monitor's heartbeat
    # broke the fanout-sink count two files later.
    polluted = sorted(os.listdir(d))
    shutil.rmtree(d, ignore_errors=True)
    assert polluted == baseline, (
        f"session-scoped transcripts_dir was mutated by a test: "
        f"added {sorted(set(polluted) - set(baseline))}, "
        f"removed {sorted(set(baseline) - set(polluted))}"
    )


@pytest.fixture()
def tmp_workdir():
    d = tempfile.mkdtemp(prefix="qs_work_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
