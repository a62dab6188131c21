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
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def tmp_workdir():
    d = tempfile.mkdtemp(prefix="qs_work_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
