from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[2]", shuffle_partitions=2)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
