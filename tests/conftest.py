import os
import sys

import pytest

_TESTS = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_TESTS)
sys.path.insert(0, _ROOT)

# executor python workers resolve test-module classes (fakes used inside
# mapPartitions closures) via PYTHONPATH
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_ROOT, _TESTS, os.environ.get("PYTHONPATH", "")]
)

from moc_indexer_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="moc-indexer-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
