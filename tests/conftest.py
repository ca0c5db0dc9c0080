from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("FXSPARK_SHUFFLE_PARTITIONS", "8")
# Data-adaptive oracles (embedding_ivf_topk bakes its k-means codebook into
# literal centroids at import) must train on the SAME fixture the tests read.
# Must run before fxspark.queries is first imported.
os.environ.setdefault(
    "FXSPARK_ORACLE_SF_DIR",
    os.environ.get("FXSPARK_TEST_SF_DIR", "/root/testdata/sf0.001"),
)


@pytest.fixture(scope="session")
def spark():
    from fxspark.session import get_spark

    s = get_spark("fxspark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("FXSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")
