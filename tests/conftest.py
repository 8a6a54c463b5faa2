import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from knowledge_graph_creation_from_text_with_llms_spark import get_spark

    s = get_spark("kg-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_tiny():
    return SF_TINY
