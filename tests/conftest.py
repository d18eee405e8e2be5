import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from stl_decomp_4j_spark.plans.session import build_session

    spark = build_session(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()
