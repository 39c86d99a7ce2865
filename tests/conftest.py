import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from readur_spark.session import get_spark

    s = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
                  app_name="readur_spark_tests")
    yield s


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """Small deterministic corpus written once per session."""
    from readur_spark.datagen import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(path, 500, seed=42)
    return path


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
