import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

# Pin CI to the pure-Python decode kernels: with Pillow present the
# multimodal fast path changes feature rows / dHash pairs by IDCT
# rounding and format coverage, making results environment-dependent.
# Library users still get the fast path by default.
os.environ.setdefault("SPARK_GRAFT_PURE_DECODE", "1")

from elastic_asset_etl_poc_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]")
    yield s
    s.stop()
