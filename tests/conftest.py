from __future__ import annotations

import pytest

from umi_dedup_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("umi_dedup_tests", parallelism=8, shuffle_partitions=8)
    yield s
