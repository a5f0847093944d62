from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from holochatstats_spark.session import get_spark

    s = get_spark("holochatstats-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    from holochatstats_spark.testing import duck_connection

    return duck_connection(SF_SMOKE)
