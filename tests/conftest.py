from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from sparkstract.session import get_spark

    s = get_spark("local[4]", app="sparkstract-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_set():
    from sparkstract.fixtures.gen import build_fixtures

    return build_fixtures(seed=42)
