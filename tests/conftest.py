import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
