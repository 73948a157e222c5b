import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tech_ml_dataset_spark import get_spark

# r8 (r7 verdict #9): a high-budget Hypothesis profile for the codec
# property suites — they guard the components with the largest
# silent-failure surface (the 1/256 pdf 0x0D-tail class needed ~256
# examples to sample; the default 60-example budget missed it for a
# round). Run once per round:
#   python -m pytest tests/test_properties.py -q --hypothesis-profile=thorough
from hypothesis import settings as _hyp_settings

_hyp_settings.register_profile("thorough", max_examples=1000,
                               deadline=None)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
