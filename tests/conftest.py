import pytest

from sparkgatha.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "sparkgatha-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    yield s
