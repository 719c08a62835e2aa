import pytest

from datastream_deltalake_connector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests", cores=4, shuffle_partitions=4, driver_memory="8g"
    )
    yield s
