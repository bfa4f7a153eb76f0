import pytest


@pytest.fixture(scope="session")
def spark():
    from ontocast_spark.session import build_spark

    spark = build_spark(
        app_name="ontocast-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()
