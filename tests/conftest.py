import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


def pytest_addoption(parser):
    parser.addoption(
        "--run-bench", action="store_true", default=False,
        help="run kernel micro-benchmarks (the reference's #[ignore] analog)",
    )


@pytest.fixture(scope="session")
def spark():
    from tokseq.engine.session import get_spark

    s = get_spark(cores=4, shuffle_partitions=8, app_name="tokseq-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_df(spark):
    """Unit-scale corpus incl. all boundary docs, as a Spark DataFrame."""
    from tokseq.datagen import generate_corpus

    table = generate_corpus(scale=0.25, chunk_width=512)
    return spark.createDataFrame(table.to_pandas()).cache()
