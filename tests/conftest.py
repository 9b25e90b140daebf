import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from netml_spark.session import get_spark  # noqa: E402
from netml_spark import datagen  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("netml-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def token_events_pdf() -> pd.DataFrame:
    return datagen.gen_token_events(n_docs=200, seed=42)


@pytest.fixture(scope="session")
def token_events_df(spark, token_events_pdf):
    df = spark.createDataFrame(token_events_pdf)
    df = df.repartition(8, "doc_id").cache()
    df.count()
    return df
