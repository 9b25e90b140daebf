from netml_spark.operators.sessionize import (  # noqa: F401
    sessionize,
    sessionize_timeout,
    subflows_interval,
)
from netml_spark.operators.stats import stats_features  # noqa: F401
