"""Grouped-aggregate Pandas UDAFs (Arrow-batched custom aggregates).

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` resolves the type hints at decoration time, and stringified
annotations referencing module-local imports break that resolution.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean of a positive series — a custom aggregate Spark lacks
    natively; evaluated per group over Arrow batches."""
    return float(np.exp(np.log(v.to_numpy()).sum() / len(v)))


@pandas_udf("long")
def pd_count(v: pd.Series) -> int:
    """Count as a pandas UDAF — Spark disallows mixing group-aggregate
    pandas UDFs with JVM aggregates in one agg(), so companions live here."""
    return int(len(v))
