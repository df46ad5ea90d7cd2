"""Scalar statistical functions missing from Spark SQL.

The single Python boundary in the whole MWU pipeline (SURVEY.md A4): Spark
has no ``norm.sf``/``erfc`` builtin, so the survival function is a vectorized
Arrow-batched pandas UDF over the tiny (n_features x n_groups) statistics
table — never over raw observations (reference computes it driver-side on the
same small matrix, dask_mwu/pvals.py:119-123).

``math.erfc`` is the C library erfc, correctly rounded to double — the same
values scipy.stats.norm.sf produces (sf(z) = erfc(z/sqrt(2))/2).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_erfc = np.frompyfunc(math.erfc, 1, 1)

_SQRT2 = math.sqrt(2.0)


def _erfc_arr(a: np.ndarray) -> np.ndarray:
    out = np.full(a.shape, np.nan)
    finite_or_inf = ~np.isnan(a)
    out[finite_or_inf] = _erfc(a[finite_or_inf]).astype(np.float64)
    return out


@pandas_udf(DoubleType())
def norm_sf(z: pd.Series) -> pd.Series:
    """Standard normal survival function 1 - CDF(z); NULL/NaN -> NULL."""
    arr = z.to_numpy(dtype=np.float64, na_value=np.nan)
    return pd.Series(_erfc_arr(arr / _SQRT2) / 2.0)


def two_sided_p_from_z(z: Column) -> Column:
    """p = clip(2 * norm.sf(z), 0, 1)  (reference dask_mwu/pvals.py:119-123).

    2 * sf(z) = erfc(z / sqrt(2)) which is already >= 0; only the upper clip
    is needed (it bites when U = n1*n2/2 makes z slightly negative).

    NULL/NaN z (degenerate n <= 1 feature) must stay NULL: Spark's ``least``
    sorts NaN *above* every number, so an unguarded ``least(1.0, NaN)``
    would silently return 1.0.
    """
    return F.when(
        z.isNull() | F.isnan(z), F.lit(None).cast("double")
    ).otherwise(F.least(F.lit(1.0), F.lit(2.0) * norm_sf(z)))
