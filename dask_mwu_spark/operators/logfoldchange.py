"""Log-fold-change operators (reference L1/L2: dask_mwu/logfoldchange.py:11-56).

The reference's complement trick — mu2 = (total - mu1*n1) / n2, one data pass
instead of a per-group rescan (logfoldchange.py:12-22) — is preserved
algebraically: ``val_sum``/``total_sum`` arrive pre-aggregated from the same
single pass that produced the rank sums, so LFC adds zero extra scans
(the reference re-reads the data for this stage, SURVEY.md section 3.1
barriers 7-9; we fused it).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_means(
    n1: Column, n2: Column, val_sum: Column, total_sum: Column
) -> tuple[Column, Column]:
    """(in-group mean, rest mean) via the complement identity
    (logfoldchange.py:19).  n2 = 0 (single group) -> NULL rest mean, the
    relational rendering of numpy's 0/0."""
    mu1 = val_sum / n1.cast("double")
    mu2 = F.when(n2 == 0, F.lit(None).cast("double")).otherwise(
        (total_sum - val_sum) / n2.cast("double")
    )
    return mu1, mu2


def lfc_expr(mu1: Column, mu2: Column, *, base: float | None = None) -> Column:
    """log2 fold change of de-logged means (logfoldchange.py:48-54).

    Inputs are log1p-normalized counts: undo with expm1, add the reference's
    1e-9 offset, take log2 of the ratio.  ``base`` rescales inputs stored in
    another log base: expm1(x * ln(base)).
    """
    if base is not None:
        ln_b = F.lit(math.log(base))
        e1, e2 = F.expm1(mu1 * ln_b), F.expm1(mu2 * ln_b)
    else:
        e1, e2 = F.expm1(mu1), F.expm1(mu2)
    off = F.lit(1e-9)
    return F.log2(e1 + off) - F.log2(e2 + off)


def compute_logfoldchange(
    stats: DataFrame, *, base: float | None = None
) -> DataFrame:
    """Attach mu1/mu2/logfoldchange to the (feature, group) statistics table
    (expects n1, n2, val_sum, total_sum columns)."""
    mu1, mu2 = group_means(
        F.col("n1"), F.col("n2"), F.col("val_sum"), F.col("total_sum")
    )
    return (
        stats.withColumn("mu1", mu1)
        .withColumn("mu2", mu2)
        .withColumn(
            "logfoldchange", lfc_expr(F.col("mu1"), F.col("mu2"), base=base)
        )
    )
