"""Result assembly + per-group top-k (reference F1: dask_mwu/create_df.py:70-134).

The reference loops groups on the driver building one pandas DataFrame each;
here a single ranking window produces every group's top-k in one distributed
job, and the per-group split happens only at sink time
(``write.partitionBy("group")``) — SURVEY.md S4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dask_mwu_spark.errors import InvalidDimensionError


def create_df(
    stats: DataFrame,
    *,
    top_n: int | None = None,
    sort_by: str = "desc",
    feature_col: str = "feature",
) -> DataFrame:
    """Per-group result table sorted by |LFC| and truncated to ``top_n``.

    Matches create_df.py:117-134: columns gene/U/p_value/p_adjusted/
    logfoldchange/abs_logfoldchange, sorted by abs_logfoldchange, head(top_n).
    pandas' stable sort tiebreak on input order becomes an explicit
    deterministic tiebreak on the feature name (SURVEY.md F1).
    ``top_n=None`` keeps all features; top_n must be >= 0 (create_df.py:44-52).
    """
    if sort_by not in ("asc", "desc"):
        raise InvalidDimensionError(f"sort_by must be 'asc' or 'desc', got {sort_by!r}")
    if top_n is not None and top_n < 0:
        raise InvalidDimensionError(f"top_n must be >= 0, got {top_n}")
    abs_lfc = F.abs(F.col("logfoldchange"))
    order = (
        abs_lfc.desc_nulls_last() if sort_by == "desc" else abs_lfc.asc_nulls_last()
    )
    w = Window.partitionBy("group").orderBy(order, F.col(feature_col).asc())
    out = stats.select(
        "group",
        F.col(feature_col).alias("gene"),
        F.col("u_stat").alias("U"),
        "p_value",
        "p_adjusted",
        "logfoldchange",
        abs_lfc.alias("abs_logfoldchange"),
        F.row_number().over(w).alias("_rn"),
    )
    if top_n is not None:
        out = out.where(F.col("_rn") <= top_n)
    return out.drop("_rn")


def write_per_group_csv(result: DataFrame, output_dir: str) -> None:
    """Sink S4 (scratch/rank_gene_groups.py:302-307): one directory per group,
    single job, no driver-side per-group loop."""
    result.write.mode("overwrite").partitionBy("group").option(
        "header", "true"
    ).csv(output_dir)
