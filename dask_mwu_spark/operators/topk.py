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
    n_features: int | None = None,
) -> DataFrame:
    """Per-group result table sorted by |LFC| and truncated to ``top_n``.

    Matches create_df.py:117-134: columns gene/U/p_value/p_adjusted/
    logfoldchange/abs_logfoldchange, sorted by abs_logfoldchange, head(top_n).
    pandas' stable sort tiebreak on input order becomes an explicit
    deterministic tiebreak on the feature name (SURVEY.md F1).
    ``top_n=None`` keeps all features; top_n must be >= 0, and — matching the
    reference's upper bound (create_df.py:44-52) — must not exceed the
    feature count.  The reference knows n_genes from its in-memory arrays;
    here the input is a lazy DataFrame, so pass ``n_features=`` for an eager
    check without triggering a count job (callers that track feature
    cardinality, e.g. the pipeline, thread it through).

    The ordering key is |LFC| rounded to 6 decimals (then the feature-name
    tiebreak): LFC is mean-derived, so its float-sum order differs between
    engines in the last ulp; ranking on the same 6-decimal precision the
    emitted value is compared at keeps the selected top-k set identical
    across engines (ADVICE r1 — cosine_topk already does this).
    """
    if sort_by not in ("asc", "desc"):
        raise InvalidDimensionError(f"sort_by must be 'asc' or 'desc', got {sort_by!r}")
    if top_n is not None and top_n < 0:
        raise InvalidDimensionError(f"top_n must be >= 0, got {top_n}")
    if top_n is not None and n_features is not None and top_n > n_features:
        raise InvalidDimensionError(
            f"top_n must be <= n_features ({n_features}), got {top_n}"
        )
    abs_lfc = F.abs(F.col("logfoldchange"))
    order_key = F.round(abs_lfc, 6)
    order = (
        order_key.desc_nulls_last() if sort_by == "desc" else order_key.asc_nulls_last()
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
