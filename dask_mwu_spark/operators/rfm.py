"""RFM (recency / frequency / monetary) customer segmentation — the classic
behavioral scoring the marketing/growth side of an analytics platform runs
on the orders fact table.

No counterpart in the reference (SURVEY.md section 2.1); included because a
user of a general analytics engine expects segmentation primitives next to
the funnel/cohort family.

Scale design: ONE groupBy on the (uniform) customer key builds the three
metrics — per-customer state is that customer's order count; the quartile
thresholds are one tiny aggregate over the per-customer table (exact
percentiles — the per-group value map is bounded by distinct metric values;
see ``audit.exact_quantile`` for the 1e11-row escape hatch) broadcast back;
scoring is pure row expressions.  Cross-engine exactness: the monetary sum
folds in (order_date, order_key) order via sort_array + aggregate so the
float total is evaluated in the SAME order on every engine/partitioning,
recency is integer day arithmetic on DATEs, and scores are integer
comparisons of bit-identical values against bit-identical thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_scores(
    orders: DataFrame,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    key_col: str = "o_orderkey",
) -> DataFrame:
    """Per-customer RFM metrics + quartile scores:
    ``(customer, recency_days, frequency, monetary, r_score, f_score,
    m_score)``.

    recency_days = days from the customer's latest order DATE to the
    corpus-wide latest order date (0 = ordered on the last day; bigger =
    colder).  Scores are 1-4 via strict-greater comparison against the
    exact 25/50/75th percentiles over customers: score = 1 + Σ(metric >
    q_k).  Note r_score uses recency_days directly, so HIGH r_score
    means LONG inactivity — the churn-risk reading; flip downstream if
    the loyalty reading is wanted.
    """
    d = F.to_date(F.col(date_col))
    per_cust = (
        orders.select(
            F.col(cust_col).alias("customer"),
            d.alias("_d"),
            F.struct(
                d.alias("o"), F.col(key_col).alias("k"),
                F.col(amount_col).cast("double").alias("amt"),
            ).alias("_s"),
        )
        .groupBy("customer")
        .agg(
            F.max("_d").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.aggregate(
                F.sort_array(F.collect_list("_s")),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["amt"],
            ).alias("monetary"),
        )
    )
    gmax = per_cust.agg(F.max("_last").alias("_gmax"))
    metrics = per_cust.crossJoin(F.broadcast(gmax)).select(
        "customer",
        F.datediff(F.col("_gmax"), F.col("_last")).cast("long").alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
    )
    # Thresholds and compared metrics are both rounded to the repo's
    # standard 6 decimals (ADVICE r4): Spark's F.percentile interpolates as
    # (hi-pos)*v0 + (pos-lo)*v1 while DuckDB's quantile_cont uses
    # v0 + d*(v1-v0) — algebraically equal, up to 1 ulp apart in floats, and
    # the strict `>` scoring would flip a metric sitting exactly on a
    # threshold.  Rounding both sides makes the comparison engine-stable.
    qs = metrics.agg(
        *[
            F.round(
                F.percentile(F.col(c).cast("double"), F.lit(p)), 6
            ).alias(f"_{c}_{i}")
            for c in ("recency_days", "frequency", "monetary")
            for i, p in enumerate((0.25, 0.5, 0.75))
        ]
    )

    def score(c: str) -> F.Column:
        v = F.round(F.col(c).cast("double"), 6)
        return (
            F.lit(1)
            + (v > F.col(f"_{c}_0")).cast("int")
            + (v > F.col(f"_{c}_1")).cast("int")
            + (v > F.col(f"_{c}_2")).cast("int")
        )

    return metrics.crossJoin(F.broadcast(qs)).select(
        "customer",
        "recency_days",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        score("recency_days").alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary").alias("m_score"),
    )
