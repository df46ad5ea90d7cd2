"""Market-basket affinity: co-occurrence lift between item attributes
within an order.

The classic association signal (Agrawal & Srikant's support/lift without
the full Apriori lattice — pairs only, which is what retail dashboards
and cross-sell features actually consume).  No counterpart in the
reference (SURVEY.md section 2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_lift(
    lineitem: DataFrame, part: DataFrame, *, min_pair_orders: int = 3
) -> DataFrame:
    """Pairwise brand lift over orders — (brand_a, brand_b, n_both, lift,
    support), brand_a < brand_b:

        lift    = P(a,b) / (P(a) * P(b)) = (n_both * N) / (n_a * n_b)
        support = n_both / N

    with N the order count and n_* order-level (not line-level) brand
    incidences.  lift > 1 = brands bought together above chance (the
    cross-sell pair), lift < 1 = substitutes.

    Scale: the (order, brand) incidence table is one equi-join against
    the part dimension plus a distinct; the within-order self-join fans
    out by (distinct brands per order choose 2) — bounded by the ~25-value
    brand vocabulary, NOT by order size; the pair groupBy keys on a
    vocab² ceiling.  N is a 1-row broadcast; the brand marginals a
    25-row broadcast.  Nothing corpus-scale is ever broadcast or sorted.

    Cross-engine: all counts exact BIGINTs; lift/support are single
    divisions of exact integer products, rounded to 6.
    """
    items = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("_n")
    )
    marg = items.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_pair_orders)
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("_ca"))),
            "brand_a",
        )
        .join(
            F.broadcast(marg.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("_cb"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("_n")).cast("double")
                / (F.col("_ca") * F.col("_cb")).cast("double"),
                6,
            ).alias("lift"),
            F.round(
                F.col("n_both").cast("double") / F.col("_n").cast("double"), 6
            ).alias("support"),
        )
    )
