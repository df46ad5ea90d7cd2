"""Data-quality audit operators: null profiling, key uniqueness,
referential integrity.

The checks a pipeline runs BEFORE trusting a 100 TB table: every one is a
single pass or a single key-join, emitted as a small metrics table a
scheduler can gate on.  No counterpart in the reference (SURVEY.md
section 2.1).

Scale design:
- ``null_profile``: ONE scan, one aggregation row — per-column null
  counts are conditional sums inside the same partial aggregate, exploded
  to long form afterwards (never one job per column, the classic
  profiling mistake that turns a 200-column table into 200 scans).
- ``uniqueness``: one groupBy on the candidate key (uniform if the key is
  worth auditing) with map-side partial counts.
- ``orphans``: LEFT ANTI join child→parent on the key — one shuffle, no
  row ever materializes except violations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def null_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """(column, n_nulls, n_rows) per column — one scan, one agg row,
    exploded to long form."""
    cols = list(columns) if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nn_{i}")
        for i, c in enumerate(cols)
    ]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"), F.col(f"_nn_{i}").alias("n_nulls")
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(
        F.explode(pairs).alias("p"), F.col("_n").alias("n_rows")
    ).select("p.column", "p.n_nulls", "n_rows")


def uniqueness(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One row: (n_rows, n_distinct_keys, n_dup_rows) for a candidate
    key — n_dup_rows counts rows beyond the first per duplicated key."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    return per_key.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_keys"),
        F.sum(F.col("_c") - 1).cast("long").alias("n_dup_rows"),
    )


def orphans(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Child rows whose key has no parent (referential-integrity
    violations) — LEFT ANTI join, one shuffle, violations only."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(p, on=child_key, how="left_anti")


def key_skew_profile(
    df: DataFrame, key: str, *, top_k: int = 10
) -> DataFrame:
    """The pre-flight check for any planned shuffle on ``key``: the top-k
    heaviest key values with absolute counts and their share of the table,
    plus the uniform-share baseline to read the skew factor off directly —
    ``(key_value, n_rows, share, skew_vs_uniform)``.

    A skew_vs_uniform of s means the hottest reducer gets s× the average
    partition's work; above ~5-10 the join/agg on this key wants the
    salted path (operators/skew.py) or AQE skew splitting.

    Plan shape: one map-side-combinable count per distinct key, then
    ``orderBy().limit(k)`` = TakeOrderedAndProject (per-partition top-k,
    driver merges k·partitions rows) — no global sort, no collect of the
    distinct-key table, safe at any cardinality.  The two scalar totals
    ride along via a 1-row broadcast join.
    """
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key_value")).limit(top_k)
    return top.crossJoin(F.broadcast(totals)).select(
        "key_value",
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("n_rows") * F.col("_n_keys") / F.col("_total"), 6
        ).alias("skew_vs_uniform"),
    )


def value_histogram(
    df: DataFrame, col: str, *, n_bins: int = 20
) -> DataFrame:
    """Equal-width histogram of a numeric column:
    ``(bin, lo, hi, n_rows)`` for the non-empty bins, bin ∈ 1..n_bins.

    Two passes, both trivial: a 1-row min/max aggregate broadcast back,
    then one map-side-combinable groupBy on the bin index — the same cost
    profile as any count(*).  Bin assignment is explicit floor math (not
    width_bucket) so the DuckDB oracle reproduces it bit-for-bit:
    ``bin = least(n, floor((v - min) / (max - min) * n) + 1)`` with the max
    value closing into the last bin; a constant column collapses to bin 1.

    At scale this IS the histogram you can afford on 100 TB: no sort, no
    per-value state, shuffle bounded by n_bins x partitions.

    NULL/NaN rows are EXCLUDED (round-7 review fix): min/max already
    ignore them, and without the filter a NULL value slid into the top
    bin (``least(n, NULL+1)`` ignores the NULL operand) and a constant
    column counted NULL rows into bin 1 — an audit must not report
    missingness as in-range mass.  Mirror any SQL twin with ``WHERE col
    IS NOT NULL``.
    """
    c = F.col(col).cast("double")
    df = df.where(c.isNotNull() & ~F.isnan(c))
    rng = df.agg(
        F.min(c).alias("_lo"), F.max(c).alias("_hi")
    )
    binned = df.crossJoin(F.broadcast(rng)).select(
        F.when(F.col("_lo") == F.col("_hi"), F.lit(1))
        .otherwise(
            F.least(
                F.lit(n_bins),
                F.floor(
                    (c - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * F.lit(n_bins)
                ).cast("int")
                + F.lit(1),
            )
        )
        .alias("bin"),
        "_lo",
        "_hi",
    )
    w = (F.col("_hi") - F.col("_lo")) / F.lit(n_bins)
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
        )
        .select(
            "bin",
            F.round(F.col("_lo") + (F.col("bin") - 1) * w, 6).alias("lo"),
            F.round(
                F.when(F.col("bin") == n_bins, F.col("_hi")).otherwise(
                    F.col("_lo") + F.col("bin") * w
                ),
                6,
            ).alias("hi"),
            "n_rows",
        )
    )


def exact_quantile(
    df: DataFrame,
    col: str,
    q: float,
    *,
    n_bins: int = 4096,
    max_rounds: int = 8,
) -> float | None:
    """EXACT linear-interpolation quantile (DuckDB ``quantile_cont`` /
    Spark ``percentile`` semantics) with BOUNDED per-node state — the
    scale path for ``curation.calibrated_quality_filter(exact=True)``.

    ``F.percentile`` is exact but accumulates a per-value hash map in a
    single aggregation buffer — unbounded state on high-cardinality
    columns (1e11 distinct doubles will not fit anywhere).  This computes
    the same number via iterative histogram narrowing, the two-pass trick
    from :func:`value_histogram` applied recursively:

    1. one min/max/count pass;
    2. per round: one n_bins-width histogram over the current range, then
       narrow the range to the bins holding the target order statistics
       (±1 bin of slack so float edge-binning can never exclude them).
       Each round divides the candidate width by n_bins, so values
       distinguishable at double precision separate within ~5 rounds;
       massive ties collapse to a single candidate value and stop early;
    3. one exact ``count(value < lo)`` pass to anchor the global rank
       (immune to any binning drift), then a value-level groupBy WITHIN
       the final range — its shuffle is bounded by the distinct values
       left in a width/(n_bins^rounds) window (typically 1) — and the two
       order statistics interpolate exactly.

    Cost: (rounds + 3) scans, each a map-side-combinable aggregate with
    n_bins-bounded output; driver holds only 1-row/n_bins-row results per
    round (the same tiny-materialization discipline as
    similarity.kmeans_centroids).  Returns a Python float (or None on an
    empty/all-null column) for injection as a plan literal.
    """
    import math

    c = F.col(col).cast("double")
    n, lo, hi = df.agg(
        F.count(c), F.min(c), F.max(c)
    ).first()
    if n == 0 or lo is None:
        return None
    p = q * (n - 1)
    k0 = min(int(math.floor(p)), n - 1)
    frac = p - k0
    k1 = min(k0 + 1, n - 1) if frac > 0 else k0
    for _ in range(max_rounds):
        if lo == hi:
            break
        width = (hi - lo) / n_bins
        if width <= 0 or not math.isfinite(width):
            break
        hist = dict(
            df.where((c >= lo) & (c <= hi))
            .groupBy(
                F.least(
                    F.lit(n_bins - 1), F.floor((c - lo) / F.lit(width))
                ).cast("int").alias("b")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        below = df.where(c < lo).count()
        cum, b0, b1 = below, None, None
        for b in range(n_bins):
            cnt = hist.get(b, 0)
            if b0 is None and cum + cnt > k0:
                b0 = b
            if b1 is None and cum + cnt > k1:
                b1 = b
                break
            cum += cnt
        if b0 is None:  # rank below this range: float drift — bail to final step
            break
        b1 = b1 if b1 is not None else n_bins - 1
        new_lo = lo + max(0, b0 - 1) * width
        new_hi = lo + min(n_bins, b1 + 2) * width if b1 < n_bins - 1 else hi
        new_hi = min(new_hi, hi)
        if new_lo <= lo and new_hi >= hi:
            break  # no narrowing possible (ties span the range)
        lo, hi = new_lo, new_hi
        in_range = sum(
            cnt for b, cnt in hist.items() if max(0, b0 - 1) <= b <= b1 + 1
        )
        if in_range <= n_bins:
            break
    below = df.where(c < lo).count()
    from pyspark.sql import Window

    grouped = (
        df.where((c >= lo) & (c <= hi))
        .groupBy(c.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ENFORCED bound on the final ordered window (VERDICT r11): the
    # "ties span the range" bail usually leaves a handful of distinct
    # values, but an adversarial distribution (a massive tie at one
    # edge holding rank k0 with high-cardinality mass spread to the
    # other edge) can stall joint narrowing while the range still
    # holds millions of distinct values — a global-sort window over
    # them would be exactly the unbounded state this function exists
    # to avoid.  Count the distinct values first (map-side-combinable,
    # 1-row result) and fall back to the single-buffer exact aggregate
    # when the cap trips; its interpolation is the same Percentile
    # form the tail below reproduces, so both paths return the same
    # bits.
    if grouped.count() > 4 * n_bins:
        return df.agg(F.percentile(c, F.lit(q))).first()[0]
    vals = grouped.withColumn("cum", F.sum("cnt").over(Window.orderBy("v")))
    picked = vals.where(F.lit(below) + F.col("cum") > k0).orderBy("v").limit(2).collect()
    v0 = picked[0]["v"]
    if k1 == k0 or frac == 0:
        return float(v0)
    v1 = v0 if below + picked[0]["cum"] > k1 else picked[1]["v"]
    # Spark Percentile's interpolation form, (hi-pos)*v0 + (pos-lo)*v1 —
    # v0 + frac*(v1-v0) is 1 ulp off on some inputs and this must equal
    # F.percentile bit-for-bit
    return float((k0 + 1 - p) * v0 + (p - k0) * v1)


def correlation_matrix(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Pearson correlations for every column pair in one aggregation pass:
    ``(col_a, col_b, corr)``, upper triangle only.

    All C(k,2) ``corr`` aggregates evaluate in a SINGLE groupBy-less
    aggregation over one scan — the multi-aggregate trick that makes a
    k-column profile cost one pass instead of k² (each corr keeps O(1)
    running state: n, Σx, Σy, Σxy, Σx², Σy²; all map-side combinable).
    The wide 1-row result is unpivoted driver-free via stack().
    """
    pairs = [
        (a, b)
        for i, a in enumerate(columns)
        for b in list(columns)[i + 1 :]
    ]
    aggs = [
        F.round(F.corr(F.col(a).cast("double"), F.col(b).cast("double")), 6).alias(
            f"{a}__{b}"
        )
        for a, b in pairs
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    breaks: Sequence[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard model/feature drift monitor (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 action).

    Bins come from EXPLICIT ``breaks`` passed as plan literals: bin 1 is
    ``(-inf, breaks[0]]``, bin i is ``(breaks[i-2], breaks[i-1]]``, bin
    len(breaks)+1 is ``(breaks[-1], inf)``.  Fixed edges (rather than
    quantiles of side A) keep the two sides completely independent — each
    is ONE map-side-combinable groupBy on its own scan, no synchronization
    pass, so A can be last month's 100 TB partition and B today's.

    Per bin: ``psi = (fa - fb) * ln(fa / fb)`` with ``eps`` substituted
    for empty-bin fractions (the standard smoothing so a vanished bin
    contributes a large-but-finite term).  Fractions and psi are computed
    from exact BIGINT counts in single expressions — no float
    accumulation, so the values are engine- and partitioning-exact.
    Output: (bin, n_a, n_b, frac_a, frac_b, psi), rounded to 6; sum(psi)
    downstream is the headline index.
    """
    bs = [float(x) for x in breaks]

    def binned(df: DataFrame, out: str) -> DataFrame:
        c = F.col(col).cast("double")
        e = F.lit(1)
        for x in bs:
            e = e + F.when(c > F.lit(x), 1).otherwise(0)
        return df.select(e.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    a = binned(df_a, "n_a")
    b = binned(df_b, "n_b")
    # <= len(breaks)+1 rows per side: the join and the total-count windows
    # run on a bin-bounded table, not the data.
    j = (
        a.join(b, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = Window.partitionBy()
    fa = F.col("n_a").cast("double") / F.sum("n_a").over(tot)
    fb = F.col("n_b").cast("double") / F.sum("n_b").over(tot)
    fa_s = F.greatest(fa, F.lit(eps))
    fb_s = F.greatest(fb, F.lit(eps))
    return j.select(
        "bin",
        "n_a",
        "n_b",
        F.round(fa, 6).alias("frac_a"),
        F.round(fb, 6).alias("frac_b"),
        F.round((fa_s - fb_s) * F.log(fa_s / fb_s), 6).alias("psi"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: Sequence[str], *, k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: one summary
    row ``(n_rows, n_groups, min_group_size, n_violating_groups,
    n_violating_rows, k_anonymous)`` where a violating group has fewer
    than ``k`` rows sharing the same quasi-identifier combination (the
    re-identification risk gate run before releasing a derived dataset).

    Scale: ONE groupBy on the quasi-identifier tuple (map-side partial
    counts) followed by a 1-row aggregate over the group-size table —
    never materializes row-level output, so it is safe on any width of
    table; NULL combinations group together like any other value.
    """
    sizes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    viol = F.col("_n") < k
    return sizes.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_n").alias("min_group_size"),
        F.sum(F.when(viol, 1).otherwise(0)).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("_n")).otherwise(0)).alias("n_violating_rows"),
        (F.min("_n") >= k).cast("long").alias("k_anonymous"),
    )


def reconcile_sum(
    parent: DataFrame,
    child: DataFrame,
    *,
    parent_key: str,
    child_key: str,
    parent_total: str,
    child_amount,
    child_order: str,
    group_col: str,
    tol: float = 0.02,
) -> DataFrame:
    """Cross-table financial reconciliation: recompute each parent row's
    total from its child rows and report, per ``group_col``, how many
    parents agree within ``tol``, how many are within 1% / 10% relative
    error, and the worst absolute gap — the "does the rollup table still
    match the fact table" audit a warehouse runs after every load.

    The per-parent recomputed total is folded in ``child_order`` order
    (sort_array + aggregate) so the float sum is evaluated in the SAME
    order on every engine/partitioning; parents with no children count as
    unmatched with gap = |parent_total|.

    Scale: ONE groupBy on the child's parent key (per-parent state bounded
    by fan-out), one key-join parent→totals, one tiny groupBy on
    ``group_col``.  No counterpart in the reference (SURVEY 2.1).
    """
    totals = (
        child.select(
            F.col(child_key).alias(parent_key),
            F.struct(F.col(child_order).alias("o"), child_amount.alias("amt")).alias(
                "_s"
            ),
        )
        .groupBy(parent_key)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list("_s")),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["amt"],
            ).alias("_recomputed"),
            F.count(F.lit(1)).alias("_n_children"),
        )
    )
    joined = parent.join(totals, parent_key, "left").select(
        F.col(group_col),
        F.coalesce(F.col("_n_children"), F.lit(0)).alias("_nc"),
        F.abs(F.coalesce(F.col("_recomputed"), F.lit(0.0)) - F.col(parent_total)).alias(
            "_gap"
        ),
        # explicit /0 guard (ADVICE r4): without it Spark yields NULL on a
        # zero parent total while DuckDB (IEEE default) yields inf — the
        # aggregated counts coincided only because NULL is sum-skipped and
        # inf fails the thresholds.  Both engines now produce NULL for
        # zero-total parents (oracle mirrors this CASE), so _rel is safe
        # to surface directly.
        F.when(
            F.col(parent_total) != 0,
            F.abs(F.coalesce(F.col("_recomputed"), F.lit(0.0)) - F.col(parent_total))
            / F.abs(F.col(parent_total)),
        ).alias("_rel"),
    )
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.sum((F.col("_nc") == 0).cast("long")).alias("n_childless"),
        F.sum((F.col("_gap") <= tol).cast("long")).alias("n_matched"),
        F.sum((F.col("_rel") <= 0.01).cast("long")).alias("n_within_1pct"),
        F.sum((F.col("_rel") <= 0.10).cast("long")).alias("n_within_10pct"),
        F.round(F.max("_gap"), 6).alias("max_abs_gap"),
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — ONE row (n_obs, n_a, n_b, dof, chi2, p_value).  The
    categorical-association audit: "is return behavior independent of
    line status", "is language independent of source" — the gate a
    mixture/stratification plan checks before treating two dimensions as
    orthogonal.

    Scale: one map-side-combinable groupBy to the |A| x |B| cell table
    (categorical audit columns are low-cardinality by assumption — the
    events_pivot contract); totals are window sums OVER that bounded cell
    table (no ordered unpartitioned window); the (o-e)^2/e terms fold in
    (a, b) cell order.  Raw rows are touched exactly once.

    Empty contingency cells (a pair (a, b) with zero co-occurrences —
    groupBy never emits them) still owe their Pearson contribution
    ``(0 - e)^2 / e = e``.  Rather than materialize the full |A| x |B|
    frame (a cross-join plus an extra pass over the cell table), use the
    identity ``sum over ALL cells of e = g``: the empty-cell mass is
    ``g - sum over OBSERVED cells of e``, so
    ``chi2 = g + fold over observed cells of [ (n - e)^2 / e - e ]`` —
    same single-scan plan, no cross-join, and exactly the standard
    statistic (e.g. scipy.stats.chi2_contingency) on tables with holes.

    Cross-engine exactness: observed counts and marginals are exact
    BIGINTs; each expected value is the fixed tree
    ``CAST(row AS DOUBLE) * CAST(col AS DOUBLE) / CAST(grand AS DOUBLE)``;
    cell terms (term - e) fold in cell order, then ``+ CAST(g AS
    DOUBLE)``; chi2 rounds to 6 BEFORE the dof=2 closed-form survival
    function exp(-x/2) (3x2 fixture), which rounds to 6 after — the
    Kruskal-Wallis contract.  For dof != 2 the p is NULL (general dof
    needs the regularized incomplete gamma; no closed SQL form).  No
    counterpart in the reference (SURVEY.md section 2.1).

    Rows with a NULL in EITHER category column are excluded (round-7
    review fix): previously a NULL category participated in the cells,
    marginals, and chi2 but not in ``countDistinct``, so dof (and the
    dof==2 p-value gate) was computed for the wrong table shape.  To
    test missingness-as-category, coalesce to an explicit sentinel
    first.  Mirror any SQL twin with ``WHERE a IS NOT NULL AND b IS NOT
    NULL``.
    """
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wg = Window.partitionBy()
    t = cells.select(
        "a",
        "b",
        "n",
        F.sum("n").over(wa).alias("_ra"),
        F.sum("n").over(wb).alias("_cb"),
        F.sum("n").over(wg).alias("_g"),
    )
    e = (
        F.col("_ra").cast("double")
        * F.col("_cb").cast("double")
        / F.col("_g").cast("double")
    )
    term = (
        (F.col("n").cast("double") - e)
        * (F.col("n").cast("double") - e)
        / e
    ) - e
    agg = t.select("a", "b", "n", "_g", term.alias("_t")).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("a", "b", F.col("_t")))),
            F.lit(0.0).cast("double"),
            lambda acc, s: acc + s["_t"],
        ).alias("_chi2"),
        F.countDistinct("a").alias("n_a"),
        F.countDistinct("b").alias("n_b"),
        F.max("_g").alias("n_obs"),
    )
    dof = (F.col("n_a") - 1) * (F.col("n_b") - 1)
    chi2 = F.round(F.col("_chi2") + F.col("n_obs").cast("double"), 6)
    return agg.select(
        "n_obs",
        "n_a",
        "n_b",
        dof.alias("dof"),
        chi2.alias("chi2"),
        F.when(
            dof == 2, F.round(F.exp(-chi2 / F.lit(2.0)), 6)
        ).alias("p_value"),
    )


def ks_two_sample(
    measure: DataFrame, group_a: str, group_b: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov per feature over a long (feature,
    group, value) table: D = max |F_a(v) - F_b(v)| with the asymptotic
    two-sided p from the truncated Kolmogorov series — the exact-CDF
    drift test that complements ``psi_drift``'s binned form (PSI needs a
    bin design; KS is parameter-free and sensitive to ANY distributional
    difference, the train-vs-eval / source-vs-source gate).

    Scale: value-level conditional counts are one map-side-combinable
    (feature, value) groupBy — raw rows collapse before the window; the
    running CDFs are ONE per-feature window over distinct values (the
    rank_values plan shape, fine to ~1e7 distinct values per feature —
    beyond that the bucketed two-phase rank pattern applies); D is a
    plain max aggregate.

    Cross-engine exactness: cumulative counts and group sizes are exact
    BIGINTs; each CDF is a single IEEE divide; D is a max of identical
    arithmetic trees — bit-stable, rounded to 6 for output.  lambda =
    (sqrt(n_e) + 0.12 + 0.11/sqrt(n_e)) * D (n_e the effective sample
    size, the standard asymptotic form) rounds to 6 BEFORE the series
    p = 2 * sum_{k=1..8} (-1)^(k-1) exp(-2 k^2 lambda^2) — eight
    fixed-order terms (truncation error < 1e-12 for lambda > 0.4, and
    the series alternates so it is bounded by the 9th term), clipped to
    [0, 1], rounded to 6 (the Kruskal-Wallis exp contract).  No
    counterpart in the reference (SURVEY.md section 2.1).

    NULL/NaN values are excluded (round-7 review fix, the drift_monitor
    discipline): a NULL cannot occupy a position on a CDF — previously
    it grouped as its own value row, sorted first, and shifted every
    subsequent CDF step by the null mass, so D measured missingness
    instead of distribution.  Mirror any SQL twin with ``WHERE value IS
    NOT NULL``.
    """
    m2 = measure.where(
        F.col("group").isin(group_a, group_b)
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value").cast("double"))
    )
    vc = m2.groupBy("feature", "value").agg(
        F.sum(
            F.when(F.col("group") == group_a, 1).otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(F.col("group") == group_b, 1).otherwise(0)
        ).alias("c2"),
    )
    wcum = Window.partitionBy("feature").orderBy("value")
    wall = Window.partitionBy("feature")
    cum = vc.select(
        "feature",
        F.sum("c1").over(wcum).alias("k1"),
        F.sum("c2").over(wcum).alias("k2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    diff = F.abs(
        F.col("k1").cast("double") / F.col("n1").cast("double")
        - F.col("k2").cast("double") / F.col("n2").cast("double")
    )
    d = cum.groupBy("feature").agg(
        F.max(diff).alias("_d"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    ne = n1d * n2d / (n1d + n2d)
    lam = F.round(
        (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne))
        * F.col("_d"),
        6,
    )
    series = sum(
        (
            F.lit(float((-1) ** (k - 1)))
            * F.exp(F.lit(-2.0 * k * k) * lam * lam)
            for k in range(2, 9)
        ),
        start=F.exp(F.lit(-2.0) * lam * lam),
    )
    # the alternating series needs its 9th term < 1e-9, i.e. lambda >
    # ~0.357; below 0.3 the true survival is 1.0 to well past 6 decimals
    # (Q(0.3) = 1 - 4.7e-8), so the small-lambda branch returns exactly 1
    # instead of a divergent truncation (at lambda=0 the raw series
    # alternates 1-1+1-... = 0, the classic failure)
    p = F.when(lam < 0.3, F.lit(1.0)).otherwise(
        F.round(
            F.least(
                F.lit(1.0), F.greatest(F.lit(0.0), F.lit(2.0) * series)
            ),
            6,
        )
    )
    return d.select(
        "feature",
        "n1",
        "n2",
        F.round("_d", 6).alias("d_stat"),
        lam.alias("lambda_stat"),
        p.alias("p_value"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    cutoff: float = 4.4478,
    method: str = "histogram",
) -> DataFrame:
    """Robust per-group outlier audit via median absolute deviation:
    per group — n, median, MAD = median(|x − median|), and the count of
    rows with |x − median| > ``cutoff`` · MAD (default 4.4478 =
    3 σ-equivalents · 1.4826, the normal-consistency constant; passed as
    ONE literal so both engines evaluate the identical product).  The
    mean/stddev z-score version breaks on the heavy-tailed value
    distributions audits exist to catch — the outliers inflate the very
    σ that is supposed to flag them; MAD has a 50% breakdown point.

    Two bit-identical medians (same ``method=`` switch shape as
    ``curation.calibrated_quality_filter``; equality pytest-locked):
    - ``"histogram"`` (default): both grouped medians via
      :func:`exact_quantile_by_group` — O(n_bins) aggregation state per
      node regardless of per-group value cardinality, the 1e11-row path,
      so the whole audit family is uniformly bounded-state.
    - ``"percentile"``: ``F.percentile``, whose aggregation buffer holds
      one per-distinct-value map per group — fewer jobs (no narrowing
      rounds), fine for bounded per-group cardinalities.
    Both interpolate with Spark Percentile's ``(hi-pos)·v0+(pos-lo)·v1``
    form, so the switch never changes a result bit.  Plus one key-join of
    the rows back to their group medians either way.
    """
    if method not in ("histogram", "percentile"):
        raise ValueError(f"method must be histogram|percentile, got {method!r}")
    gcols = list(group_cols)
    if method == "histogram":
        med = exact_quantile_by_group(df, value_col, 0.5, gcols).select(
            *gcols, F.col("quantile").alias("_med")
        )
    else:
        med = df.groupBy(*gcols).agg(
            F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
        )
    dev = df.join(med, gcols).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("_med"))
    )
    if method == "histogram":
        mad = exact_quantile_by_group(dev, "_dev", 0.5, gcols).select(
            *gcols, F.col("quantile").alias("_mad")
        )
        stats = (
            dev.groupBy(*gcols)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.first("_med").alias("_median"),
            )
            .join(mad, gcols)
        )
    else:
        stats = dev.groupBy(*gcols).agg(
            F.count(F.lit(1)).alias("n"),
            F.first("_med").alias("_median"),
            F.percentile(F.col("_dev"), F.lit(0.5)).alias("_mad"),
        )
    counted = (
        dev.join(stats.select(*gcols, "_mad"), gcols)
        .groupBy(*gcols)
        .agg(
            F.sum(
                (F.col("_dev") > F.lit(cutoff) * F.col("_mad")).cast("long")
            ).alias("n_outliers")
        )
    )
    return stats.join(counted, gcols).select(
        *gcols,
        "n",
        F.round(F.col("_median"), 6).alias("median"),
        F.round(F.col("_mad"), 6).alias("mad"),
        "n_outliers",
    )


def benford_profile(
    df: DataFrame, col: str, *, cents_scale: int = 100
) -> DataFrame:
    """Benford first-digit audit of a positive money-like column:
    ``(digit, n, freq, expected_freq, chi2_term)`` for digits 1-9, where
    expected_freq is Benford's law log10(1 + 1/d) and chi2_term the
    per-digit Pearson contribution ``(n − N·e)² / (N·e)`` — the classic
    fabricated-data / synthetic-fill detector (hand-typed or generated
    amounts drift from the log-uniform leading-digit law).

    The leading digit is extracted from the value as EXACT integer cents
    (``round(v · cents_scale)`` → BIGINT → first character), never from
    float log10 arithmetic: ``floor(log10(v))`` puts values like 1000.0
    on a ulp knife-edge where engines can disagree by a whole digit,
    while integer→string is bit-identical everywhere.  Scaling by a
    power of 10 does not change the leading significant digit.

    PRECISION CONTRACT (round-7 review): the column must be exact at
    ``1/cents_scale`` granularity (the operator's money-like domain —
    TPC-H prices, ledger amounts).  Sub-granularity values are distorted
    by the rounding itself: 999.996 rounds to 100000 cents (digit 9 read
    as 1) and positive values below half a cent round to 0 and drop out.
    For such columns pass a larger ``cents_scale`` (any power of 10)
    that makes the values exact.

    Scale: ONE scan, one 9-key groupBy with map-side partials, totals as
    a 1-row broadcast.  No counterpart in the reference (SURVEY 2.1).
    """
    c = F.col(col).cast("double")
    cents = F.round(c * F.lit(cents_scale)).cast("long")
    pos = df.where(c.isNotNull()).select(cents.alias("_cents")).where(
        F.col("_cents") > 0
    )
    counts = pos.groupBy(
        F.substring(F.col("_cents").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("_total"))
    e = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("_total"), 6).alias("freq"),
        F.round(e, 6).alias("expected_freq"),
        F.round(
            F.pow(F.col("n") - F.col("_total") * e, F.lit(2.0))
            / (F.col("_total") * e),
            6,
        ).alias("chi2_term"),
    )


def exact_quantile_by_group(
    df: DataFrame,
    col: str,
    q: float,
    group_cols: Sequence[str],
    *,
    n_bins: int = 1024,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACT per-group linear-interpolation quantile (``quantile_cont`` /
    ``F.percentile`` semantics) with BOUNDED per-node state — the grouped
    form of :func:`exact_quantile`, and the 1e11-row scale path the
    single-buffer ``F.percentile`` in :func:`mad_outliers` cannot take
    (its per-group value map is unbounded on high-cardinality columns).

    Vectorized histogram narrowing: every round runs ONE scan that bins
    all still-active groups at once (each group against its own current
    [lo, hi] range, joined in as a broadcast n_groups-row table), then
    narrows each group's range around its two target order statistics
    (±1 bin slack, same drift armor as the global version).  The final
    pass anchors each group's rank with an exact ``count(v < lo)`` and
    interpolates the two order statistics with Spark Percentile's
    ``(hi-pos)·v0 + (pos-lo)·v1`` form.

    Driver state: the per-group range table (n_groups rows per round) —
    this operator is for grouped AUDITS where the group count is
    bounded (≤ ~1e5), while the per-group row/value counts are not.
    Rows with NULL values are excluded (a group with only NULLs is
    absent from the output — mirror any SQL twin with ``WHERE col IS
    NOT NULL``).  Output: ``(*group_cols, quantile)``.
    """
    import math

    g = list(group_cols)
    spark = df.sparkSession
    c = F.col(col).cast("double")
    base = (
        df.where(c.isNotNull() & ~F.isnan(c))
        .select(*g, c.alias("_v"))
        .persist()
    )
    try:
        return _exact_quantile_by_group_impl(
            base, q, g, spark, n_bins=n_bins, max_rounds=max_rounds
        )
    finally:
        # audits run repeatedly in long-lived sessions (ADVICE r4): without
        # this, every call leaks base's cached blocks for the session
        # lifetime.  The impl localCheckpoints its (n_groups)-row result
        # before we get here, so unpersisting cannot force a recompute.
        base.unpersist()


def _exact_quantile_by_group_impl(
    base: DataFrame,
    q: float,
    g: list,
    spark,
    *,
    n_bins: int,
    max_rounds: int,
) -> DataFrame:
    import math

    stats = {
        tuple(r[k] for k in g): {"n": r["n"], "lo": r["lo"], "hi": r["hi"]}
        for r in base.groupBy(*g)
        .agg(F.count("_v").alias("n"), F.min("_v").alias("lo"), F.max("_v").alias("hi"))
        .collect()
    }
    for s in stats.values():
        p = q * (s["n"] - 1)
        s["p"] = p
        s["k0"] = min(int(math.floor(p)), s["n"] - 1)
        frac = p - s["k0"]
        s["k1"] = min(s["k0"] + 1, s["n"] - 1) if frac > 0 else s["k0"]

    def ranges_df(keys):
        rows = [tuple(k) + (stats[k]["lo"], stats[k]["hi"]) for k in keys]
        schema = base.select(*g).schema.add("_lo", "double").add("_hi", "double")
        return spark.createDataFrame(rows, schema)

    active = [k for k, s in stats.items() if s["lo"] < s["hi"]]
    for _ in range(max_rounds):
        if not active:
            break
        rng = F.broadcast(ranges_df(active))
        width = F.col("_hi") - F.col("_lo")
        binned = (
            base.join(rng, g)
            .where((F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi")))
            .groupBy(
                *g,
                F.least(
                    F.lit(n_bins - 1),
                    F.floor((F.col("_v") - F.col("_lo")) / width * n_bins),
                ).cast("int").alias("_b"),
            )
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        below = {
            tuple(r[k] for k in g): r["_n"]
            for r in base.join(rng, g)
            .where(F.col("_v") < F.col("_lo"))
            .groupBy(*g)
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        }
        hists: dict[tuple, dict[int, int]] = {}
        for r in binned.collect():
            hists.setdefault(tuple(r[k] for k in g), {})[r["_b"]] = r["_cnt"]
        nxt = []
        for k in active:
            s = stats[k]
            hist = hists.get(k, {})
            width_v = (s["hi"] - s["lo"]) / n_bins
            if width_v <= 0 or not math.isfinite(width_v):
                continue
            cum, b0, b1 = below.get(k, 0), None, None
            for b in range(n_bins):
                cnt = hist.get(b, 0)
                if b0 is None and cum + cnt > s["k0"]:
                    b0 = b
                if b1 is None and cum + cnt > s["k1"]:
                    b1 = b
                    break
                cum += cnt
            if b0 is None:
                continue
            b1 = b1 if b1 is not None else n_bins - 1
            new_lo = s["lo"] + max(0, b0 - 1) * width_v
            new_hi = (
                s["lo"] + min(n_bins, b1 + 2) * width_v
                if b1 < n_bins - 1
                else s["hi"]
            )
            new_hi = min(new_hi, s["hi"])
            if new_lo <= s["lo"] and new_hi >= s["hi"]:
                continue
            s["lo"], s["hi"] = new_lo, new_hi
            in_range = sum(
                cnt for b, cnt in hist.items() if max(0, b0 - 1) <= b <= b1 + 1
            )
            if s["lo"] < s["hi"] and in_range > n_bins:
                nxt.append(k)
        active = nxt

    all_keys = list(stats)
    rng = F.broadcast(ranges_df(all_keys))
    below_df = (
        base.join(rng, g)
        .where(F.col("_v") < F.col("_lo"))
        .groupBy(*g)
        .agg(F.count(F.lit(1)).alias("_below"))
    )
    consts = spark.createDataFrame(
        [
            tuple(k) + (float(stats[k]["p"]), stats[k]["k0"], stats[k]["k1"])
            for k in all_keys
        ],
        base.select(*g).schema.add("_p", "double").add("_k0", "long").add("_k1", "long"),
    )
    w_cum = Window.partitionBy(*g).orderBy("_v")
    vals = (
        base.join(rng, g)
        .where((F.col("_v") >= F.col("_lo")) & (F.col("_v") <= F.col("_hi")))
        .groupBy(*g, "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_cum", F.sum("_cnt").over(w_cum))
        .join(below_df, g, "left")
        .na.fill({"_below": 0})
        .join(F.broadcast(consts), g)
        .where(F.col("_below") + F.col("_cum") > F.col("_k0"))
    )
    w_pick = Window.partitionBy(*g).orderBy("_v")
    picked = vals.withColumn("_rn", F.row_number().over(w_pick)).where(
        F.col("_rn") <= 2
    )
    per_group = picked.groupBy(*g).agg(
        F.first("_p").alias("_p"),
        F.first("_k0").alias("_k0"),
        F.first("_k1").alias("_k1"),
        F.min(F.struct("_rn", "_v")).alias("_s0"),
        F.max(F.struct("_rn", "_v")).alias("_s1"),
        F.min(F.when(F.col("_rn") == 1, F.col("_below") + F.col("_cum"))).alias(
            "_cum0"
        ),
    )
    v0 = F.col("_s0._v")
    # second candidate only needed when rank k1 lies beyond v0's run
    v1 = F.when(F.col("_cum0") > F.col("_k1"), v0).otherwise(F.col("_s1._v"))
    quantile = F.when(
        (F.col("_k1") == F.col("_k0")), v0
    ).otherwise(
        (F.col("_k0") + 1 - F.col("_p")) * v0 + (F.col("_p") - F.col("_k0")) * v1
    )
    # eager, tiny (n_groups rows): materializes before the caller's
    # finally-unpersist of base, truncating lineage so the cached input
    # can be dropped without a recompute
    out = per_group.select(*g, quantile.alias("quantile")).localCheckpoint()
    return out


def price_trend(
    lineitem: DataFrame, *, k: int = 20, min_rows: int = 5
) -> DataFrame:
    """Per-part OLS price-over-time slope in EXACT integer arithmetic,
    top-``k`` steepest risers — (l_partkey, n, slope_per_day).  The
    price-drift monitor: a part whose extended price trends hard against
    its peers flags re-pricing, data-entry drift, or a supplier squeeze.

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with x = days since epoch (exact INT) and y = price in CENTS (exact
    BIGINT via round(price·100)), so every sum, product, and difference
    is integer-exact on any engine and under any partitioning — the ONLY
    float op is the final cents→currency division, rounded to 6.  (At
    1e5+ rows per group the int64 headroom for n·Σxy runs out; the
    128-bit/decimal widening is the documented escape hatch.)

    Scale: ONE map-side-combinable groupBy on the part key carrying five
    integer aggregates; the top-k is an orderBy+limit
    (TakeOrderedAndProject — per-partition heads, never a global sort).
    No counterpart in the reference (SURVEY.md section 2.1).
    """
    x = F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01")).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    agg = (
        lineitem.select("l_partkey", x.alias("x"), y.alias("y"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .where(F.col("n") >= min_rows)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    scored = agg.where(den != 0).select(
        "l_partkey",
        "n",
        F.round(
            num.cast("double") / den.cast("double") / F.lit(100.0), 6
        ).alias("slope_per_day"),
    )
    return scored.orderBy(
        F.col("slope_per_day").desc(), F.col("l_partkey").asc()
    ).limit(k)


def return_rates_wilson(
    lineitem: DataFrame, part: DataFrame, *, z: float = 1.96
) -> DataFrame:
    """Per-brand return rate with the Wilson-score LOWER bound — (p_brand,
    n_lines, n_returned, rate, wilson_low), the shrinkage-aware ranking
    statistic: sorting suppliers/brands by raw return rate rewards tiny
    samples, while the Wilson lower bound (Agresti-Coull family) penalizes
    uncertainty so a 3/4 disaster doesn't outrank a 400/1000 one.

        wl = (p + z²/2n − z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n)

    Scale: one combinable groupBy on the ~25-value brand key after the
    part equi-join; everything downstream is per-row arithmetic on a
    vocabulary-sized table.

    Cross-engine: counts exact BIGINTs; the Wilson expression is a fixed
    IEEE tree (/,*,sqrt are correctly rounded) evaluated identically on
    both engines, rounded to 6.  No counterpart in the reference
    (SURVEY.md section 2.1).
    """
    agg = (
        lineitem.select("l_partkey", "l_returnflag")
        .join(
            part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias(
                "n_returned"
            ),
        )
    )
    n = F.col("n_lines").cast("double")
    p = F.col("n_returned").cast("double") / n
    zz = F.lit(float(z) * float(z))
    zl = F.lit(float(z))
    wl = (
        p
        + zz / (F.lit(2.0) * n)
        - zl * F.sqrt(p * (F.lit(1.0) - p) / n + zz / (F.lit(4.0) * n * n))
    ) / (F.lit(1.0) + zz / n)
    return agg.select(
        "p_brand",
        "n_lines",
        "n_returned",
        F.round(p, 6).alias("rate"),
        F.round(wl, 6).alias("wilson_low"),
    )


def revenue_concentration(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue share by customer nation plus the Herfindahl-Hirschman
    concentration index — (n_name, revenue, share, hhi), ``hhi`` the
    constant Σ share² (1/n_nations = perfectly even, 1 = single-market).
    The market-concentration audit: a corpus (or revenue base) dominated
    by one segment is a diversification risk the mixture/treasury review
    flags the same way.

    Scale: orders→customer→nation equi-joins (dims broadcastable), one
    combinable groupBy on the ~25-value nation key; money sums in
    DECIMAL(18,2) so the totals are exact under any partitioning (the
    repo's money recipe — never round a large double sum).

    Cross-engine: shares divide two exactly-equal DECIMAL-derived
    doubles; hhi folds the ROUNDED shares in ascending nation order (a
    ≤25-entry fold).  No counterpart in the reference (SURVEY.md
    section 2.1).
    """
    rev = (
        orders.select("o_custkey", "o_totalprice")
        .join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev")
        )
    )
    total = rev.agg(F.sum("_rev").alias("_total"))
    shared = rev.crossJoin(F.broadcast(total)).select(
        "n_name",
        F.col("_rev").cast("double").alias("revenue"),
        F.round(
            F.col("_rev").cast("double") / F.col("_total").cast("double"), 6
        ).alias("share"),
    )
    hhi = shared.groupBy().agg(
        F.round(
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "n_name",
                            (F.col("share") * F.col("share")).alias("s2"),
                        )
                    )
                ),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["s2"],
            ),
            6,
        ).alias("hhi")
    )
    return shared.crossJoin(F.broadcast(hhi))


def monthly_growth(orders: DataFrame) -> DataFrame:
    """Monthly revenue trend with month-over-month growth — (month,
    n_orders, revenue, mom_growth): the BI staple that anchors every
    finance review.  First month reports NULL growth.

    Scale: one combinable groupBy on the ~bounded month key (a century
    of months is 1200 rows); the lag window orders the POST-AGGREGATE
    months table — bounded, waived like the other <=n_buckets prefix
    windows.  Money sums in DECIMAL(18,2) (exact under any
    partitioning); growth divides two exact decimals cast to double,
    rounded to 6.  No counterpart in the reference (SURVEY.md
    section 2.1).
    """
    monthly = (
        orders.select(
            F.trunc(F.to_date("o_orderdate"), "month").alias("month"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("_p"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_p").alias("_rev"),
        )
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("_prev", F.lag("_rev").over(w))
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            "n_orders",
            F.col("_rev").cast("double").alias("revenue"),
            F.round(
                (F.col("_rev") - F.col("_prev")).cast("double")
                / F.col("_prev").cast("double"),
                6,
            ).alias("mom_growth"),
        )
    )


def single_source_risk(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Supply-chain concentration audit: per brand, how many traded parts
    are single-sourced — (p_brand, n_parts, n_single_sourced, risk_frac).
    A part observed with exactly ONE distinct supplier across all
    lineitems has no fallback when that supplier fails; the brand-level
    fraction is the procurement-risk heat map.

    Scale: one (partkey)-keyed groupBy counting distinct suppliers
    (cascaded partial-distinct aggregation, combinable), one broadcastable
    part-dim join, one ~25-value brand rollup.  All counts exact BIGINTs;
    the fraction is one rounded division.  No counterpart in the
    reference (SURVEY.md section 2.1).
    """
    per_part = (
        lineitem.select("l_partkey", "l_suppkey")
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
    )
    return (
        per_part.join(
            part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum((F.col("_ns") == 1).cast("long")).alias("n_single_sourced"),
        )
        .select(
            "p_brand",
            "n_parts",
            "n_single_sourced",
            F.round(
                F.col("n_single_sourced").cast("double") / F.col("n_parts"), 6
            ).alias("risk_frac"),
        )
    )
