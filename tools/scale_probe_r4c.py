"""Round-4c operator scale probe: bigram LM scoring, containment
verification, reconciliation audit, MAD outliers.

What each probe is meant to show:
- lm_bigram_score: three scan-stage token/bigram branches (uni counts, bi
  counts, probe stream) + two shuffle equi-joins on the bigram key + the
  per-doc position-ordered fold; time ~linear in corpus tokens (run at
  n/4 and n, ratio ~4x).  The count tables stay distributed — nothing is
  broadcast or collected, so vocabulary size only affects shuffle width.
- containment_pairs: identical asymptotics to verify_jaccard (LSH-bounded
  candidates, two equi-joins); probe reports wall + pair counts so the
  extra containment column is shown to cost nothing over the Jaccard
  verify.
- reconcile_sum: ONE child groupBy + ONE parent join at 20M child rows —
  scan-bound; per-parent fold state bounded by fan-out (7 here).
- mad_outliers: two grouped exact percentiles + join-back on a
  5-value group key; the probe documents the per-group percentile state
  (distinct values per group) as the scale knob.

Usage: python tools/scale_probe_r4c.py [n_docs] [n_child]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import audit as au
from dask_mwu_spark.operators import dedup as dd
from dask_mwu_spark.operators import text as tx
from dask_mwu_spark.session import get_spark
from tools.scale_probe_curation import synth_docs


def timed(name, df, extra=None):
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
    rec = {"metric": f"r4c_probe_{name}", "value": runs[-1], "cold": runs[0],
           "unit": "sec"}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def grouped_quantile_probe(spark, n_rows: int = 20_000_000):
    """Grouped exact quantile: single-buffer percentile vs histogram
    narrowing at 20M rows / 5 groups / ~1M distinct values per group,
    with a 20% tie mass per group (adversarial for narrowing)."""
    import time as _t

    from pyspark.sql import functions as F

    from dask_mwu_spark.operators.audit import exact_quantile_by_group

    values = spark.range(n_rows).select(
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(5))).alias("g"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(5)) == 0, F.lit(42.0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)) / 10.0)
        .alias("v"),
    ).persist()
    values.count()
    t0 = _t.time()
    a = (
        values.groupBy("g")
        .agg(F.percentile(F.col("v"), F.lit(0.9)).alias("q"))
        .collect()
    )
    t_pct = round(_t.time() - t0, 2)
    t0 = _t.time()
    b = exact_quantile_by_group(values, "v", 0.9, ["g"]).collect()
    t_hist = round(_t.time() - t0, 2)
    assert {r["g"]: r["q"] for r in a} == {r["g"]: r["quantile"] for r in b}
    print(json.dumps({
        "metric": "r4c_probe_grouped_quantile", "unit": "sec",
        "percentile_single_buffer": t_pct, "histogram_narrowing": t_hist,
        "n_rows": n_rows, "identical": True,
    }), flush=True)
    values.unpersist()


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_child = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark("scale-probe-r4c")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).persist()
    docs.count()

    # the LM probe needs a REALISTIC vocabulary: the curation corpus's
    # ~200-word vocab makes the bigram count table degenerate (42k keys ->
    # AQE broadcasts it and the probe measures a plan real text never
    # gets).  Zipf-ish 50k-word vocab: 90% of tokens from the top-1k head,
    # 10% from the 49k tail -> the bigram table has millions of keys and
    # the count-table joins are real shuffles, like production text.
    def zipf_docs(n):
        def word(i):
            h = F.xxhash64(F.col("id") * 1000 + F.lit(i))
            h2 = F.xxhash64(F.col("id") * 1000 + F.lit(i), F.lit(7))
            return F.concat(
                F.lit("w"),
                F.when(F.pmod(h, F.lit(10)) < 9, F.pmod(h2, F.lit(1000)))
                .otherwise(F.lit(1000) + F.pmod(h2, F.lit(49000))),
            )
        words = F.array(*[word(i) for i in range(50)])
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("src0").alias("source"),
            F.lit(0).cast("long").alias("n_chars"),
        )

    zq = zipf_docs(n_docs // 4).persist(); zq.count()
    zf = zipf_docs(n_docs).persist(); zf.count()
    timed("lm_bigram_quarter", tx.lm_bigram_score(zq),
          {"n_docs": n_docs // 4, "vocab": 50_000})
    timed("lm_bigram_full", tx.lm_bigram_score(zf),
          {"n_docs": n_docs, "vocab": 50_000})
    zq.unpersist(); zf.unpersist()

    cont = dd.containment_pairs(docs, est_threshold=0.25, threshold=0.5)
    timed("containment_pairs", cont, {"n_docs": n_docs,
                                      "n_pairs": cont.count()})

    # 20M child rows over ~2.9M parents (fan-out 7), 3 status groups
    child = spark.range(n_child).select(
        (F.col("id") / 7).cast("long").alias("ck"),
        F.pmod(F.col("id"), F.lit(7)).cast("int").alias("ln"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 100.0).alias("amt"),
    )
    parent = spark.range(n_child // 7 + 1).select(
        F.col("id").alias("pk"),
        (F.pmod(F.xxhash64("id"), F.lit(700_000)) / 100.0 + 3500.0).alias(
            "total"
        ),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(3))).alias("grp"),
    )
    timed(
        "reconcile_20m_children",
        au.reconcile_sum(
            parent, child, parent_key="pk", child_key="ck",
            parent_total="total", child_amount=F.col("amt"),
            child_order="ln", group_col="grp",
        ),
        {"n_child": n_child},
    )

    values = spark.range(n_child).select(
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(5))).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100_000)) / 100.0).alias(
            "v"
        ),
    )
    timed("mad_outliers_20m", au.mad_outliers(values, "v", ["g"]),
          {"n_rows": n_child, "distinct_per_group": 100_000})

    grouped_quantile_probe(spark, n_child)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
