"""Round-7 hardening gates: the tracked-persist registry
(``dask_mwu_spark.cache``, the ADVICE-r6 shared fix for per-invocation
cache leaks in the IVF/LSH/dedup operators) and its release contract,
plus the DOCS.md drift gate (VERDICT r6 item 4)."""

import importlib.util
import os

from dask_mwu_spark import release_caches, tracked_count
from dask_mwu_spark.cache import jvm_cached_count
from dask_mwu_spark.sources.loaders import load_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_md_is_current():
    """VERDICT r6 item 4: DOCS.md must exactly match what
    tools/gen_docs.py regenerates from the package's public functions —
    a new/renamed/undocumented public function fails here until the
    index is regenerated (same discipline as the PLANS.md sweep)."""
    spec = importlib.util.spec_from_file_location(
        "gen_docs", os.path.join(REPO, "tools", "gen_docs.py")
    )
    gen_docs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_docs)
    text = open(os.path.join(REPO, "DOCS.md")).read()
    header = text.split(gen_docs.MARKER)[0]
    regenerated = header + gen_docs.tables()
    assert text == regenerated, (
        "DOCS.md is stale — run `python tools/gen_docs.py` after "
        "adding/renaming public functions"
    )


def test_release_caches_drops_ivf_index_blocks(spark, sf_dir):
    from dask_mwu_spark.operators.similarity import ivf_topk

    release_caches()  # clean slate from earlier tests in the session
    before = jvm_cached_count(spark)
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    out = ivf_topk(emb, n_queries=4, k=3)
    n_rows = out.count()  # materialize so the index is actually cached
    assert n_rows > 0
    assert tracked_count() >= 1
    assert jvm_cached_count(spark) > before
    released = release_caches()
    assert released >= 1
    assert tracked_count() == 0
    assert jvm_cached_count(spark) <= before
    # the returned plan stays VALID after release (lineage recomputes)
    assert out.count() == n_rows


def test_release_caches_idempotent_and_empty_safe(spark):
    release_caches()
    assert release_caches() == 0
    assert tracked_count() == 0


def test_value_histogram_excludes_nulls(spark):
    from dask_mwu_spark.operators.audit import value_histogram

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], "v: double"
    )
    out = value_histogram(df, "v", n_bins=2).toPandas().set_index("bin")
    assert int(out.n_rows.sum()) == 2  # the NULL row is not counted
    const = spark.createDataFrame(
        [(5.0,), (5.0,), (None,), (None,)], "v: double"
    )
    out2 = value_histogram(const, "v", n_bins=2).toPandas()
    assert len(out2) == 1 and int(out2.n_rows.iloc[0]) == 2


def test_chi2_dof_ignores_null_categories(spark):
    """NULL category rows are excluded, so dof reflects the real table
    shape (pre-fix: NULL joined the cells but not countDistinct, giving
    dof=0 and a withheld p for a true 2x3 table)."""
    from dask_mwu_spark.operators.audit import chi2_independence

    rows = [("x", b) for b in "ppqqrr"] + [(None, b) for b in "pqr"]
    rows += [("y", b) for b in "pqr" * 2]
    df = spark.createDataFrame(rows, "a: string, b: string")
    out = chi2_independence(df, "a", "b").toPandas().iloc[0]
    assert out.n_a == 2 and out.n_b == 3 and out.dof == 2
    assert out.n_obs == 12  # the 3 NULL-category rows excluded
    assert out.p_value == out.p_value  # not NaN/None: dof==2 gate open


def test_ks_excludes_null_values(spark):
    """A NULL cannot occupy a CDF position: identical non-null values
    with asymmetric NULL mass must give D == 0 (pre-fix the NULL row
    was a CDF step and D measured missingness)."""
    from dask_mwu_spark.operators.audit import ks_two_sample

    rows = [("f", "A", float(v)) for v in range(10)]
    rows += [("f", "B", float(v)) for v in range(10)]
    rows += [("f", "A", None)] * 5  # NULL mass only in group A
    m = spark.createDataFrame(rows, "feature: string, group: string, value: double")
    out = ks_two_sample(m, "A", "B").toPandas().iloc[0]
    assert out.d_stat == 0.0
    assert out.n1 == 10 and out.n2 == 10


def test_zarr_rejects_filtered_stores(tmp_path):
    import json

    from dask_mwu_spark.sources.zarr_convert import read_meta

    meta = {
        "zarr_format": 2,
        "shape": [4, 4],
        "chunks": [2, 2],
        "dtype": "<f8",
        "order": "C",
        "compressor": None,
        "filters": [{"id": "delta", "dtype": "<f8"}],
        "fill_value": 0,
    }
    (tmp_path / ".zarray").write_text(json.dumps(meta))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="filters"):
        read_meta(str(tmp_path))


def test_ts_us_is_true_floor_division(spark):
    """ts_us must match Python // for NEGATIVE (pre-epoch) nanos too —
    the streaming twins fold with int(ts) // 1000 (round-7 review fix:
    decimal-divide+cast truncated toward zero, one µs high pre-epoch)."""
    from dask_mwu_spark.streaming.events import ts_us

    vals = [-1500, -1000, -999, -1, 0, 1, 999, 1000, 1500,
            1765432100123456789]
    df = spark.createDataFrame([(v,) for v in vals], "ts: long")
    got = {
        r.ts: r.us for r in df.select("ts", ts_us("ts").alias("us")).collect()
    }
    for v in vals:
        assert got[v] == v // 1000, (v, got[v], v // 1000)


def test_read_upsert_table_keeps_non_U_ops_and_legacy_tables(spark, tmp_path):
    """Only explicit deletes are tombstones: Debezium-style 'c'/'I' and
    NULL ops are live rows; a legacy flat table without _op reads whole."""
    import pandas as pd

    from dask_mwu_spark.sources import manifest as mf
    from dask_mwu_spark.streaming.events import read_upsert_table

    root = str(tmp_path / "t")
    d = mf.new_data_dir(root, tag="b0")
    pdf = pd.DataFrame(
        {
            "k": [1, 2, 3, 4, 5],
            "_seq": [1, 1, 1, 1, 1],
            "_op": ["U", "I", "c", None, "D"],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)
    mf.publish_version(root, d)
    live = read_upsert_table(spark, root).toPandas()
    assert sorted(live.k) == [1, 2, 3, 4]  # only the delete is hidden

    legacy = str(tmp_path / "flat")
    spark.createDataFrame(pdf[["k", "_seq"]]).write.parquet(legacy)
    assert read_upsert_table(spark, legacy).count() == 5


def test_bucketed_overwrite_handles_db_qualified_stale_location(spark, sf_dir):
    """A stale warehouse dir at <db>.db/<table> (fresh catalog, persisted
    warehouse) must be cleaned before saveAsTable (round-7 review fix:
    the cleanup probed warehouse/<db>.<table> and missed it)."""
    import os

    from dask_mwu_spark.sources.bucketed import write_bucketed_table
    from dask_mwu_spark.sources.loaders import load_table

    spark.sql("CREATE DATABASE IF NOT EXISTS r7db")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    stale = os.path.join(warehouse, "r7db.db", "nation_b")
    os.makedirs(stale, exist_ok=True)
    open(os.path.join(stale, "junk"), "w").write("stale")
    spark.sql("DROP TABLE IF EXISTS r7db.nation_b")  # catalog forgot it
    df = load_table(spark, sf_dir, "nation")
    write_bucketed_table(
        df, "r7db.nation_b", bucket_cols=("n_nationkey",), n_buckets=4
    )
    assert spark.table("r7db.nation_b").count() == df.count()
    spark.sql("DROP TABLE r7db.nation_b")


def test_bh_adjust_keeps_null_p_null(spark):
    """NaN-propagate contract through BH (round-7 review fix): a NULL
    p-value must stay NULL in p_adjusted — least(1.0, NULL) silently
    returned 1.0 — while non-null rows keep statsmodels semantics
    (m = total row count, NULLs sorted last and ignored by min)."""
    from dask_mwu_spark.operators.mwu import bh_adjust

    df = spark.createDataFrame(
        [("g", "f1", 0.01), ("g", "f2", 0.04), ("g", "f3", None)],
        "group: string, feature: string, p_value: double",
    )
    out = (
        bh_adjust(df).toPandas().set_index("feature").p_adjusted
    )
    assert out["f3"] != out["f3"] or out["f3"] is None  # NULL/NaN stays
    # m=3 (statsmodels input length): adj(f1)=min(0.01*3/1, 0.04*3/2)=0.03
    assert abs(out["f1"] - 0.03) < 1e-12
    assert abs(out["f2"] - 0.06) < 1e-12


def test_chunk_documents_no_fully_contained_trailing_chunk(spark):
    """n_tokens in (stride, stride+overlap] must yield ONE chunk (the
    old bound emitted a second chunk fully contained in the first)."""
    from dask_mwu_spark.operators.text import chunk_documents

    doc25 = " ".join(f"t{i}" for i in range(25))   # 25 tokens
    doc33 = " ".join(f"t{i}" for i in range(33))   # 33: real 2nd chunk
    docs = spark.createDataFrame(
        [(1, doc25), (2, doc33)], "doc_id: long, text: string"
    )
    out = chunk_documents(docs, chunk_tokens=32, overlap=8).toPandas()
    assert len(out[out.doc_id == 1]) == 1
    two = out[out.doc_id == 2].sort_values("chunk_id")
    assert len(two) == 2
    # the second chunk carries at least one token beyond the first
    assert two.iloc[1].chunk_start + two.iloc[1].n_chunk_tokens == 33


def test_winnow_selects_only_full_window_minima(spark):
    """Exactly n_grams - window + 1 full windows select fingerprints; a
    doc shorter than window k-grams still yields >= 1 fingerprint."""
    from dask_mwu_spark.operators.text import winnow_fingerprints

    long_doc = "abcdefghijkl"   # 12 chars -> 5 grams of k=8 -> 2 full win
    short_doc = "abcdefghi"     # 9 chars -> 2 grams < window=4 -> 1 win
    docs = spark.createDataFrame(
        [(1, long_doc), (2, short_doc)], "doc_id: long, text: string"
    )
    out = (
        winnow_fingerprints(docs, k=8, window=4)
        .toPandas()
        .set_index("doc_id")
    )
    # doc 1: mins over the 2 full windows — at most 2 distinct fps, and
    # never the 5 the partial-window bug produced
    assert out.loc[1].n_fingerprints <= 2
    assert out.loc[2].n_fingerprints >= 1


def test_mixture_kl_reports_undelivered_target_sources(spark):
    from dask_mwu_spark.operators.curation import mixture_kl

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e", "s1")],
        "doc_id: long, text: string, source: string",
    )
    out = (
        mixture_kl(docs, {"s1": 1.0, "s_missing": 1.0})
        .toPandas()
        .set_index("source")
    )
    assert out.loc["s_missing"].n_tokens == 0
    assert out.loc["s_missing"].actual_share == 0.0
    assert out.loc["s_missing"].kl_term == 0.0  # x·ln x -> 0 limit
    assert out.loc["s1"].n_tokens == 5


def test_calibrated_quality_rejects_approx_histogram(spark, sf_dir):
    import pytest as _pytest

    from dask_mwu_spark.operators.curation import calibrated_quality_filter
    from dask_mwu_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    with _pytest.raises(ValueError, match="histogram"):
        calibrated_quality_filter(docs, exact=False, method="histogram")


def test_weighted_sample_tiebreak_is_hash_not_id_order(spark):
    """All-equal weights on a tiny range produce heavy key ties; the
    winner set must NOT be the ascending-id prefix (the old bias)."""
    from dask_mwu_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame(
        [(i, "x", 10**7) for i in range(200)],
        "doc_id: long, text: string, n_chars: long",
    )
    out = weighted_sample(docs, k=10)
    got = sorted(r.doc_id for r in out.collect())
    assert len(got) == 10
    assert got != list(range(10))  # not the small-id prefix
    # deterministic: same input -> same sample
    again = sorted(r.doc_id for r in weighted_sample(docs, k=10).collect())
    assert got == again


def test_trained_ivf_pq_registers_its_persist(spark, sf_dir):
    """The specific ADVICE-r6 site: ivf_pq_topk_trained's posting-list
    persist must be releasable instead of leaking for the session."""
    from dask_mwu_spark.operators.similarity import ivf_pq_topk_trained

    release_caches()
    emb = load_table(spark, sf_dir, "embeddings").limit(48)
    out = ivf_pq_topk_trained(emb, n_queries=3, k=2, n_train=48)
    assert out.count() >= 0
    assert tracked_count() >= 1
    assert release_caches() >= 1
