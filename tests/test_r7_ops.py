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
