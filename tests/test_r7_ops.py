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
