"""Partition-layout invariance for the extension operators — the SURVEY.md
section 5.3 chunk-invariance sweep applied to dedup/similarity/text/
multimodal: results must be identical under any input partitioning and any
shuffle-partition count."""

import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.operators import dedup as dd
from dask_mwu_spark.operators import multimodal as mm
from dask_mwu_spark.operators import similarity as sim
from dask_mwu_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("parts", [1, 7])
def test_dedup_ops_partition_invariant(spark, docs, parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        repart = docs.repartition(parts)
        assert _rows(dd.minhash_lsh_pairs(repart, est_threshold=0.25)) == _rows(
            dd.minhash_lsh_pairs(docs, est_threshold=0.25)
        )
        assert _rows(dd.simhash(repart)) == _rows(dd.simhash(docs))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("parts", [1, 7])
def test_similarity_and_text_partition_invariant(spark, docs, emb, parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        assert _rows(sim.cosine_topk(emb.repartition(parts), n_queries=5, k=3)) == _rows(
            sim.cosine_topk(emb, n_queries=5, k=3)
        )
        assert _rows(sim.ivf_topk(emb.repartition(parts), n_queries=5, k=3)) == _rows(
            sim.ivf_topk(emb, n_queries=5, k=3)
        )
        assert _rows(tx.winnow_fingerprints(docs.repartition(parts))) == _rows(
            tx.winnow_fingerprints(docs)
        )
        assert _rows(
            mm.sample_frames(mm.attach_payload(docs.repartition(parts)))
        ) == _rows(mm.sample_frames(mm.attach_payload(docs)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
