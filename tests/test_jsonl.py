"""JSONL source/sink: round-trip fidelity, deterministic sharding,
corrupt-line quarantine."""

import glob
import os

from pyspark.sql import functions as F

from dask_mwu_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    write_jsonl,
)
from dask_mwu_spark.sources.loaders import load_table


def test_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, shard_by="doc_id", n_shards=4, sort_within=["doc_id"])
    back = read_jsonl(spark, out, DOCUMENTS_SCHEMA).drop("_corrupt_record")
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    assert len(glob.glob(os.path.join(out, "part-*.json.gz"))) == 4


def test_sharding_deterministic(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    outs = []
    for run in ("a", "b"):
        out = str(tmp_path / f"run_{run}")
        write_jsonl(
            docs, out, shard_by="doc_id", n_shards=4,
            sort_within=["doc_id"], compression=None,
        )
        shard_contents = {}
        for f in sorted(glob.glob(os.path.join(out, "part-*.json"))):
            with open(f) as fh:
                shard_contents[os.path.basename(f).split("-")[1]] = fh.read()
        outs.append(shard_contents)
    assert outs[0] == outs[1]  # same doc -> same shard -> same bytes, rerun-safe


def test_corrupt_line_quarantine(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "fine", "lang": "en", "source": "s", "n_chars": 4}\n'
    )
    # Spark disallows querying ONLY _corrupt_record from a raw JSON scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache() is the documented out
    df = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA).cache()
    bad = df.where(F.col("_corrupt_record").isNotNull())
    good = df.where(F.col("_corrupt_record").isNull())
    assert bad.count() == 1
    assert bad.collect()[0]["_corrupt_record"].startswith("this is not")
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
