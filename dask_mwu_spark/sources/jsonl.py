"""JSONL (JSON-lines) source/sink — the interchange format LLM corpus
pipelines actually speak (one document object per line, sharded, usually
gzipped).  No reference counterpart (its IO is zarr+parquet); this closes
the ingest/egress loop: parquet in-pipeline, JSONL at the edges.

Spark-first: ``spark.read.json`` / ``df.write.json`` are native JVM
line-sources — splittable, schema-projected at the scanner, no Python in
the row path.  The two deliberate policies:

- READ with an explicit schema, always.  Schema inference is a full extra
  pass over 100 TB and silently unions drifting shapes; requiring the
  schema makes drift a loud error instead.  ``PERMISSIVE`` mode plus
  ``_corrupt_record`` capture quarantines bad lines without killing the
  job (count them; don't crash at hour nine of ten).
- WRITE sharded by a deterministic hash of a stable id, optionally
  sorted within each shard: reproducible shard membership across reruns
  (retry-safe, diffable), one file per shard, gzip by default (JSONL's
  ~4-8x).  ``repartition(n, hash)`` then ``sortWithinPartitions`` is
  exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    quarantine: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL read.  With ``quarantine`` the returned frame
    carries a ``_corrupt_record`` column holding the raw line for rows that
    failed the schema (NULL for good rows) — filter/count it downstream;
    without, bad lines become all-NULL rows silently (Spark PERMISSIVE).

    Spark refuses a query that reads ONLY ``_corrupt_record`` from a raw
    JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); ``.cache()`` the frame
    (or select a data column alongside) before a bad-line count."""
    full = schema
    if quarantine:
        full = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    shard_by: str,
    n_shards: int,
    sort_within: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """Deterministic sharded JSONL write: shard = hash(shard_by) % n_shards
    via ``repartition(n, col)`` (Spark's hash partitioner — stable across
    runs for the same key set), one output file per shard, optional
    in-shard sort for diffable/seekable output.  ONE shuffle total."""
    out = df.repartition(n_shards, F.col(shard_by))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
