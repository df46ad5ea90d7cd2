"""Bucketed-table sink: pre-shuffled storage for repeat-join workloads.

At the 100 TB design point the dominant cost of a fact-to-fact join is the
shuffle of both sides. Hash-bucketing a table ON WRITE (`bucketBy` +
`sortBy` + `saveAsTable`) stores it pre-partitioned by the join key, so
every later join or aggregation on that key reads co-located buckets and
plans NO Exchange at all — the write-once/join-many amortization that
interactive pipelines (dedup against a reference corpus, repeated
per-feature joins) want. Verified by tests/test_bucketing.py, which asserts
the joined physical plan contains zero Exchange nodes.

The reference has no counterpart (single-pipeline tool, SURVEY.md
section 2.1) — this is engine-level capability the Spark port adds.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    *,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table. Joins/aggregations between tables bucketed the same way
    on the same keys run shuffle-free."""
    spark = df.sparkSession
    if mode == "overwrite":
        # the in-memory catalog forgets tables between sessions, but the
        # warehouse directory persists — drop both or saveAsTable fails
        # with LOCATION_ALREADY_EXISTS on a stale location
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[5:]
        # managed-table location: warehouse/<table> for the default
        # database, warehouse/<db>.db/<table> for a qualified name
        # (round-7 review fix: the unqualified form missed db-qualified
        # stale locations, reproducing LOCATION_ALREADY_EXISTS)
        parts = name.lower().split(".")
        rel = (
            os.path.join(f"{parts[-2]}.db", parts[-1])
            if len(parts) > 1
            else parts[0]
        )
        loc = os.path.join(warehouse, rel)
        if warehouse and os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a managed (bucketed) table back; bucket metadata comes from the
    catalog, so downstream plans see the hash-partitioned distribution."""
    return spark.table(name)
