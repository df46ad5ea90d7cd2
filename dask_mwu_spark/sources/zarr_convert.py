"""Zarr v2 → long-parquet migration: the reference's actual on-disk source.

The reference reads a chunked dense 2-D zarr counts matrix (obs × vars)
plus parquet obs/vars metadata (reference: scratch/rank_gene_groups.py:112,
116, 127) and later round-trips ranks through zarr again (:244-252).  This
repo's engine consumes the long ``(obs_id, group, feature, value)`` parquet
encoding instead (sources/loaders.py, SURVEY.md S1) — this module is the
bridge for a user migrating off the reference: a DISTRIBUTED one-shot
converter from their existing zarr store to the long table every operator
here runs on.

Zarr v2 is a deliberately simple PUBLIC format (zarr-specs v2): a store is
a directory with a ``.zarray`` JSON (shape, chunks, dtype, compressor,
order, fill_value) and one file per chunk named ``i.j`` for the C-order
chunk-grid indices; each chunk holds the compressed raw C-order array
bytes of a full chunk (edge chunks are padded to full chunk shape); a
MISSING chunk file means the chunk is entirely ``fill_value``.  The reader
below implements that subset directly (dtype via the numpy type string,
``zlib``/``gzip`` numcodecs or uncompressed), so the converter has zero
dependencies beyond numpy — and a ``zarr``-written store of the same
profile reads identically (cross-checked in pytest when zarr is
importable).  Blosc-compressed stores need the blosc codec — re-write with
``compressor=zlib`` from the reference environment first (one dask call).

Scale design (a 100 TB matrix is ~1e6+ chunks):
- The chunk GRID — not the data — is parallelized: a tiny (i, j) key
  DataFrame is repartitioned across the cluster and each task reads,
  inflates and melts only its own chunk files from shared storage
  (mapInPandas, Arrow-batched out).  No driver-side array ever exists.
- Group labels / feature names are JOINED in Spark afterwards: vars
  (features) broadcast; obs joined on obs_idx — a plain shuffle equi-join
  that AQE handles, never a driver-side lookup table of 1e8 cells.
- Output is partitioned parquet ready for ``load_table``-style scans.
"""

from __future__ import annotations

import json
import os
import zlib
from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_meta(store: str) -> dict:
    """Parse and validate ``.zarray`` for the supported profile."""
    with open(os.path.join(store, ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2:
        raise ValueError(f"unsupported zarr_format {meta.get('zarr_format')}")
    if len(meta["shape"]) != 2:
        raise ValueError("converter handles 2-D (obs x vars) matrices")
    if meta.get("order", "C") != "C":
        raise ValueError("F-order zarr unsupported — rechunk to C order")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in ("zlib", "gzip"):
        raise ValueError(
            f"unsupported compressor {comp.get('id')!r} — re-write the "
            "store with zlib/gzip/raw (blosc needs the blosc codec)"
        )
    # filters run BEFORE the compressor in the zarr codec chain; silently
    # ignoring them would np.frombuffer filtered bytes as raw values
    # (e.g. delta residuals read as absolute counts) — corrupt output
    # with no exception, the one failure mode worse than refusing
    if meta.get("filters"):
        ids = [f.get("id") for f in meta["filters"]]
        raise ValueError(
            f"unsupported zarr filters {ids!r} — re-write the store "
            "without filters (every other unsupported profile raises "
            "here too; silent reinterpretation is not an option)"
        )
    np.dtype(meta["dtype"])  # raises on junk
    return meta


def _chunk_grid(meta: dict) -> list[tuple[int, int]]:
    (n_obs, n_vars), (c_obs, c_vars) = meta["shape"], meta["chunks"]
    return [
        (i, j)
        for i in range((n_obs + c_obs - 1) // c_obs)
        for j in range((n_vars + c_vars - 1) // c_vars)
    ]


def read_chunk(store: str, meta: dict, i: int, j: int) -> np.ndarray:
    """One decoded chunk, edge-trimmed to its real extent; a missing chunk
    file is fill_value (per spec)."""
    (n_obs, n_vars), (c_obs, c_vars) = meta["shape"], meta["chunks"]
    rows = min(c_obs, n_obs - i * c_obs)
    cols = min(c_vars, n_vars - j * c_vars)
    path = os.path.join(store, f"{i}.{j}")
    dt = np.dtype(meta["dtype"])
    if not os.path.exists(path):
        fill = meta.get("fill_value")
        return np.full((rows, cols), 0 if fill is None else fill, dtype=dt)
    with open(path, "rb") as fh:
        raw = fh.read()
    if meta.get("compressor") is not None:
        # numcodecs zlib writes raw zlib; gzip writes a gzip member —
        # zlib with wbits=47 auto-detects both
        raw = zlib.decompress(raw, wbits=47)
    arr = np.frombuffer(raw, dtype=dt).reshape(c_obs, c_vars)
    return arr[:rows, :cols]


def write_store(
    store: str,
    arr: np.ndarray,
    *,
    chunks: tuple[int, int],
    compressor: str | None = "zlib",
) -> None:
    """Write a zarr v2 store of the supported profile (test fixtures and
    the inverse migration demo).  Edge chunks are zero-padded to full
    chunk shape per spec."""
    os.makedirs(store, exist_ok=True)
    comp = {"id": "zlib", "level": 6} if compressor == "zlib" else None
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": comp,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(store, ".zarray"), "w") as fh:
        json.dump(meta, fh)
    c_obs, c_vars = chunks
    for i in range((arr.shape[0] + c_obs - 1) // c_obs):
        for j in range((arr.shape[1] + c_vars - 1) // c_vars):
            block = arr[i * c_obs : (i + 1) * c_obs, j * c_vars : (j + 1) * c_vars]
            full = np.zeros((c_obs, c_vars), dtype=arr.dtype)
            full[: block.shape[0], : block.shape[1]] = block
            raw = full.tobytes()
            if comp is not None:
                raw = zlib.compress(raw, comp["level"])
            with open(os.path.join(store, f"{i}.{j}"), "wb") as fh:
                fh.write(raw)


def melt_store(spark: SparkSession, store: str) -> DataFrame:
    """Distributed zarr → long (obs_idx, var_idx, value): parallelize the
    CHUNK GRID, each task decodes its own chunk files from shared storage.
    NaNs are kept (the MWU rank propagates them by design)."""
    meta = read_meta(store)
    grid = _chunk_grid(meta)
    c_obs, c_vars = meta["chunks"]
    keys = spark.createDataFrame(grid, "ci int, cj int").repartition(
        min(len(grid), spark.sparkContext.defaultParallelism * 2)
    )

    def _melt(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for ci, cj in zip(pdf["ci"], pdf["cj"]):
                block = read_chunk(store, meta, int(ci), int(cj))
                rows, cols = block.shape
                oi, vi = np.mgrid[0:rows, 0:cols]
                yield pd.DataFrame(
                    {
                        "obs_idx": (oi + int(ci) * c_obs).ravel().astype("int64"),
                        "var_idx": (vi + int(cj) * c_vars).ravel().astype("int64"),
                        "value": block.astype("float64").ravel(),
                    }
                )

    return keys.mapInPandas(
        _melt, schema="obs_idx long, var_idx long, value double"
    )


def _with_pos_index(df: DataFrame, name: str) -> DataFrame:
    """Positional (file/row-order) 0-based index WITHOUT a global sort:
    per-partition row_number + broadcast exclusive partition offsets (the
    offsets table is n_partitions rows, so ITS window is trivially small).
    Matches ``pd.read_parquet`` row order — parquet scan partitions follow
    file/split order and rows keep order within a partition.  This is how
    the positional obs/vars indices the zarr matrix implies line up with
    row-count-scale metadata on a cluster (a bare global row_number would
    be a single task over every row — the anti-pattern the plan sweep
    rejects)."""
    from pyspark.sql import Window

    d = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
        )
        - 1,
    )
    offs = (
        d.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn(name, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def convert(
    spark: SparkSession,
    *,
    counts_store: str,
    obs_file: str,
    vars_file: str,
    group_col: str,
    out_path: str | None = None,
    feature_col: str | None = None,
) -> DataFrame:
    """Full migration: zarr counts + obs/vars parquet → the long
    ``(obs_id, group, feature, value)`` table the MWU pipeline scans
    (plans/pipeline.rank_features_by_group).  Returns the DataFrame;
    writes parquet when ``out_path`` is given.

    vars (features) broadcast-join; obs joins on the shuffled obs_idx key
    (row-count-scale metadata must not broadcast).  Mirrors the
    reference's read_data length validations (rank_gene_groups.py:119,131).
    """
    meta = read_meta(counts_store)
    n_obs, n_vars = meta["shape"]
    obs = spark.read.parquet(obs_file)
    vars_df = spark.read.parquet(vars_file)
    if obs.count() != n_obs:
        raise ValueError(
            f"obs rows != matrix rows ({n_obs}) in {obs_file}"
        )
    if vars_df.count() != n_vars:
        raise ValueError(
            f"vars rows != matrix cols ({n_vars}) in {vars_file}"
        )
    obs_i = _with_pos_index(obs, "obs_idx").select(
        "obs_idx", F.col(group_col).cast("string").alias("group")
    )
    fcol = feature_col or vars_df.columns[0]
    vars_i = _with_pos_index(vars_df, "var_idx").select(
        "var_idx", F.col(fcol).cast("string").alias("feature")
    )
    long = (
        melt_store(spark, counts_store)
        .join(F.broadcast(vars_i), "var_idx")
        .join(obs_i, "obs_idx")
        .select(
            F.col("obs_idx").alias("obs_id"), "group", "feature", "value"
        )
    )
    if out_path is not None:
        long.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path)
    return long
