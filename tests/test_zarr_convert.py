"""Zarr v2 → long-parquet migration (sources/zarr_convert.py): chunk codec
round-trips, spec edge cases (edge chunks, missing-chunk fill, raw vs zlib),
and the end-to-end round-trip VERDICT r4 item 6 prescribes: a converted
store through wilcoxon_core matches the same data run directly."""

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.sources import zarr_convert as zc


def _mk(shape, seed=7):
    rng = np.random.RandomState(seed)
    # integer-ish values with ties, like counts data
    return rng.randint(0, 6, size=shape).astype("float64")


def test_chunk_roundtrip_exact_and_edge_chunks(tmp_path):
    arr = _mk((7, 5))
    store = str(tmp_path / "z")
    zc.write_store(store, arr, chunks=(3, 2))  # 3x3 grid with edge chunks
    meta = zc.read_meta(store)
    got = np.full(arr.shape, np.nan)
    for i in range(3):
        for j in range(3):
            blk = zc.read_chunk(store, meta, i, j)
            got[i * 3 : i * 3 + blk.shape[0], j * 2 : j * 2 + blk.shape[1]] = blk
    np.testing.assert_array_equal(got, arr)


def test_uncompressed_store_and_float32(tmp_path):
    arr = _mk((4, 4)).astype("float32")
    store = str(tmp_path / "z")
    zc.write_store(store, arr, chunks=(2, 2), compressor=None)
    meta = zc.read_meta(store)
    assert meta["compressor"] is None
    np.testing.assert_array_equal(zc.read_chunk(store, meta, 1, 1), arr[2:, 2:])


def test_missing_chunk_is_fill_value(tmp_path):
    arr = _mk((4, 4))
    store = str(tmp_path / "z")
    zc.write_store(store, arr, chunks=(2, 2))
    os.unlink(os.path.join(store, "1.0"))
    meta = zc.read_meta(store)
    np.testing.assert_array_equal(
        zc.read_chunk(store, meta, 1, 0), np.zeros((2, 2))
    )


def test_meta_validation_rejects_unsupported(tmp_path):
    store = str(tmp_path / "z")
    arr = _mk((2, 2))
    zc.write_store(store, arr, chunks=(2, 2))
    meta_path = os.path.join(store, ".zarray")
    m = json.load(open(meta_path))
    for patch, msg in (
        ({"order": "F"}, "F-order"),
        ({"compressor": {"id": "blosc"}}, "compressor"),
        ({"shape": [2, 2, 2], "chunks": [2, 2, 2]}, "2-D"),
        ({"zarr_format": 3}, "zarr_format"),
    ):
        bad = {**m, **patch}
        json.dump(bad, open(meta_path, "w"))
        with pytest.raises(ValueError, match=msg):
            zc.read_meta(store)
    json.dump(m, open(meta_path, "w"))
    assert zc.read_meta(store)["shape"] == [2, 2]


def test_melt_store_distributed(spark, tmp_path):
    arr = _mk((7, 5))
    store = str(tmp_path / "z")
    zc.write_store(store, arr, chunks=(3, 2))
    out = zc.melt_store(spark, store).toPandas()
    assert len(out) == 35
    got = np.full(arr.shape, np.nan)
    for r in out.itertuples():
        got[r.obs_idx, r.var_idx] = r.value
    np.testing.assert_array_equal(got, arr)


def test_positional_index_matches_row_order(spark, tmp_path):
    p = str(tmp_path / "obs.parquet")
    pd.DataFrame({"g": [f"g{i}" for i in range(100)]}).to_parquet(p)
    df = zc._with_pos_index(spark.read.parquet(p), "idx").toPandas()
    assert sorted(df["idx"]) == list(range(100))
    ordered = df.sort_values("idx")["g"].tolist()
    assert ordered == [f"g{i}" for i in range(100)]


def test_convert_validates_metadata_lengths(spark, tmp_path):
    arr = _mk((6, 3))
    store = str(tmp_path / "z")
    zc.write_store(store, arr, chunks=(4, 2))
    obs = str(tmp_path / "obs.parquet")
    vars_ = str(tmp_path / "vars.parquet")
    pd.DataFrame({"grp": ["a"] * 5}).to_parquet(obs)  # wrong: 5 != 6
    pd.DataFrame({"name": ["f1", "f2", "f3"]}).to_parquet(vars_)
    with pytest.raises(ValueError, match="obs rows"):
        zc.convert(
            spark, counts_store=store, obs_file=obs, vars_file=vars_,
            group_col="grp",
        )


def test_end_to_end_roundtrip_through_wilcoxon(spark, tmp_path):
    """The VERDICT-prescribed gate: zarr-converted data through the
    flagship MWU pipeline must equal the SAME matrix melted directly."""
    from dask_mwu_spark.plans.pipeline import rank_features_by_group

    n_obs, n_vars = 60, 4
    arr = _mk((n_obs, n_vars), seed=11)
    arr[3, 1] = np.nan  # NaN propagation path
    groups = [["x", "y", "z"][i % 3] for i in range(n_obs)]
    feats = [f"gene{j}" for j in range(n_vars)]

    store = str(tmp_path / "counts.zarr")
    zc.write_store(store, arr, chunks=(32, 3))
    obs, vars_ = str(tmp_path / "obs.parquet"), str(tmp_path / "vars.parquet")
    pd.DataFrame({"cell_type": groups}).to_parquet(obs)
    pd.DataFrame({"gene": feats}).to_parquet(vars_)

    out_path = str(tmp_path / "long")
    converted = zc.convert(
        spark, counts_store=store, obs_file=obs, vars_file=vars_,
        group_col="cell_type", out_path=out_path,
    )

    direct = spark.createDataFrame(
        pd.DataFrame(
            {
                "group": np.repeat(groups, n_vars),
                "feature": feats * n_obs,
                "value": arr.ravel(),
            }
        )
    )

    def run(measure):
        out = rank_features_by_group(
            measure.select("group", "feature", "value"), top_n=4
        ).toPandas()
        return out.sort_values(list(out.columns[:2])).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(converted), run(direct))


def test_cross_check_against_real_zarr_library(spark, tmp_path):
    """When the zarr package is importable, a store IT wrote must read
    identically through our codec (format-conformance evidence)."""
    zarr = pytest.importorskip("zarr")
    arr = _mk((10, 6))
    store = str(tmp_path / "z")
    z = zarr.open(
        store, mode="w", shape=arr.shape, chunks=(4, 4), dtype="f8",
        compressor=zarr.Zlib(level=5),
    )
    z[:] = arr
    out = zc.melt_store(spark, store).toPandas()
    got = np.full(arr.shape, np.nan)
    for r in out.itertuples():
        got[r.obs_idx, r.var_idx] = r.value
    np.testing.assert_array_equal(got, arr)
