"""CLI: migrate a reference-style zarr counts store + obs/vars parquet to
the long (obs_id, group, feature, value) parquet table this engine scans.

    python tools/convert_zarr.py --counts /path/counts.zarr \
        --obs obs.parquet --vars vars.parquet --group-col cell_type \
        --out /path/long_counts

See dask_mwu_spark/sources/zarr_convert.py for the supported zarr v2
profile (reference: scratch/rank_gene_groups.py:112,244-252).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--counts", required=True, help="zarr v2 store directory")
    ap.add_argument("--obs", required=True, help="obs metadata parquet")
    ap.add_argument("--vars", required=True, help="vars metadata parquet")
    ap.add_argument("--group-col", required=True)
    ap.add_argument("--feature-col", default=None,
                    help="vars column holding feature names (default: first)")
    ap.add_argument("--out", required=True, help="output parquet path")
    args = ap.parse_args()

    from dask_mwu_spark.session import get_spark
    from dask_mwu_spark.sources.zarr_convert import convert

    spark = get_spark()
    out = convert(
        spark,
        counts_store=args.counts,
        obs_file=args.obs,
        vars_file=args.vars,
        group_col=args.group_col,
        feature_col=args.feature_col,
        out_path=args.out,
    )
    print(f"wrote {out.count()} rows to {args.out}")


if __name__ == "__main__":
    main()
