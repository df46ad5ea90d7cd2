from dask_mwu_spark.sources.loaders import (
    load_table,
    melt,
    obs_measure_from_events,
    obs_measure_from_lineitem,
)

__all__ = [
    "load_table",
    "melt",
    "obs_measure_from_events",
    "obs_measure_from_lineitem",
]
