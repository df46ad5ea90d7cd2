from dask_mwu_spark.functions.stats import norm_sf, two_sided_p_from_z

__all__ = ["norm_sf", "two_sided_p_from_z"]
