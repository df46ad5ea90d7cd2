"""Error taxonomy mirroring the reference's (reference: dask_mwu/_utils.py:13-22).

All are ``ValueError`` subclasses, as in the reference.  In a relational
engine most shape errors become schema errors, but we keep the same names so
API users of the reference can map their error handling 1:1.
"""


class InvalidDimensionError(ValueError):
    """Input table is missing a required column or has a wrong type."""


class InvalidChunkSizeError(ValueError):
    """Requested partitioning is invalid (e.g. non-positive partition count)."""


class EmptyArrayError(ValueError):
    """Input table has no rows."""


class NotPartitionError(ValueError):
    """Observation labels do not form a partition: some observation has zero
    or more than one group label (reference: dask_mwu/_utils.py:47-51)."""
