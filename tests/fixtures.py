"""Fixture matrices mirroring the reference's edge-case sweep
(FIXTURES.md F2; reference tests/test_ranking.py:24-51, test_p_vals.py:17-48,
test_log_fold_change.py:15-19).  Seed 42 throughout, like the reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

rng = np.random.default_rng(42)

POSITIVE = rng.integers(0, 100, size=(25, 12)).astype(float)
NEGATIVE = rng.integers(-100, 0, size=(25, 12)).astype(float)
MIXED = rng.integers(-100, 100, size=(25, 12)).astype(float)
TIES_DENSE = np.tile(np.arange(1.0, 7.0), (5, 1))  # every column fully tied
ALL_ZERO = np.zeros((25, 12))
MINIMAL = np.array([[3.0]])

WITH_NANS = MIXED.copy()
WITH_NANS[3, 2] = np.nan
WITH_NANS[17, 2] = np.nan
WITH_NANS[5, 7] = np.nan

LABELS_5 = rng.integers(5, size=25)
LABELS_6_SMALL = rng.integers(6, size=5)
LABELS_2 = rng.integers(2, size=25)
LABELS_STR = np.array(list("abcde"))[LABELS_5]


def to_long(data: np.ndarray, labels: np.ndarray) -> pd.DataFrame:
    """Dense (n_obs, n_feat) + labels -> long (obs_id, group, feature, value)."""
    n_obs, n_feat = data.shape
    recs = []
    for i in range(n_obs):
        for f in range(n_feat):
            recs.append((i, str(labels[i]), f"gene_{f}", data[i, f]))
    return pd.DataFrame(recs, columns=["obs_id", "group", "feature", "value"])
