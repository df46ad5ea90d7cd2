"""Pure-numpy oracles replicating the reference stack's math.

scipy/statsmodels are not installed in this container, so these re-derive the
same quantities from first principles:

- ``rankdata_avg``: scipy.stats.rankdata(method='average') — average rank of
  tied runs, ranks start at 1, NaN anywhere -> all-NaN column
  (nan_policy='propagate', reference rank_data.py:182-196).
- ``mwu_oracle``: per group one-vs-rest U/z/p exactly as reference
  pvals.py:21-125 (tie correction, continuity correction, two-sided normal
  approximation, p clipped to [0,1], reported U = r1).
- ``bh``: statsmodels multipletests(method='fdr_bh') — step-up suffix-cummin.

``math.erfc`` is the same correctly-rounded C erfc scipy uses, so values are
bit-comparable with the engine's pandas_udf.
"""

from __future__ import annotations

import math

import numpy as np


def rankdata_avg(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=float)
    if np.isnan(x).any():
        return np.full(len(x), np.nan)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), float)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def tie_term(x: np.ndarray) -> float:
    x = np.asarray(x, dtype=float)
    vals = x[~np.isnan(x)]
    _, t = np.unique(vals, return_counts=True)
    return float((t.astype(float) ** 3 - t).sum())


def norm_sf(z: float) -> float:
    if math.isnan(z):
        return math.nan
    return math.erfc(z / math.sqrt(2.0)) / 2.0


def mwu_one_group(
    rank_sum: float, n1: int, n2: int, tie: float
) -> tuple[float, float, float]:
    """Returns (U=r1, z, p) for one (feature, group)."""
    n = n1 + n2
    r1 = rank_sum - n1 * (n1 + 1) / 2
    u = max(r1, n1 * n2 - r1)
    if n <= 1:
        return r1, math.nan, math.nan
    sigma_sq = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    sigma = math.sqrt(sigma_sq)
    num = u - n1 * n2 / 2 - 0.5
    if sigma == 0.0:
        z = math.inf if num > 0 else -math.inf
    else:
        z = num / sigma
    p = min(1.0, 2 * norm_sf(z))
    return r1, z, p


def bh(p: np.ndarray) -> np.ndarray:
    p = np.asarray(p, dtype=float)
    m = len(p)
    order = np.argsort(p, kind="mergesort")
    raw = p[order] * m / np.arange(1, m + 1)
    adj = np.minimum(np.minimum.accumulate(raw[::-1])[::-1], 1.0)
    out = np.empty(m, float)
    out[order] = adj
    return out


def lfc(mu1: float, mu2: float, base: float | None = None) -> float:
    """np.log2 of a non-positive argument is NaN (reference emits NaN with a
    runtime warning for negative means; Spark's log2 emits NULL — both arrive
    as NaN in pandas)."""
    if base is not None:
        e1, e2 = math.expm1(mu1 * math.log(base)), math.expm1(mu2 * math.log(base))
    else:
        e1, e2 = math.expm1(mu1), math.expm1(mu2)
    a, b = e1 + 1e-9, e2 + 1e-9
    if a <= 0 or b <= 0:
        return math.nan
    return math.log2(a) - math.log2(b)


def full_oracle(
    data: np.ndarray, labels: np.ndarray, base: float | None = None
) -> dict[tuple[str, str], dict[str, float]]:
    """Whole-pipeline oracle on a dense (n_obs, n_features) matrix.

    Returns {(feature_name, group): {u, z, p, p_adj, rank_sum, tie_term,
    mu1, mu2, lfc, n1, n2}} with feature names gene_0..gene_{k-1}.
    """
    n_obs, n_feat = data.shape
    groups = sorted({str(g) for g in labels})
    labels = np.array([str(g) for g in labels])
    out: dict[tuple[str, str], dict[str, float]] = {}
    for f in range(n_feat):
        x = data[:, f].astype(float)
        r = rankdata_avg(x)
        tie = tie_term(x)
        for g in groups:
            mask = labels == g
            n1, n2 = int(mask.sum()), n_obs - int(mask.sum())
            rank_sum = float(r[mask].sum())
            u, z, p = mwu_one_group(rank_sum, n1, n2, tie)
            mu1 = float(x[mask].mean())
            mu2 = float(x[~mask].mean()) if n2 else math.nan
            out[(f"gene_{f}", g)] = {
                "n1": n1,
                "n2": n2,
                "rank_sum": rank_sum,
                "tie_term": tie,
                "u": u,
                "z": z,
                "p": p,
                "mu1": mu1,
                "mu2": mu2,
                "lfc": lfc(mu1, mu2, base) if n2 else math.nan,
            }
    # BH per group over that group's features
    for g in groups:
        keys = [(f"gene_{f}", g) for f in range(n_feat)]
        ps = np.array([out[k]["p"] for k in keys])
        if np.isnan(ps).any():
            adj = np.full(len(ps), np.nan)
        else:
            adj = bh(ps)
        for k, a in zip(keys, adj):
            out[k]["p_adj"] = float(a)
    return out
