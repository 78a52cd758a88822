"""Per-document ranking: PageRank + stack-rank ("restack") post-process.

Reimplements the semantics of the reference's ranking stage
(reference: textgraphs/doc.py:893-937 calc_phrase_ranks,
doc.py:796-890 _restack_ranks, doc.py:740-793 LP coefficient solve,
textgraphs/util.py:65-132 quantile striping + RMS) from the published
definitions:

* PageRank follows the standard power-iteration formulation used by
  networkx.pagerank (alpha=0.85, uniform personalization, dangling mass
  redistributed uniformly, L1 tolerance 1e-6 * n, max 100 iterations).
* The restack LP (3 variables, 3 constraints) is solved in closed form
  instead of shelling out to a CBC solver: minimize slack subject to
      coef0*sum_E + coef1*sum_L + slack == 1
      coef0*min_E - coef1*max_L - slack == 0
      coef0 >= coef1,  all vars >= 0
"""

from __future__ import annotations

import math

import numpy as np


def pagerank(
    n: int,
    edges: list[tuple[int, int, float]],
    *,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
) -> np.ndarray:
    """Weighted directed PageRank over ``n`` nodes; parallel edges sum."""
    if n == 0:
        return np.zeros(0)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    w = np.array([e[2] for e in edges], dtype=np.float64)

    out_w = np.zeros(n)
    if len(src):
        np.add.at(out_w, src, w)
    dangling = out_w == 0.0

    x = np.full(n, 1.0 / n)
    p = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        x_last = x
        dangle_mass = alpha * x_last[dangling].sum()
        x = (1.0 - alpha) * p + dangle_mass * p
        if len(src):
            contrib = alpha * x_last[src] * w / out_w[src]
            np.add.at(x, dst, contrib)
        if np.abs(x - x_last).sum() < n * tol:
            return x
    return x


def calc_quantile_bins(num_rows: int) -> np.ndarray:
    """Quantile-bin boundaries: granularity = max(round(ln(n)*4), 1)
    evenly spaced on [0, 1] (util.py:65-85)."""
    granularity = max(round(math.log(num_rows) * 4), 1)
    return np.linspace(0, 1, num=granularity, endpoint=True)


def stripe_column(values: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """Digitize values into nearest-interpolation quantile bins
    (util.py:88-113).

    np.percentile(method="nearest") IS what pandas Series.quantile
    (interpolation="nearest") computes underneath — but without the
    Series/Index construction overhead, which profiling showed was ~70%
    of the whole per-doc extraction wall (4 stripe calls per document).

    Unlike Series.quantile, np.percentile PROPAGATES NaNs into the bin
    edges (corrupting every stripe) and raises on empty input — guard
    both explicitly so a NaN weight upstream fails loudly instead of
    silently mis-striping the whole document."""
    values = np.asarray(values, dtype="float64")
    if values.size == 0:
        return np.zeros(0, dtype="int64")
    if np.isnan(values).any():
        raise ValueError("stripe_column: NaN in values — upstream rank/"
                         "count arrays must be finite")
    q = np.percentile(values, np.asarray(bins) * 100.0, method="nearest")
    return np.digitize(values, q) - 1


def solve_restack_coeffs(sum_e: float, sum_l: float, min_e: float, max_l: float) -> tuple[float, float]:
    """Closed-form solution of the restack LP (doc.py:740-793)."""
    # try slack = 0: coef1 = coef0 * min_e / max_l; feasible iff coef0>=coef1
    if max_l > 0:
        denom = sum_e + sum_l * min_e / max_l
        if denom > 0:
            coef0 = 1.0 / denom
            coef1 = coef0 * min_e / max_l
            if coef0 >= coef1 >= 0:
                return coef0, coef1
    # boundary coef0 == coef1 == c with slack = c*(min_e - max_l) >= 0
    denom = sum_e + sum_l + min_e - max_l
    if denom > 0:
        c = 1.0 / denom
        if c * (min_e - max_l) >= 0:
            return c, c
    # degenerate fallback: all mass on entities
    return (1.0 / sum_e if sum_e > 0 else 0.0), 0.0


def restack_ranks(
    ranks: np.ndarray,
    stacked_counts: np.ndarray,
    neighbors: np.ndarray,
    sub_obj: np.ndarray,
    is_entity: np.ndarray,
) -> np.ndarray:
    """Stack-rank so entities take priority over lemmas (doc.py:796-890).

    ``stacked_counts`` is count with VERB/IRI redaction applied
    (elem.py:152-165); ``is_entity`` marks kind == ent.
    """
    n = len(ranks)
    if n == 0:
        return ranks
    weight = ranks.astype(np.float64).copy()
    weight[stacked_counts < 1] = 0.0

    cols = [weight, stacked_counts.astype(np.float64), neighbors.astype(np.float64), sub_obj.astype(np.float64)]
    normed = []
    for col in cols:
        m = col.max()
        normed.append(col / m if m > 0 else col * 0.0)

    bins = calc_quantile_bins(n)
    striped = np.column_stack([stripe_column(col, bins) for col in normed]).astype(np.float64)

    rank_col = np.sqrt((striped**2).mean(axis=1))
    rank_col[stacked_counts < 1] = 0.0
    total = rank_col.sum()
    if total > 0:
        rank_col = rank_col / total

    e_col = np.where(is_entity, rank_col, 0.0)
    l_col = np.where(~is_entity, rank_col, 0.0)
    E = e_col[e_col > 0]
    L = l_col[l_col > 0]
    if len(E) < 1 or len(L) < 1:
        return ranks
    coef0, coef1 = solve_restack_coeffs(E.sum(), L.sum(), E.min(), L.max())
    return e_col * coef0 + l_col * coef1
