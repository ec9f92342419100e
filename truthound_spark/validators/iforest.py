"""Native isolation forest: numpy fit on the driver, vectorized
distributed scoring — no sklearn dependency.

Reference surface: anomaly/ml_based.py:263-344 wraps sklearn's
IsolationForest behind LargeDatasetMixin sampling. This module implements
the algorithm itself (Liu/Ting/Zhou, "Isolation Forest", ICDM 2008) so
the validator works identically on every cluster image and produces
DETERMINISTIC seeded results:

* **Fit** — T random isolation trees over ψ-row subsamples of a seeded
  driver-side sample. Trees are stored as flat arrays (feature, threshold,
  left, right, node-size), not Python objects — cheap to broadcast, cheap
  to traverse in numpy.
* **Score** — one broadcast of the packed forest; each Arrow batch
  traverses all rows through a tree simultaneously (vector of node
  cursors stepped level-by-level), so scoring is O(batch × T × depth)
  numpy ops with no Python-per-row work.
* **Threshold** — the contamination quantile of the fit-sample scores,
  fixed at fit time; scoring is then a pure map — no second pass over the
  data, no global sort.

The anomaly score is the standard s(x) = 2^(−E[h(x)]/c(ψ)) with the
average-unsuccessful-BST-search correction c(n) = 2H(n−1) − 2(n−1)/n
applied at truncated leaves.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["IsolationForestModel", "fit_isolation_forest"]

_EULER = 0.5772156649015329


def _c(n: np.ndarray | float) -> np.ndarray | float:
    """Average path length of unsuccessful BST search in n nodes."""
    n = np.asarray(n, dtype="float64")
    out = np.zeros_like(n)
    big = n > 2
    out[big] = 2.0 * (np.log(n[big] - 1.0) + _EULER) - 2.0 * (n[big] - 1.0) / n[big]
    out[n == 2] = 1.0
    return out


@dataclass
class _Tree:
    feature: np.ndarray  # int32, -1 at leaves
    threshold: np.ndarray  # float64
    left: np.ndarray  # int32 child index, -1 at leaves
    right: np.ndarray  # int32
    size: np.ndarray  # int64 rows that reached the node (leaf correction)
    depth: np.ndarray  # int32 node depth


def _build_tree(x: np.ndarray, rng: np.random.RandomState, max_depth: int) -> _Tree:
    feature, threshold, left, right, size, depth = [], [], [], [], [], []
    # worklist of (row-index-array, depth); nodes appended in DFS order
    stack = [(np.arange(len(x)), 0, -1, False)]  # (rows, depth, parent, is_right)
    while stack:
        rows, d, parent, is_right = stack.pop()
        idx = len(feature)
        if parent >= 0:
            (right if is_right else left)[parent] = idx
        xs = x[rows]
        lo, hi = xs.min(axis=0), xs.max(axis=0)
        splittable = np.where(hi > lo)[0]
        if d >= max_depth or len(rows) <= 1 or len(splittable) == 0:
            feature.append(-1)
            threshold.append(0.0)
            left.append(-1)
            right.append(-1)
            size.append(len(rows))
            depth.append(d)
            continue
        f = int(splittable[rng.randint(len(splittable))])
        t = float(rng.uniform(lo[f], hi[f]))
        mask = xs[:, f] < t
        if not mask.any() or mask.all():  # degenerate uniform draw at bound
            mask = xs[:, f] <= lo[f]
        feature.append(f)
        threshold.append(t)
        left.append(-1)
        right.append(-1)
        size.append(len(rows))
        depth.append(d)
        # push right first so left is processed next (stable DFS layout)
        stack.append((rows[~mask], d + 1, idx, True))
        stack.append((rows[mask], d + 1, idx, False))
    return _Tree(
        np.asarray(feature, dtype="int32"),
        np.asarray(threshold, dtype="float64"),
        np.asarray(left, dtype="int32"),
        np.asarray(right, dtype="int32"),
        np.asarray(size, dtype="int64"),
        np.asarray(depth, dtype="int32"),
    )


@dataclass
class IsolationForestModel:
    trees: list[_Tree]
    psi: int
    score_threshold: float
    columns: list[str]

    def path_lengths(self, x: np.ndarray) -> np.ndarray:
        """Mean adjusted path length per row (vectorized per tree)."""
        n = len(x)
        total = np.zeros(n, dtype="float64")
        for tr in self.trees:
            cur = np.zeros(n, dtype="int64")
            active = tr.feature[cur] >= 0
            while active.any():
                f = tr.feature[cur[active]]
                go_left = x[active, f] < tr.threshold[cur[active]]
                nxt = np.where(go_left, tr.left[cur[active]], tr.right[cur[active]])
                cur[active] = nxt
                active = tr.feature[cur] >= 0
            total += tr.depth[cur] + _c(tr.size[cur])
        return total / len(self.trees)

    def scores(self, x: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1): higher = more isolated."""
        denom = float(_c(np.array([self.psi]))[0]) or 1.0
        return np.power(2.0, -self.path_lengths(x) / denom)

    def predict_anomaly(self, x: np.ndarray) -> np.ndarray:
        return self.scores(x) > self.score_threshold


def fit_isolation_forest(
    sample: np.ndarray,
    columns: list[str],
    n_trees: int = 100,
    psi: int = 256,
    contamination: float = 0.01,
    seed: int = 42,
) -> IsolationForestModel:
    """Fit on a driver-side sample (rows × features, float64, no NaNs)."""
    if sample.ndim != 2 or len(sample) == 0:
        raise ValueError("sample must be a non-empty 2-D array")
    rng = np.random.RandomState(seed)
    psi = int(min(psi, len(sample)))
    max_depth = int(np.ceil(np.log2(max(psi, 2))))
    trees = []
    for _ in range(n_trees):
        rows = rng.choice(len(sample), size=psi, replace=False)
        trees.append(_build_tree(sample[rows], rng, max_depth))
    model = IsolationForestModel(
        trees=trees, psi=psi, score_threshold=1.0, columns=list(columns)
    )
    fit_scores = model.scores(sample)
    # contamination quantile on the fit sample fixes the decision boundary
    model.score_threshold = float(
        np.quantile(fit_scores, 1.0 - max(min(contamination, 0.5), 1e-9))
    )
    return model
