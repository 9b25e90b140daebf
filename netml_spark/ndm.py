"""Minimal model layer — numpy-only twins of the reference's ndm package.

The reference trains sklearn/pyod/torch detectors on the final (tiny)
feature matrix (ndm/model.py:47-104; SURVEY.md §2.12 — downstream of the
engine, "only the feature vectors must match"). Neither sklearn nor torch
exists in this sandbox, so this module provides numpy-only equivalents of
the two detectors that need nothing beyond linear algebra, with the same
train/test/AUC workflow shape as the reference's MODEL wrapper:

- ``PCADetector``: PCA reconstruction-error anomaly score — the same idea
  as the reference's ndm/pca.py (project onto top-k principal components,
  score = residual norm).
- ``GMMDetector``: spherical Gaussian mixture via plain EM,
  log-likelihood score (reference ndm/gmm.py:145 logsumexp scoring).
- ``auc_score``: rank-based ROC-AUC (Mann-Whitney), matching
  sklearn.roc_auc_score semantics used at ndm/model.py:101-102.

Features arrive as a Spark DataFrame with ``features:array<double>`` (and
optionally ``label``); ``collect_matrix`` is the documented driver-side
hand-off — by this point the data is one row per flow, small by design.
"""

from __future__ import annotations

import numpy as np


def collect_matrix(df, features_col: str = "features", label_col: str | None = None):
    pdf = df.select(features_col, *( [label_col] if label_col else [] )).toPandas()
    X = np.stack(pdf[features_col].map(lambda v: np.asarray(v, dtype=np.float64)))
    y = pdf[label_col].to_numpy() if label_col else None
    return X, y


def auc_score(y_true: np.ndarray, scores: np.ndarray) -> float:
    """ROC-AUC via the Mann-Whitney U statistic (ties get mid-ranks)."""
    y_true = np.asarray(y_true).astype(int)
    scores = np.asarray(scores, dtype=np.float64)
    pos = scores[y_true == 1]
    neg = scores[y_true == 0]
    if len(pos) == 0 or len(neg) == 0:
        raise ValueError("need both classes for AUC")
    order = np.argsort(np.concatenate([neg, pos]), kind="stable")
    ranks = np.empty(len(order), dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # mid-ranks for ties
    allv = np.concatenate([neg, pos])
    for v in np.unique(allv):
        m = allv == v
        ranks[m] = ranks[m].mean()
    r_pos = ranks[len(neg):].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2
    return float(u / (len(pos) * len(neg)))


class PCADetector:
    """Anomaly score = PCA reconstruction error (ndm/pca.py analogue)."""

    def __init__(self, n_components: int = 2):
        self.n_components = n_components

    def fit(self, X: np.ndarray):
        X = np.asarray(X, dtype=np.float64)
        self.mean_ = X.mean(axis=0)
        Xc = X - self.mean_
        _, _, vt = np.linalg.svd(Xc, full_matrices=False)
        self.components_ = vt[: self.n_components]
        return self

    def score(self, X: np.ndarray) -> np.ndarray:
        """Higher = more anomalous."""
        Xc = np.asarray(X, dtype=np.float64) - self.mean_
        proj = Xc @ self.components_.T @ self.components_
        return np.linalg.norm(Xc - proj, axis=1)


class GMMDetector:
    """Spherical GMM by EM; anomaly score = negative log-likelihood
    (ndm/gmm.py analogue, logsumexp scoring)."""

    def __init__(self, n_components: int = 2, n_iter: int = 50, seed: int = 42):
        self.k = n_components
        self.n_iter = n_iter
        self.seed = seed

    def fit(self, X: np.ndarray):
        X = np.asarray(X, dtype=np.float64)
        n, d = X.shape
        rng = np.random.default_rng(self.seed)
        mu = X[rng.choice(n, self.k, replace=False)]
        var = np.full(self.k, X.var() + 1e-6)
        pi = np.full(self.k, 1.0 / self.k)
        for _ in range(self.n_iter):
            ll = self._log_prob(X, mu, var, pi)          # (n, k)
            m = ll.max(axis=1, keepdims=True)
            r = np.exp(ll - m)
            r /= r.sum(axis=1, keepdims=True)
            nk = r.sum(axis=0) + 1e-12
            mu = (r.T @ X) / nk[:, None]
            for j in range(self.k):
                diff = X - mu[j]
                var[j] = (r[:, j] @ (diff * diff).sum(axis=1)) / (nk[j] * d) + 1e-9
            pi = nk / n
        self.mu_, self.var_, self.pi_ = mu, var, pi
        return self

    @staticmethod
    def _log_prob(X, mu, var, pi):
        n, d = X.shape
        out = np.empty((n, len(mu)))
        for j in range(len(mu)):
            diff = X - mu[j]
            out[:, j] = (
                np.log(pi[j])
                - 0.5 * d * np.log(2 * np.pi * var[j])
                - 0.5 * (diff * diff).sum(axis=1) / var[j]
            )
        return out

    def score(self, X: np.ndarray) -> np.ndarray:
        """Higher = more anomalous (negative logsumexp likelihood)."""
        ll = self._log_prob(np.asarray(X, dtype=np.float64), self.mu_, self.var_, self.pi_)
        m = ll.max(axis=1)
        return -(m + np.log(np.exp(ll - m[:, None]).sum(axis=1)))
