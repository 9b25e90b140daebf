"""Model layer: PCA / GMM detectors separate planted anomalies; AUC is
rank-correct. End-to-end: FeaturePlan STATS features -> detector -> AUC."""

import numpy as np
import pandas as pd

from netml_spark import ndm


def _toy(n=300, d=6, seed=0):
    rng = np.random.default_rng(seed)
    X_norm = rng.normal(0, 1, (n, d))
    X_anom = rng.normal(5, 3, (n // 10, d))
    X = np.vstack([X_norm, X_anom])
    y = np.concatenate([np.zeros(n, dtype=int), np.ones(n // 10, dtype=int)])
    return X, y


def test_auc_score_rank_semantics():
    y = np.array([0, 0, 1, 1])
    assert ndm.auc_score(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert ndm.auc_score(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert ndm.auc_score(y, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5


def test_pca_detector_separates():
    X, y = _toy()
    det = ndm.PCADetector(n_components=2).fit(X[y == 0])
    assert ndm.auc_score(y, det.score(X)) > 0.9


def test_gmm_detector_separates():
    X, y = _toy(seed=1)
    det = ndm.GMMDetector(n_components=2, n_iter=30).fit(X[y == 0])
    assert ndm.auc_score(y, det.score(X)) > 0.9


def test_e2e_features_to_model(spark, token_events_df):
    from netml_spark.pipeline import FeaturePlan

    plan = FeaturePlan(feat_type="STATS")
    feats = plan.extract(token_events_df, ("doc_id",), "ts", "token", ("seq",))
    X, _ = ndm.collect_matrix(feats)
    assert X.shape[1] == 12 and X.dtype == np.float64
    det = ndm.PCADetector(n_components=3).fit(X)
    s = det.score(X)
    assert np.isfinite(s).all() and len(s) == len(X)
