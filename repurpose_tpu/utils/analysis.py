"""Data-science sanity tools: feature-label separability and cross-modal
correlation.

Capability parity with the reference's analysis extras (SURVEY.md §2.7):
- visualize_features.py:31-496 -> ``feature_label_analysis`` (PCA projection
  colored by label, feature-label correlation, separability probe) +
  ``render_projection``;
- modality_correlation_analysis.py:28-821 -> ``modality_correlation``
  (same-timestep vs time-shifted cross-modal correlation — aligned streams
  should beat shifted ones — plus a highlight-vs-background logistic-probe
  separability score) and ``lag_analysis``.

All host-side numpy/sklearn; inputs are the per-second feature arrays the
dataset yields.
"""

from __future__ import annotations

import logging
from typing import Dict, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def feature_label_analysis(
    features: np.ndarray,  # [T, D]
    labels: np.ndarray,  # [T]
    n_components: int = 3,
) -> dict:
    """PCA projection + per-dimension feature-label correlation + a logistic
    separability probe (5-fold mean accuracy)."""
    from sklearn.decomposition import PCA
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import cross_val_score

    labels = np.asarray(labels).astype(int)
    x = np.asarray(features, np.float64)
    n_comp = min(n_components, x.shape[1], max(x.shape[0] - 1, 1))
    pca = PCA(n_components=n_comp)
    proj = pca.fit_transform(x)

    xc = x - x.mean(0)
    lc = labels - labels.mean()
    denom = x.std(0) * labels.std() + 1e-12
    corr = (xc * lc[:, None]).mean(0) / denom

    sep = None
    if 0 < labels.sum() < len(labels):
        probe = LogisticRegression(max_iter=200)
        folds = max(2, min(5, int(labels.sum()), int((labels == 0).sum())))
        try:
            sep = float(np.mean(cross_val_score(probe, x, labels, cv=folds)))
        except ValueError as e:
            logger.debug("separability probe skipped: %s", e)
    return {
        "projection": proj,
        "explained_variance": pca.explained_variance_ratio_.tolist(),
        "label_correlation": corr,
        "top_correlated_dims": np.argsort(-np.abs(corr))[:10].tolist(),
        "separability_acc": sep,
        "positive_rate": float(labels.mean()),
    }


def render_projection(analysis: dict, labels: np.ndarray, out_path: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    proj = analysis["projection"]
    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(proj[:, 0], proj[:, 1], c=np.asarray(labels), s=4,
                    cmap="coolwarm", alpha=0.6)
    fig.colorbar(sc, label="label")
    ax.set_xlabel("PC1")
    ax.set_ylabel("PC2")
    ax.set_title(
        f"separability={analysis['separability_acc']}, "
        f"pos_rate={analysis['positive_rate']:.2f}"
    )
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path


def _stream_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Mean canonical-ish correlation proxy: correlation of per-second
    feature-norm profiles (cheap, scale-free)."""
    pa = np.linalg.norm(a, axis=1)
    pb = np.linalg.norm(b, axis=1)
    if pa.std() < 1e-9 or pb.std() < 1e-9:
        return 0.0
    return float(np.corrcoef(pa, pb)[0, 1])


def modality_correlation(
    streams: Dict[str, np.ndarray],  # modality -> [T, D]
    labels: np.ndarray | None = None,
    shift: int = 30,
) -> dict:
    """Same-timestep vs shifted cross-modal correlation per modality pair.

    The sanity claim (modality_correlation_analysis.py:8-10): temporally
    ALIGNED streams should correlate more than the same streams shifted by
    ``shift`` seconds. Also reports highlight-vs-background mean-norm
    separation per modality when labels are given.
    """
    names = sorted(streams)
    t = min(s.shape[0] for s in streams.values())
    streams = {k: v[:t] for k, v in streams.items()}
    out: dict = {"pairs": {}}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aligned = _stream_corr(streams[a], streams[b])
            sh = min(shift, t - 1)
            shifted = _stream_corr(streams[a][sh:], streams[b][: t - sh])
            out["pairs"][f"{a}/{b}"] = {
                "aligned": aligned,
                "shifted": shifted,
                "aligned_beats_shifted": bool(aligned > shifted),
            }
    if labels is not None:
        labels = np.asarray(labels[:t]).astype(bool)
        if labels.any() and (~labels).any():
            out["highlight_separation"] = {
                k: float(
                    np.linalg.norm(v[labels], axis=1).mean()
                    - np.linalg.norm(v[~labels], axis=1).mean()
                )
                for k, v in streams.items()
            }
    return out


def lag_analysis(
    a: np.ndarray, b: np.ndarray, max_lag: int = 10
) -> dict:
    """Cross-correlation of norm profiles over lags in [-max_lag, max_lag];
    returns the lag maximizing correlation (reference lag analysis)."""
    t = min(a.shape[0], b.shape[0])
    pa = np.linalg.norm(a[:t], axis=1)
    pb = np.linalg.norm(b[:t], axis=1)
    lags = range(-max_lag, max_lag + 1)
    corrs = {}
    for lag in lags:
        if lag >= 0:
            x, y = pa[lag:], pb[: t - lag]
        else:
            x, y = pa[: t + lag], pb[-lag:]
        if len(x) > 2 and x.std() > 1e-9 and y.std() > 1e-9:
            corrs[lag] = float(np.corrcoef(x, y)[0, 1])
        else:
            corrs[lag] = 0.0
    best = max(corrs, key=lambda k: corrs[k])
    return {"correlations": corrs, "best_lag": best, "best_corr": corrs[best]}
