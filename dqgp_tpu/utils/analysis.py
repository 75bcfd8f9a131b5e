"""Post-training analytics — twins of the reference's inline analysis
harnesses:

* NLL-vs-parameter-error correlation incl. per-component (log-det /
  quadratic / constant) Pearson correlations and best-predictor selection
  (main.py:2921-3094);
* ground-truth-vs-trained prediction comparison with per-metric improvements
  and significance buckets (main.py:3194-3501).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ok = np.isfinite(a) & np.isfinite(b)
    if ok.sum() < 3:
        return float("nan")
    a, b = a[ok], b[ok]
    sa, sb = a.std(), b.std()
    if sa == 0 or sb == 0:
        return float("nan")
    return float(np.corrcoef(a, b)[0, 1])


def nll_error_correlation(nll_history: List[Dict], error_history: List[float]) -> Dict:
    """Correlate per-iteration NLL (total + components) with the ground-truth
    parameter error and pick the best-predicting component
    (main.py:2921-3094)."""
    if not nll_history or not error_history:
        return {"available": False}
    m = min(len(nll_history), len(error_history))
    err = np.asarray(error_history[:m], np.float64)
    total = np.asarray([h["avg_nll"] for h in nll_history[:m]])

    comps = {"log_det_term": [], "quadratic_term": [], "constant_term": []}
    for h in nll_history[:m]:
        for k in comps:
            vals = [c[k] for c in h["nll_components"]
                    if np.isfinite(c.get(k, float("inf")))]
            comps[k].append(np.mean(vals) if vals else np.nan)

    out = {
        "available": True,
        "total_nll_vs_error": _pearson(total, err),
        "components": {k: _pearson(np.asarray(v), err) for k, v in comps.items()},
    }
    candidates = {"total": out["total_nll_vs_error"], **out["components"]}
    finite = {k: abs(v) for k, v in candidates.items() if np.isfinite(v)}
    out["best_predictor"] = max(finite, key=finite.get) if finite else None
    return out


def compare_gt_vs_trained(trained: Dict[str, float], gt: Dict[str, float]) -> Dict:
    """Per-metric improvement table with significance buckets
    (main.py:3194-3501). Positive improvement = trained better."""
    higher_better = {"r2", "within_1sigma", "within_2sigma"}
    rows = {}
    for k in ("mse", "rmse", "mae", "r2", "max_error", "nlpd",
              "normalized_rmse_range", "within_1sigma", "within_2sigma"):
        if k not in trained or k not in gt:
            continue
        t, g = float(trained[k]), float(gt[k])
        delta = (t - g) if k in higher_better else (g - t)
        rel = delta / (abs(g) + 1e-12)
        if abs(rel) < 0.01:
            bucket = "equivalent"
        elif abs(rel) < 0.10:
            bucket = "marginal"
        elif abs(rel) < 0.50:
            bucket = "significant"
        else:
            bucket = "large"
        rows[k] = {
            "trained": t,
            "ground_truth": g,
            "improvement": delta,
            "relative_improvement": rel,
            "significance": bucket,
            "trained_better": bool(delta > 0),
        }
    n_better = sum(r["trained_better"] for r in rows.values())
    return {
        "metrics": rows,
        "trained_better_count": n_better,
        "total_compared": len(rows),
        "verdict": ("trained params match or beat ground truth"
                    if n_better * 2 >= len(rows) else
                    "ground-truth params predict better"),
    }
