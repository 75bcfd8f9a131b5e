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


def post_training_report(res, log=print, ground_truth_params=None) -> None:
    """The reference's post-training narrative (main.py:2786-3094), printed
    from a TrainResult: timing, final-hyperparameters summary with per-agent
    consensus check, ground-truth analysis, CV-score evolution, NLL-loss
    convergence, and the NLL-vs-hyperparameter-error comparison with
    per-component correlations and a recommendation.

    The numbers behind every line are also in the structured histories /
    --metrics-json; this is the human-readable transcript twin.
    """
    from .. import manifold as M

    z = np.asarray(res.z)
    # --- timing (main.py:2786-2790) ---------------------------------------
    iters = max(res.iterations, 1)
    log(f"\nTotal ADMM optimization time: {res.total_time:.4f}s")
    log(f"Average time per iteration: {res.total_time / iters:.4f}s")
    log("Riemannian optimization with parameter shift gradients")
    log("Parallel parameter evaluation: Enabled")
    iter_times = [h["iter_time"] for h in res.nll_history if "iter_time" in h]
    if len(iter_times) > 1:
        # additive breakdown the reference cannot print (its workers hide
        # per-iteration wall time): first iteration carries the compile
        steady = iter_times[1:]
        log(f"  device dispatch: first iteration {iter_times[0]:.3f}s "
            f"(includes compile), steady state "
            f"{float(np.median(steady)):.4f}s/iter "
            f"(min {min(steady):.4f}, max {max(steady):.4f})")

    # --- final hyperparameters summary (main.py:2793-2801) ----------------
    log(f"\n{'=' * 50}")
    log("FINAL HYPERPARAMETERS SUMMARY (CV-based)")
    log("=" * 50)
    log("PRIMARY OPTIMIZATION METHOD: Cross-Validation (Realistic)")
    log(f"Best CV-NLPD score: {res.cv_best:.6f}")
    log(f"Final consensus params: {z}")
    if res.z_best_cv is not None:
        log(f"Best CV params:         {np.asarray(res.z_best_cv)}")
        log("CV-optimized parameters will be used for prediction")
    else:
        log("No CV-optimized parameters available, using final iteration")

    # --- ground-truth analysis (main.py:2805-2825) -------------------------
    if ground_truth_params is not None:
        gt = np.asarray(ground_truth_params)
        log("\nGROUND TRUTH ANALYSIS (for comparison only):")
        log(f"Ground truth params: {gt}")
        if res.z_best_gt is not None:
            log(f"Best ADMM (z):     {np.asarray(res.z_best_gt)}")
        log(f"Best ||z - ground_truth||: {res.error_best:.6f}")
        final_error = M.np_distance(z, gt)
        log(f"Final Riemannian distance: {final_error:.6f}")
        log(f"Final Euclidean distance:  {np.linalg.norm(z - gt):.6f}")
        rec = ("EXCELLENT!" if final_error < 1.0
               else "Good" if final_error < 3.0 else "Needs improvement")
        log(f"Parameter recovery: {rec}")
        log(f"Error history: {[round(float(e), 6) for e in res.error_history]}")
        log("Note: Ground truth comparison is for analysis only")
    else:
        log("\n(No ground truth available for classical dataset)")

    # --- per-agent consensus check (main.py:2828-2836) ---------------------
    log("\nFinal agent params (theta) - consensus check:")
    for i, theta_i in enumerate(np.asarray(res.theta)):
        log(f"  Agent {i + 1}: {theta_i} "
            f"(||z - theta_{i + 1}||: {M.np_distance(z, theta_i):.6f})")
    log("=" * 50)

    # --- CV score evolution (main.py:2839-2878) ----------------------------
    log(f"\n{'=' * 50}")
    log("CROSS-VALIDATION SCORE EVOLUTION")
    log("=" * 50)
    cvh = res.cv_history
    if cvh:
        log(f"Total iterations: {len(cvh)}")
        k = min(3, len(cvh))

        def _cv_line(h):
            return (f"  Iteration {h['iteration']}: "
                    f"CV-NLPD={h['consensus_cv_score']:.4f}"
                    f"±{h['cv_score_std']:.4f}, R²={h['cv_r2']:.4f}")

        log(f"\nFirst {k} iterations:")
        for h in cvh[:k]:
            log(_cv_line(h))
        if len(cvh) > 6:
            log("  ...")
        if len(cvh) > k:
            log(f"Last {k} iterations:")
            for h in cvh[max(k, len(cvh) - k):]:
                log(_cv_line(h))
        if len(cvh) > 1:
            c0 = cvh[0]["consensus_cv_score"]
            c1 = cvh[-1]["consensus_cv_score"]
            if np.isfinite(c0) and np.isfinite(c1):
                log("\nCV Score Improvement:")
                log(f"  Initial CV-NLPD: {c0:.6f}")
                log(f"  Final CV-NLPD:   {c1:.6f}")
                log(f"  Improvement:     {c0 - c1:.6f} "
                    f"({'Better' if c0 - c1 > 0 else 'Worse'})")
        log(f"  Best CV-NLPD: {res.cv_best:.6f}")
    else:
        log("No CV score history available")
    log("=" * 50)

    # --- NLL loss convergence (main.py:2881-2917) ---------------------------
    log(f"\n{'=' * 50}")
    log("NLL LOSS CONVERGENCE ANALYSIS")
    log("=" * 50)
    nlh = res.nll_history
    if nlh:
        log(f"Total iterations: {len(nlh)}")
        k = min(3, len(nlh))

        def _nll_line(h):
            return (f"  Iteration {h['iteration']}: Avg={h['avg_nll']:.6f}, "
                    f"Min={h['min_nll']:.6f}, Max={h['max_nll']:.6f}")

        log("\nNLL Loss Evolution:")
        log(f"First {k} iterations:")
        for h in nlh[:k]:
            log(_nll_line(h))
        if len(nlh) > 6:
            log("  ...")
        if len(nlh) > k:
            log(f"Last {k} iterations:")
            for h in nlh[max(k, len(nlh) - k):]:
                log(_nll_line(h))
        a0, a1 = nlh[0]["avg_nll"], nlh[-1]["avg_nll"]
        log("\nLoss Reduction:")
        log(f"  Initial average NLL: {a0:.6f}")
        log(f"  Final average NLL:   {a1:.6f}")
        if np.isfinite(a0) and np.isfinite(a1) and a0 != 0:
            log(f"  Improvement: {a0 - a1:.6f} ({(a0 - a1) / a0 * 100:.2f}%)")
        valid = [(h["iteration"], h["avg_nll"]) for h in nlh
                 if np.isfinite(h["avg_nll"])]
        if valid:
            bi, bv = min(valid, key=lambda t: t[1])
            log(f"  Best average NLL: {bv:.6f} (iteration {bi})")
    else:
        log("No NLL loss history available")
    log("=" * 50)

    # --- NLL vs hyperparameter error (main.py:2921-3094) --------------------
    if ground_truth_params is None or not nlh or not res.error_history:
        return
    log(f"\n{'=' * 50}")
    log("NLL LOSS vs HYPERPARAMETER ERROR COMPARISON")
    log("=" * 50)
    valid = [(i, h["avg_nll"]) for i, h in enumerate(nlh)
             if np.isfinite(h["avg_nll"])]
    if not valid:
        log("Insufficient valid NLL data for comparison")
        log("=" * 50)
        return
    err = list(res.error_history)
    min_nll_idx, min_nll = min(valid, key=lambda t: t[1])
    min_nll_iter = nlh[min_nll_idx]["iteration"]
    min_err_idx = int(np.argmin(err))
    min_err_iter = min_err_idx + 1  # 1-indexed, as the reference prints
    log("Lowest NLL Loss:")
    log(f"  Iteration: {min_nll_iter}")
    log(f"  NLL Loss: {min_nll:.6f}")
    if min_nll_idx < len(err):
        log(f"  Hyperparameter Error: {err[min_nll_idx]:.6f}")
    log("\nLowest Hyperparameter Error:")
    log(f"  Iteration: {min_err_iter}")
    log(f"  Hyperparameter Error: {err[min_err_idx]:.6f}")
    if min_err_idx < len(nlh):
        log(f"  NLL Loss: {nlh[min_err_idx]['avg_nll']:.6f}")
    aligned = min_nll_iter == min_err_iter
    log("\nAlignment Analysis:")
    log(f"  Do lowest NLL and lowest error occur at same iteration? "
        f"{'YES' if aligned else 'NO'}")
    if not aligned:
        log(f"  Iteration difference: {abs(min_nll_iter - min_err_iter)} iterations")

    corr = nll_error_correlation(nlh, err)
    if corr.get("available"):
        c = corr["total_nll_vs_error"]
        log("\nCorrelation Analysis:")
        log(f"  Pearson correlation (NLL vs Error): {c:.4f}")
        if np.isfinite(c):
            word = ("Strong positive" if c > 0.7 else "Moderate positive"
                    if c > 0.3 else "Weak" if c > -0.3
                    else "Moderate negative" if c > -0.7 else "Strong negative")
            log(f"  {word} correlation")
        log("\nNLL Component Correlation Analysis:")
        names = {"log_det_term": "Log Determinant",
                 "quadratic_term": "Quadratic Form",
                 "constant_term": "Constant Term"}
        for key, name in names.items():
            v = corr["components"][key]
            if np.isfinite(v):
                grade = ("STRONG" if abs(v) > 0.7
                         else "MODERATE" if abs(v) > 0.3 else "WEAK")
                log(f"  {name} vs Error: {v:.4f} ({grade})")
            else:
                log(f"  {name} vs Error: N/A (insufficient data)")
        finite = {names.get(k, k): abs(v)
                  for k, v in {"total": c, **corr["components"]}.items()
                  if np.isfinite(v)}
        if finite:
            best = max(finite, key=finite.get)
            log(f"\n  BEST PREDICTOR: {best} (|correlation| = {finite[best]:.4f})")
    log("\nRecommendation:")
    if aligned:
        log("  OPTIMAL: Lowest NLL and lowest hyperparameter error align perfectly!")
    elif abs(min_nll_iter - min_err_iter) <= 2:
        log("  GOOD: Lowest NLL and lowest error are close (within 2 iterations)")
    else:
        log("  CAUTION: Significant gap between lowest NLL and lowest error")
        log(f"     Consider using iteration {min_err_iter} parameters for "
            "better generalization")
    log("=" * 50)
