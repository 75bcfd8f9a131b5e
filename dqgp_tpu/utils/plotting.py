"""Plot suite — PNG artifacts matching the reference's plot families
(main.py:294-431, 684-1309, 1738-1925; real_world_datasets.py:586-790):
dataset scatter, agent data distribution, predictions with uncertainty,
convergence histories. All savers, headless-safe (Agg backend)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _save(fig, save_plot: bool, output_dir: str, name: str) -> Optional[str]:
    path = None
    if save_plot:
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, name)
        fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_dataset(X, Y, title="Quantum GP Data", save_plot=True, output_dir="plots",
                 train_indices=None, test_indices=None) -> Optional[str]:
    """1D scatter / 2D 3-D scatter / >=3D pairwise projections (main.py:294-431)."""
    d = X.shape[1]
    if d == 1:
        fig = plt.figure(figsize=(9, 5))
        if train_indices is not None and test_indices is not None:
            plt.scatter(X[train_indices, 0], Y[train_indices], s=18, c="tab:blue", label="Training")
            plt.scatter(X[test_indices, 0], Y[test_indices], s=18, c="tab:red", marker="s", label="Test")
            plt.legend()
        else:
            plt.scatter(X[:, 0], Y, s=14, alpha=0.7)
        plt.xlabel("X"); plt.ylabel("Y"); plt.title(title); plt.grid(True)
    elif d == 2:
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        if train_indices is not None and test_indices is not None:
            ax.scatter(X[train_indices, 0], X[train_indices, 1], Y[train_indices],
                       c="tab:blue", s=14, label="Training")
            ax.scatter(X[test_indices, 0], X[test_indices, 1], Y[test_indices],
                       c="tab:red", s=14, marker="s", label="Test")
            ax.legend()
        else:
            ax.scatter(X[:, 0], X[:, 1], Y, c=Y, cmap="viridis", s=12)
        ax.set_xlabel("X1"); ax.set_ylabel("X2"); ax.set_zlabel("Y")
        ax.set_title(title)
    else:
        n_plots = min(6, d * (d - 1) // 2)
        cols = 3
        rows = (n_plots + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(13, 4 * rows), squeeze=False)
        k = 0
        for i in range(d):
            for j in range(i + 1, d):
                if k >= n_plots:
                    break
                ax = axes[k // cols][k % cols]
                sc = ax.scatter(X[:, i], X[:, j], c=Y, cmap="viridis", s=10, alpha=0.7)
                ax.set_xlabel(f"X{i+1}"); ax.set_ylabel(f"X{j+1}")
                k += 1
            if k >= n_plots:
                break
        for idx in range(k, rows * cols):
            axes[idx // cols][idx % cols].set_visible(False)
        fig.suptitle(f"{title} ({d}D input)")
    return _save(fig, save_plot, output_dir, "dataset.png")


def plot_agent_data_distribution(agent_data_splits, title="Agent Data Distribution",
                                 save_plot=True, output_dir="plots") -> Optional[str]:
    """Per-agent spatial shards (main.py:684-780)."""
    n_agents = len(agent_data_splits)
    d = agent_data_splits[0][0].shape[1]
    colors = plt.cm.Set3(np.linspace(0, 1, n_agents))
    fig = plt.figure(figsize=(9, 6))
    if d == 1:
        for i, (Xa, Ya) in enumerate(agent_data_splits):
            plt.scatter(Xa[:, 0], Ya, s=16, color=colors[i], label=f"Agent {i+1}")
        plt.xlabel("X"); plt.ylabel("Y")
    else:
        for i, (Xa, _) in enumerate(agent_data_splits):
            plt.scatter(Xa[:, 0], Xa[:, 1], s=16, color=colors[i], label=f"Agent {i+1}")
        plt.xlabel("X1"); plt.ylabel("X2")
    plt.legend(); plt.title(title); plt.grid(True, alpha=0.4)
    return _save(fig, save_plot, output_dir, "agent_distribution.png")


def plot_predictions(X_test, Y_true, Y_pred, Y_pred_var=None, X_train=None,
                     Y_train=None, title="Quantum GP Predictions",
                     save_plot=True, output_dir="results",
                     config: Optional[Dict] = None,
                     nlpd_info: Optional[Dict] = None) -> Optional[str]:
    """Prediction vs truth with uncertainty band / parity plot (main.py:1738-1925)."""
    d = X_test.shape[1]
    if d == 1:
        order = np.argsort(X_test[:, 0])
        fig = plt.figure(figsize=(10, 6))
        if X_train is not None:
            plt.scatter(X_train[:, 0], Y_train, s=12, c="gray", alpha=0.5, label="Train")
        plt.scatter(X_test[:, 0], Y_true, s=22, c="tab:blue", label="True")
        plt.plot(X_test[order, 0], Y_pred[order], c="tab:red", label="Predicted")
        if Y_pred_var is not None:
            std = np.sqrt(Y_pred_var)
            plt.fill_between(X_test[order, 0], (Y_pred - 2 * std)[order],
                             (Y_pred + 2 * std)[order], color="tab:red", alpha=0.2,
                             label="±2σ")
        plt.xlabel("X"); plt.ylabel("Y"); plt.legend()
    else:
        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        axes[0].scatter(Y_true, Y_pred, s=18, alpha=0.7)
        lims = [min(Y_true.min(), Y_pred.min()), max(Y_true.max(), Y_pred.max())]
        axes[0].plot(lims, lims, "k--", lw=1)
        axes[0].set_xlabel("True"); axes[0].set_ylabel("Predicted")
        axes[0].set_title("Parity")
        resid = Y_true - Y_pred
        if Y_pred_var is not None:
            axes[1].errorbar(np.arange(len(resid)), resid,
                             yerr=2 * np.sqrt(Y_pred_var), fmt="o", ms=3,
                             alpha=0.6, elinewidth=0.7)
            axes[1].set_title("Residuals ±2σ")
        else:
            axes[1].scatter(np.arange(len(resid)), resid, s=10)
            axes[1].set_title("Residuals")
        axes[1].axhline(0.0, color="k", lw=1, ls="--")
    ann = []
    if config:
        ann.append(", ".join(f"{k}={v}" for k, v in config.items()))
    if nlpd_info:
        ann.append(", ".join(f"{k}={v:.4f}" for k, v in nlpd_info.items()))
    fig.suptitle(title + ("\n" + " | ".join(ann) if ann else ""), fontsize=10)
    return _save(fig, save_plot, output_dir, "predictions.png")


def plot_real_world_dataset(X, Y, dataset_name="unknown", region=None,
                            save_plot=True, output_dir="plots") -> Optional[str]:
    """Real-world dataset visualization — 2D datasets get a 6-panel figure
    (spatial scatter, target histogram, per-axis marginals, stats table),
    3D datasets a 4-panel one (real_world_datasets.py:586-790)."""
    d = X.shape[1]
    cmap = "terrain" if "srtm" in dataset_name else "coolwarm"
    stats = [
        ["samples", f"{len(Y)}"],
        ["Y mean", f"{Y.mean():.3f}"],
        ["Y std", f"{Y.std():.3f}"],
        ["Y range", f"[{Y.min():.2f}, {Y.max():.2f}]"],
    ]
    title = f"{dataset_name}" + (f" ({region})" if region else "")

    if d == 2:
        fig, axes = plt.subplots(2, 3, figsize=(15, 8))
        sc = axes[0][0].scatter(X[:, 1], X[:, 0], c=Y, cmap=cmap, s=8)
        plt.colorbar(sc, ax=axes[0][0])
        axes[0][0].set_title("spatial field"); axes[0][0].set_xlabel("x2"); axes[0][0].set_ylabel("x1")
        axes[0][1].hist(Y, bins=40, color="tab:blue", alpha=0.8)
        axes[0][1].set_title("target distribution")
        axes[0][2].scatter(X[:, 0], Y, s=6, alpha=0.5)
        axes[0][2].set_title("Y vs x1")
        axes[1][0].scatter(X[:, 1], Y, s=6, alpha=0.5)
        axes[1][0].set_title("Y vs x2")
        axes[1][1].hist2d(X[:, 1], X[:, 0], bins=30)
        axes[1][1].set_title("sampling density")
        axes[1][2].axis("off")
        axes[1][2].table(cellText=stats, loc="center")
        axes[1][2].set_title("stats")
    else:
        fig, axes = plt.subplots(1, 4, figsize=(18, 4))
        for i in range(min(3, d)):
            axes[i].scatter(X[:, i], Y, s=6, alpha=0.5)
            axes[i].set_title(f"Y vs x{i+1}")
        axes[3].axis("off")
        axes[3].table(cellText=stats, loc="center")
    fig.suptitle(title)
    return _save(fig, save_plot, output_dir, f"{dataset_name}_dataset.png")


def plot_convergence(nll_history: List[Dict], cv_history: List[Dict],
                     error_history: Optional[List[float]] = None,
                     save_plot=True, output_dir="results") -> Optional[str]:
    """NLL / CV-NLPD / GT-error evolution (main.py:2786-3094 analytics)."""
    n_panels = 2 + (1 if error_history else 0)
    fig, axes = plt.subplots(1, n_panels, figsize=(5 * n_panels, 4))
    iters = [h["iteration"] for h in nll_history]
    axes[0].plot(iters, [h["total_nll"] for h in nll_history], "o-", ms=3)
    axes[0].set_xlabel("iteration"); axes[0].set_title("Total NLL")
    if cv_history:
        cvi = [h["iteration"] for h in cv_history]
        cvs = [h["consensus_cv_score"] for h in cv_history]
        axes[1].plot(cvi, cvs, "o-", ms=3, c="tab:green")
    axes[1].set_xlabel("iteration"); axes[1].set_title("CV-NLPD of consensus z")
    if error_history:
        axes[2].plot(iters[: len(error_history)], error_history, "o-", ms=3, c="tab:red")
        axes[2].set_xlabel("iteration")
        axes[2].set_title("Riemannian distance to ground truth")
    fig.tight_layout()
    return _save(fig, save_plot, output_dir, "convergence.png")
