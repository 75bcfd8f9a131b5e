#!/usr/bin/env python
"""Record pinned-seed parity targets for BASELINE configs #1-#4.

The reference publishes no numbers and its pip stack (squlearn 0.9.1 /
qiskit-aer) is unavailable offline (BASELINE.md), so these targets are this
repo's OWN CPU float64 parity-mode results at fixed seeds — the anchor that
makes future performance work provably non-regressive
(tests/test_parity_targets.py regresses against this file).

Every run: CPU backend, gp/cv dtype float64, parity rounding on, central
difference h=pi/8, seed 42 everywhere, --max-iter 5 (enough iterations for
CV-NLPD selection to move while keeping the recording reproducible in
minutes). SRTM regions use the deterministic loader seed (the reference's
time-based SRTM seed is patched to args.seed, per BASELINE.md step 2).

Usage: JAX_PLATFORMS=cpu python scripts/record_parity_targets.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Parity anchors must come from KNOWN data: a dedicated directory holding
# only the deterministic synthetic tiles. Recording from srtm_data/ would
# silently pick up real tiles if a workspace has them (gitignored), and the
# bit-exact regression test would then fail on every fresh checkout.
SYNTH_TILE_DIR = os.path.join(REPO, "srtm_data_synth")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def run_config(name, *, encoding, qubits, layers, dataset, n, n_agents,
               max_iter=5, region=None, kernel_type="projected",
               outer_kernel="matern", input_dim=2):
    from dqgp_tpu.data import generate_quantum_gp_data, split_data_numpy
    from dqgp_tpu.data.real_world import load_srtm_elevation_dataset
    from dqgp_tpu.driver import TrainConfig, train
    from dqgp_tpu.models.circuits import build_circuit
    from dqgp_tpu.models.gp import evaluate_predictions, predict_quantum_gp
    from dqgp_tpu.models.kernels import QuantumKernelSpec
    from sklearn.model_selection import train_test_split

    spec = QuantumKernelSpec(
        circuit=build_circuit(encoding, qubits, input_dim, layers),
        kernel_type=kernel_type,
        outer_kernel=outer_kernel,
    )
    theta_star = None
    if dataset == "quantum":
        X, Y, theta_star = generate_quantum_gp_data(
            num_samples=n, input_dim=input_dim, spec=spec,
            noise_std=0.1, param_seed=42, data_seed=42,
        )
    else:
        X, Y = load_srtm_elevation_dataset(
            region=region, max_samples=n, subsample_factor=10,
            random_state=42, data_dir=SYNTH_TILE_DIR,
        )
    Xtr, Xte, Ytr, Yte = train_test_split(X, Y, test_size=0.1, random_state=42)
    splits = split_data_numpy(Xtr, Ytr, n_agents=n_agents,
                              partition_method="regional")
    t0 = time.time()
    result = train(
        spec, splits, Xtr, Ytr,
        TrainConfig(max_iter=max_iter, verbose=False),
        ground_truth_params=theta_star,
    )
    hyper = result.z_best_cv if result.z_best_cv is not None else result.z
    mean, var = predict_quantum_gp(
        spec, jnp.asarray(Xtr), jnp.asarray(Ytr), jnp.asarray(Xte),
        jnp.asarray(hyper), noise_std=0.1,
    )
    m = evaluate_predictions(Yte, np.asarray(mean), np.asarray(var),
                             verbose=False)
    rec = {
        "config": {"encoding": encoding, "qubits": qubits, "layers": layers,
                   "kernel": (kernel_type if kernel_type == "fidelity"
                              else f"{kernel_type}+{outer_kernel}"),
                   "input_dim": input_dim, "dataset": dataset,
                   "region": region, "n": n, "agents": n_agents,
                   "max_iter": max_iter, "seed": 42},
        "cv_nlpd_best": round(result.cv_best, 6),
        "test_nlpd": round(float(m["nlpd"]), 6),
        "test_r2": round(float(m["r2"]), 6),
        "test_rmse": round(float(m["rmse"]), 6),
        "z_best": np.round(np.asarray(hyper), 4).tolist(),
        "wall_seconds": round(time.time() - t0, 1),
    }
    if theta_star is not None:
        rec["gt_recovery_riemannian"] = round(float(result.error_best), 6)
    print(f"{name}: cv_nlpd={rec['cv_nlpd_best']:.4f} "
          f"test_nlpd={rec['test_nlpd']:.4f} r2={rec['test_r2']:.4f} "
          f"({rec['wall_seconds']}s)")
    return rec


def main():
    # self-provision the deterministic synthetic tiles into their own dir
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_synthetic_tiles import ensure_tiles
    ensure_tiles(SYNTH_TILE_DIR)
    targets = {
        "recorded": "dqgp_tpu CPU float64 parity mode (see module docstring)",
        "configs": {
            # regression-test case: small & fast, regressed exactly by
            # tests/test_parity_targets.py
            "config1_small": run_config(
                "config1_small", encoding="hubregtsen", qubits=3, layers=1,
                dataset="quantum", n=240, n_agents=4, max_iter=3),
            # regression-test SRTM anchor: small & fast, regressed exactly
            # by tests/test_parity_targets.py (would have caught the silent
            # real->synthetic tile swap of 2026-08-16). Tiles are the
            # deterministic synthetics of scripts/make_synthetic_tiles.py --
            # srtm_data/ is gitignored, so synthetic tiles are what any
            # fresh checkout reproduces.
            "config2_small": run_config(
                "config2_small", encoding="chebyshev", qubits=4, layers=3,
                dataset="srtm", region="maharashtra", n=300, n_agents=4,
                max_iter=3),
            # BASELINE.md configs #1-#4 at their full shapes
            "config1": run_config(
                "config1", encoding="hubregtsen", qubits=3, layers=1,
                dataset="quantum", n=1000, n_agents=4),
            "config2_srtm_maharashtra": run_config(
                "config2", encoding="chebyshev", qubits=4, layers=3,
                dataset="srtm", region="maharashtra", n=1000, n_agents=4),
            "config3_srtm_oregon": run_config(
                "config3", encoding="chebyshev", qubits=4, layers=3,
                dataset="srtm", region="oregon_coast", n=1000, n_agents=4),
            "config3_srtm_great_lakes": run_config(
                "config3b", encoding="chebyshev", qubits=4, layers=3,
                dataset="srtm", region="great_lakes", n=1000, n_agents=4),
            "config4_srtm_washington": run_config(
                "config4", encoding="chebyshev", qubits=5, layers=4,
                dataset="srtm", region="washington_coast", n=1000, n_agents=4),
            # BASELINE config: fidelity kernel, 6-qubit kyriienko encoding,
            # synthetic sweep (1D and 3D endpoints recorded; the CG
            # Riemannian method the config names is inert in training by
            # reference quirk -- SURVEY.md par. 2.8)
            "config5_fidelity_kyriienko_1d": run_config(
                "config5_1d", encoding="kyriienko", qubits=6, layers=2,
                dataset="quantum", n=240, n_agents=4, max_iter=3,
                kernel_type="fidelity", input_dim=1),
            "config5_fidelity_kyriienko_3d": run_config(
                "config5_3d", encoding="kyriienko", qubits=6, layers=2,
                dataset="quantum", n=240, n_agents=4, max_iter=3,
                kernel_type="fidelity", input_dim=3),
        },
    }
    out = os.path.join(REPO, "PARITY_TARGETS.json")
    with open(out, "w") as f:
        json.dump(targets, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
