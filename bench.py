#!/usr/bin/env python
"""Benchmark: north-star config per-iteration ADMM time on one TPU chip.

Config (BASELINE.md north star): SRTM-1000-shaped problem — N=1000 samples,
2D inputs, 4-qubit 3-layer chebyshev encoding, projected kernel + matern
outer, 4 agents, rho=L=100. Measures steady-state wall time of one full
bulk-synchronous ADMM iteration (consensus z-update + per-agent 2P+1 shifted
Grams + NLL gradients + theta/psi updates; P=40 -> 81 Gram evaluations per
agent per iteration).

``vs_baseline`` is measured against a NumPy implementation of the reference's
algorithmic structure on this host (per-shift Gram evaluations through a
NumPy statevector simulator + f64 LAPACK NLL), charitably batched over
samples (the reference simulates per pair through qiskit-aer and pays
process-pool pickling on top — see BASELINE.md: the reference publishes no
numbers, so this measured stand-in is the denominator). The baseline number
is cached in BASELINE_LOCAL.json after first measurement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_SAMPLES = 1000
N_AGENTS = 4
NUM_QUBITS = 4
NUM_LAYERS = 3
RHO = L_CONST = 100.0
NOISE_STD = 0.1
SHIFT = float(np.pi / 8)


def make_problem():
    from dqgp_tpu.data import split_data_numpy
    from dqgp_tpu.models.circuits import build_circuit
    from dqgp_tpu.models.kernels import QuantumKernelSpec

    spec = QuantumKernelSpec(
        circuit=build_circuit("chebyshev", NUM_QUBITS, 2, NUM_LAYERS),
        kernel_type="projected",
        outer_kernel="matern",
    )
    rng = np.random.RandomState(0)
    X = rng.uniform(-0.99, 0.99, (N_SAMPLES, 2))
    Y = np.sin(3 * X[:, 0]) * np.cos(2 * X[:, 1]) + 0.1 * rng.randn(N_SAMPLES)
    splits = split_data_numpy(X, Y, N_AGENTS, "regional")
    return spec, X, Y, splits


# ---------------------------------------------------------------------------
# NumPy baseline: the reference's per-iteration algorithm, vectorized
# ---------------------------------------------------------------------------


def _np_states(circuit, X, theta):
    """NumPy statevector batch (charitable stand-in for qiskit-aer)."""
    from dqgp_tpu.ops.circuit import CRX, CRY, CRZ, CX, CZ, H, RX, RY, RZ

    import dqgp_tpu.ops.statevector as sv
    import jax.numpy as jnp

    angles = np.asarray(sv.angle_matrix(circuit, jnp.asarray(X, jnp.float32),
                                        jnp.asarray(theta, jnp.float32)), np.float64)
    B = X.shape[0]
    n = circuit.num_qubits
    dim = 1 << n
    state = np.zeros((B, dim), np.complex128)
    state[:, 0] = 1.0
    for gi, g in enumerate(circuit.gates):
        a = angles[:, gi][:, None, None]
        q = g.qubit
        s = state.reshape(B, dim >> (q + 1), 2, 1 << q)
        s0, s1 = s[:, :, 0, :], s[:, :, 1, :]
        if g.kind == H:
            n0, n1 = (s0 + s1) / np.sqrt(2), (s0 - s1) / np.sqrt(2)
        elif g.kind in (RX, CRX):
            c, si = np.cos(a / 2), 1j * np.sin(a / 2)
            n0, n1 = c * s0 - si * s1, -si * s0 + c * s1
        elif g.kind in (RY, CRY):
            c, si = np.cos(a / 2), np.sin(a / 2)
            n0, n1 = c * s0 - si * s1, si * s0 + c * s1
        elif g.kind in (RZ, CRZ):
            e = np.exp(-0.5j * a)
            n0, n1 = e * s0, np.conj(e) * s1
        elif g.kind == CX:
            idx = np.arange(dim)
            perm = np.where((idx >> g.control) & 1, idx ^ (1 << q), idx)
            state = state[:, perm]
            continue
        elif g.kind == CZ:
            idx = np.arange(dim)
            sgn = np.where(((idx >> g.control) & 1) & ((idx >> q) & 1), -1.0, 1.0)
            state = state * sgn
            continue
        else:
            raise ValueError(g.kind)
        new = np.stack([n0, n1], axis=2).reshape(B, dim)
        if g.kind in (CRX, CRY, CRZ):
            idx = np.arange(dim)
            cmask = ((idx >> g.control) & 1).astype(bool)
            state = np.where(cmask[None, :], new, state)
        else:
            state = new
    return state


def _np_projected_gram(circuit, X, theta):
    from scipy.spatial.distance import cdist

    state = _np_states(circuit, X, theta)
    n = circuit.num_qubits
    dim = 1 << n
    feats = []
    for q in range(n):
        s = state.reshape(-1, dim >> (q + 1), 2, 1 << q)
        s0, s1 = s[:, :, 0, :], s[:, :, 1, :]
        cross = np.sum(np.conj(s0) * s1, axis=(1, 2))
        feats += [2 * np.real(cross), 2 * np.imag(cross),
                  np.sum(np.abs(s0) ** 2 - np.abs(s1) ** 2, axis=(1, 2))]
    F = np.stack(feats, axis=-1)
    d = cdist(F, F)
    k = d * np.sqrt(3.0)
    return (1.0 + k) * np.exp(-k)  # matern nu=1.5, length_scale=1


def baseline_iteration_time(spec, splits, n_params, repeats=1):
    """One reference-style ADMM iteration in NumPy/LAPACK: per agent,
    2P+1 full Gram evaluations (central difference) + NLL gradient."""
    circuit = spec.circuit
    times = []
    for _ in range(repeats):
        t0 = time.time()
        for X_i, Y_i in splits:
            theta = np.random.RandomState(0).uniform(0, np.pi, n_params)
            K = _np_projected_gram(circuit, X_i, theta)
            dK = np.zeros((n_params, len(X_i), len(X_i)))
            for p in range(n_params):
                tp = theta.copy(); tp[p] = (tp[p] + SHIFT) % np.pi
                tm = theta.copy(); tm[p] = (tm[p] - SHIFT) % np.pi
                Kp = _np_projected_gram(circuit, X_i, tp)
                Km = _np_projected_gram(circuit, X_i, tm)
                dK[p] = (Kp - Km) / (2 * SHIFT)
            C = K + NOISE_STD**2 * np.eye(len(X_i))
            Lc = np.linalg.cholesky(C)
            C_inv_y = np.linalg.solve(Lc.T, np.linalg.solve(Lc, Y_i))
            C_inv = np.linalg.solve(Lc.T, np.linalg.solve(Lc, np.eye(len(X_i))))
            bracket = C_inv - np.outer(C_inv_y, C_inv_y)
            grad = 0.5 * np.array([np.sum(bracket * dK[i].T) for i in range(n_params)])
            _ = grad
        times.append(time.time() - t0)
    return min(times)


def tpu_iteration_time(spec, splits, warmup=2, iters=10):
    import jax
    import jax.numpy as jnp

    from dqgp_tpu.driver import init_admm_state
    from dqgp_tpu.parallel import make_admm_step, make_agent_batch

    batch = make_agent_batch(splits)
    theta, psi, _ = init_admm_state(N_AGENTS, spec.num_parameters, 42, RHO)
    theta, psi = jnp.asarray(theta), jnp.asarray(psi)
    on_tpu = jax.devices()[0].platform != "cpu"
    step = make_admm_step(
        spec, None, rho=RHO, L=L_CONST, noise_std=NOISE_STD,
        compute_cond=False, psd_fallback=False,
        gp_dtype="float32" if on_tpu else "float64",
    )
    out = step(theta, psi, batch)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = step(out.theta, out.psi, batch)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = step(out.theta, out.psi, batch)
        jax.block_until_ready(out)  # sync per iteration, like the host loop
    return (time.time() - t0) / iters


def main():
    spec, X, Y, splits = make_problem()
    P = spec.num_parameters

    tpu_dt = tpu_iteration_time(spec, splits)

    cache_path = os.path.join(REPO, "BASELINE_LOCAL.json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            base = json.load(f)
        base_dt = base["baseline_iteration_seconds"]
    else:
        base_dt = baseline_iteration_time(spec, splits, P)
        with open(cache_path, "w") as f:
            json.dump({
                "baseline_iteration_seconds": base_dt,
                "description": "NumPy/LAPACK reference-style ADMM iteration "
                               "(per-shift Gram rebuilds, batched statevector), "
                               "north-star config, this host",
                "config": {"n": N_SAMPLES, "agents": N_AGENTS, "qubits": NUM_QUBITS,
                           "layers": NUM_LAYERS, "P": P},
            }, f, indent=2)

    print(json.dumps({
        "metric": "admm_iters_per_sec",
        "value": round(1.0 / tpu_dt, 4),
        "unit": "iterations/s (north-star SRTM-1000 config, 1 chip)",
        "vs_baseline": round(base_dt / tpu_dt, 2),
    }))


if __name__ == "__main__":
    main()
