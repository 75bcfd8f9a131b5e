#!/usr/bin/env python
"""Pallas-vs-XLA throughput curve + roofline at 4-12 qubits (VERDICT r3 #4).

Measures, per qubit count (4/6/8/10/12, chebyshev 3 layers — the north-star
family):

* Pauli-FEATURE throughput (samples/s): the projected-kernel hot path,
  XLA gate-by-gate engine vs the fused VMEM Pallas kernel.
* Fidelity GRAM throughput (entries/s) at N=2048: batched state prep +
  |Psi Psi^H|^2 as two real MXU matmuls, XLA vs Pallas state prep.
* A traffic-model roofline: the XLA path re-materializes the (B, 2^n)
  complex64 state in HBM once per gate (read + write), so its HBM bound is
  t >= G * B * 2^n * 8 * 2 / BW_HBM. The Pallas kernel holds the state in
  VMEM across the whole gate sequence — its HBM traffic is just angles in +
  features out, and its bound is the VPU (elementwise rotations), estimated
  via flops ~= 8 * G * B * 2^n f32 ops (2 fused multiply-adds per complex
  amplitude pair per rotation).

All timings use the two-point chained-program method (bench._two_point_time)
— ``jax.block_until_ready`` does not block on the axon relay. Complex arrays
never cross the host boundary (axon cannot fetch complex64): every chained
program reduces to a real scalar inside jit.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_roofline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _two_point_time  # noqa: E402

HBM_BW = 819e9  # TPU v5e HBM bandwidth, bytes/s (public spec)

FEATURE_BATCH = 4096
GRAM_N = 2048
LAYERS = 3


def _chain(fn, arg):
    """k-chained jitted program with a data dependence; returns make_k."""
    import jax
    import jax.numpy as jnp

    def make_k(k):
        @jax.jit
        def f(a):
            def body(i, carry):
                a_k, acc = carry
                out = fn(a_k)
                return (a_k + out * 1e-12, acc + out)

            _, acc = jax.lax.fori_loop(0, k, body, (a, jnp.float32(0.0)))
            return acc

        return lambda: f(arg)

    return make_k


def measure(num_qubits):
    import jax
    import jax.numpy as jnp

    from dqgp_tpu.models.circuits import build_circuit
    from dqgp_tpu.models.kernels.quantum_kernel import (
        QuantumKernelSpec, gram_from_features,
    )
    from dqgp_tpu.ops.fusion import fuse_circuit
    from dqgp_tpu.ops.pallas_circuit import (
        make_pallas_pauli_features_fn,
        make_pallas_pauli_features_fused_fn,
        make_pallas_states_fn,
        make_pallas_states_fused_fn,
    )
    from dqgp_tpu.ops.statevector import (
        angle_matrix, pauli_features, state_from_angles,
    )

    circuit = build_circuit("chebyshev", num_qubits, 2, LAYERS)
    spec = QuantumKernelSpec(circuit=circuit, kernel_type="fidelity")
    G, dim = circuit.num_gates, circuit.dim
    rng = np.random.RandomState(1)
    theta = jnp.asarray(rng.uniform(0, np.pi, circuit.num_parameters),
                        jnp.float32)

    row = {"qubits": num_qubits, "layers": LAYERS, "gates": G, "dim": dim}

    # --- Pauli features: samples/s ---------------------------------------
    B = FEATURE_BATCH
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 2)), jnp.float32)
    A = angle_matrix(circuit, X, theta)
    # Reduce over the FULL batch: a [0]-row reduction would leave rows
    # 1..B-1 dead and license XLA's slice propagation to compute one
    # sample's state, voiding the measurement. (The originally recorded
    # curve used [0]-row sums; its XLA timings match the full-batch HBM
    # traffic model, confirming no DCE fired on that XLA version — full
    # sums remove the hazard for future re-runs.)
    xla_feat = lambda a: jnp.sum(  # noqa: E731
        pauli_features(state_from_angles(circuit, a), num_qubits))
    pal = make_pallas_pauli_features_fn(circuit)
    pal_feat = lambda a: jnp.sum(pal(a))  # noqa: E731
    fus = make_pallas_pauli_features_fused_fn(circuit)
    fus_feat = lambda a: jnp.sum(fus(a))  # noqa: E731
    t_xla = _two_point_time(_chain(xla_feat, A), k_lo=8, k_hi=32)
    t_pal = _two_point_time(_chain(pal_feat, A), k_lo=8, k_hi=32)
    t_fus = _two_point_time(_chain(fus_feat, A), k_lo=8, k_hi=32)
    row["feat_xla_ms"] = t_xla * 1e3
    row["feat_pallas_ms"] = t_pal * 1e3
    row["feat_fused_ms"] = t_fus * 1e3
    row["feat_xla_samples_per_s"] = B / t_xla
    row["feat_pallas_samples_per_s"] = B / t_pal
    row["feat_fused_samples_per_s"] = B / t_fus
    row["feat_speedup"] = t_xla / t_pal
    row["feat_fused_speedup_vs_pallas"] = t_pal / t_fus
    prog = fuse_circuit(circuit)
    row["fused_state_sweeps"] = prog.num_state_sweeps

    # roofline: XLA path HBM traffic = G gate passes x (read+write) state
    xla_bytes = G * B * dim * 8 * 2
    row["xla_hbm_bound_ms"] = xla_bytes / HBM_BW * 1e3
    row["xla_hbm_fraction"] = (xla_bytes / HBM_BW) / t_xla
    flops = 8.0 * G * B * dim
    row["gate_gflops"] = flops / 1e9
    row["pallas_achieved_gflops_per_s"] = flops / t_pal / 1e9
    # Pallas HBM traffic: angles in (G*B*4) + features out (B*3n*4)
    pal_bytes = G * B * 4 + B * 3 * num_qubits * 4
    row["pallas_hbm_bound_ms"] = pal_bytes / HBM_BW * 1e3

    # --- fidelity Gram: entries/s -----------------------------------------
    N = GRAM_N
    Xg = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 2)), jnp.float32)
    Ag = angle_matrix(circuit, Xg, theta)
    pal_states = make_pallas_states_fn(circuit)

    def gram_xla(a):
        F = state_from_angles(circuit, a)
        return jnp.sum(gram_from_features(spec, F))  # full-Gram reduction

    def gram_pal(a):
        F = pal_states(a)
        return jnp.sum(gram_from_features(spec, F))

    fus_states = make_pallas_states_fused_fn(circuit)

    def gram_fus(a):
        F = fus_states(a)
        return jnp.sum(gram_from_features(spec, F))

    tg_xla = _two_point_time(_chain(gram_xla, Ag), k_lo=4, k_hi=12)
    tg_pal = _two_point_time(_chain(gram_pal, Ag), k_lo=4, k_hi=12)
    tg_fus = _two_point_time(_chain(gram_fus, Ag), k_lo=4, k_hi=12)
    row["gram_xla_ms"] = tg_xla * 1e3
    row["gram_pallas_ms"] = tg_pal * 1e3
    row["gram_fused_ms"] = tg_fus * 1e3
    row["gram_xla_entries_per_s"] = N * N / tg_xla
    row["gram_pallas_entries_per_s"] = N * N / tg_pal
    row["gram_fused_entries_per_s"] = N * N / tg_fus
    row["gram_speedup"] = tg_xla / tg_pal
    row["gram_fused_speedup_vs_pallas"] = tg_pal / tg_fus
    # the matmul part: |Psi Psi^H|^2 = 2 real (N, 2d) @ (2d, N) products
    row["gram_matmul_gflop"] = 2 * (2.0 * N * N * 2 * dim) / 1e9
    return row


def main():
    t0 = time.time()
    rows = [measure(q) for q in (4, 6, 8, 10, 12)]
    out = {"rows": rows, "feature_batch": FEATURE_BATCH, "gram_n": GRAM_N,
           "hbm_bw_bytes_per_s": HBM_BW, "wall_s": round(time.time() - t0, 1)}
    os.makedirs("results_round5", exist_ok=True)
    path = "results_round5/pallas_roofline.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    hdr = ("| q | gates | sweeps | feat XLA ms | feat Pallas ms | feat "
           "FUSED ms | fused/pallas | gram XLA e/s | gram Pallas e/s | gram "
           "FUSED e/s | fused/pallas |")
    print(hdr)
    print("|" + "---|" * 11)
    for r in rows:
        print(f"| {r['qubits']} | {r['gates']} | {r['fused_state_sweeps']} "
              f"| {r['feat_xla_ms']:.3f} "
              f"| {r['feat_pallas_ms']:.3f} | {r['feat_fused_ms']:.3f} "
              f"| {r['feat_fused_speedup_vs_pallas']:.2f}x "
              f"| {r['gram_xla_entries_per_s']:.2e} "
              f"| {r['gram_pallas_entries_per_s']:.2e} "
              f"| {r['gram_fused_entries_per_s']:.2e} "
              f"| {r['gram_fused_speedup_vs_pallas']:.2f}x |", flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
