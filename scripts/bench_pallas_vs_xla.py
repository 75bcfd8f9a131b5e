"""Re-measure the Pallas-vs-XLA Pauli-feature table with honest timings.

Uses the two-point chained-program method (bench._two_point_time): on the
axon TPU relay ``jax.block_until_ready`` does not block, so the round-1
table in docs/PERFORMANCE.md (measured with sync loops) is suspect. Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pallas_vs_xla.py
"""

import sys

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _two_point_time  # noqa: E402


def time_case(num_qubits, num_layers, batch):
    import jax
    import jax.numpy as jnp

    from dqgp_tpu.models.circuits import build_circuit
    from dqgp_tpu.ops.pallas_circuit import make_pallas_pauli_features_fn
    from dqgp_tpu.ops.statevector import (
        angle_matrix,
        pauli_features,
        state_from_angles,
    )

    circuit = build_circuit("chebyshev", num_qubits, 2, num_layers)
    rng = np.random.RandomState(1)
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (batch, 2)), jnp.float32)
    theta = jnp.asarray(
        rng.uniform(0, np.pi, circuit.num_parameters), jnp.float32
    )
    A = angle_matrix(circuit, X, theta)

    xla_fn = lambda a: pauli_features(state_from_angles(circuit, a), num_qubits)  # noqa: E731
    pal_fn = make_pallas_pauli_features_fn(circuit)

    def make_k(fn):
        def make_k_program(k):
            @jax.jit
            def f(a):
                def body(i, carry):
                    a_k, acc = carry
                    F = fn(a_k)
                    # data dependence serializes the chain
                    return (a_k + F[0, 0] * 1e-12, acc + F[0, 0])

                _, acc = jax.lax.fori_loop(0, k, body, (a, jnp.float32(0.0)))
                return acc

            return lambda: f(A)

        return make_k_program

    t_xla = _two_point_time(make_k(xla_fn), k_lo=8, k_hi=64)
    t_pal = _two_point_time(make_k(pal_fn), k_lo=8, k_hi=64)
    return t_xla, t_pal


def main():
    print("| qubits | layers | B | XLA | Pallas | speedup |")
    print("|---|---|---|---|---|---|")
    for nq, nl, b in [(4, 3, 1024), (8, 3, 4096), (12, 2, 2048)]:
        t_xla, t_pal = time_case(nq, nl, b)
        print(
            f"| {nq} | {nl} | {b} | {t_xla*1e3:.3f} ms | {t_pal*1e3:.3f} ms "
            f"| {t_xla/t_pal:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
