#!/usr/bin/env python
"""Fused-vs-unfused Pallas roofline (VERDICT r4 #1 done-check), trimmed.

The full curve script (scripts/pallas_roofline.py) re-measures the XLA
gate-by-gate engine at every qubit count; on the axon relay that is ~35 s of
compile per chained program and >50 min wall for the 6-program version. This
trimmed run measures exactly what the round-4 verdict's done-condition
needs, and merges the round-4 XLA baselines (same HEAD engine, unfused
oracle untouched since) for the columns it does not re-measure:

* q = 4:        feature path Pallas vs FUSED (bench-headline guard).
* q = 10, 12:   feature AND Gram, Pallas vs FUSED, plus a fresh XLA
                feature re-measurement (the >=2x target rows).

Rows are written to results_round5/pallas_roofline.json incrementally so a
timeout still leaves a usable partial table.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_roofline_fused.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _two_point_time  # noqa: E402
from scripts.pallas_roofline import FEATURE_BATCH, GRAM_N, LAYERS, _chain  # noqa: E402

OUT = "results_round5/pallas_roofline.json"


def measure(num_qubits, with_gram, with_xla):
    import jax  # noqa: F401
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
    prog = fuse_circuit(circuit)
    row["fused_state_sweeps"] = prog.num_state_sweeps

    B = FEATURE_BATCH
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (B, 2)), jnp.float32)
    A = angle_matrix(circuit, X, theta)
    pal = make_pallas_pauli_features_fn(circuit)
    fus = make_pallas_pauli_features_fused_fn(circuit)
    t_pal = _two_point_time(_chain(lambda a: jnp.sum(pal(a)), A), k_lo=8, k_hi=32)
    t_fus = _two_point_time(_chain(lambda a: jnp.sum(fus(a)), A), k_lo=8, k_hi=32)
    row["feat_pallas_ms"] = t_pal * 1e3
    row["feat_fused_ms"] = t_fus * 1e3
    row["feat_pallas_samples_per_s"] = B / t_pal
    row["feat_fused_samples_per_s"] = B / t_fus
    row["feat_fused_speedup_vs_pallas"] = t_pal / t_fus
    if with_xla:
        xla_feat = lambda a: jnp.sum(  # noqa: E731
            pauli_features(state_from_angles(circuit, a), num_qubits))
        t_xla = _two_point_time(_chain(xla_feat, A), k_lo=8, k_hi=32)
        row["feat_xla_ms"] = t_xla * 1e3
        row["feat_fused_speedup_vs_xla"] = t_xla / t_fus

    if with_gram:
        N = GRAM_N
        Xg = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 2)), jnp.float32)
        Ag = angle_matrix(circuit, Xg, theta)
        pal_states = make_pallas_states_fn(circuit)
        fus_states = make_pallas_states_fused_fn(circuit)

        def gram_pal(a):
            return jnp.sum(gram_from_features(spec, pal_states(a)))

        def gram_fus(a):
            return jnp.sum(gram_from_features(spec, fus_states(a)))

        tg_pal = _two_point_time(_chain(gram_pal, Ag), k_lo=4, k_hi=12)
        tg_fus = _two_point_time(_chain(gram_fus, Ag), k_lo=4, k_hi=12)
        row["gram_pallas_ms"] = tg_pal * 1e3
        row["gram_fused_ms"] = tg_fus * 1e3
        row["gram_pallas_entries_per_s"] = N * N / tg_pal
        row["gram_fused_entries_per_s"] = N * N / tg_fus
        row["gram_fused_speedup_vs_pallas"] = tg_pal / tg_fus
    return row


def main():
    t0 = time.time()
    r4 = json.load(open("results_round4/pallas_roofline.json"))
    r4_rows = {r["qubits"]: r for r in r4["rows"]}
    plan = [(4, False, False), (10, True, True), (12, True, True)]
    rows = []
    os.makedirs("results_round5", exist_ok=True)
    for q, with_gram, with_xla in plan:
        row = measure(q, with_gram, with_xla)
        for k, v in r4_rows.get(q, {}).items():
            row.setdefault("r4_" + k, v)
        rows.append(row)
        out = {"rows": rows, "feature_batch": FEATURE_BATCH, "gram_n": GRAM_N,
               "layers": LAYERS,
               "note": "trimmed fused run; r4_* fields = round-4 unfused "
                       "baselines at the same HEAD engine",
               "wall_s": round(time.time() - t0, 1)}
        with open(OUT, "w") as f:
            json.dump(out, f, indent=2)
        msg = (f"q={q} sweeps={row['fused_state_sweeps']}/{row['gates']} "
               f"feat {row['feat_pallas_ms']:.3f} -> {row['feat_fused_ms']:.3f} ms "
               f"({row['feat_fused_speedup_vs_pallas']:.2f}x)")
        if with_gram:
            msg += (f" | gram {row['gram_pallas_ms']:.2f} -> "
                    f"{row['gram_fused_ms']:.2f} ms "
                    f"({row['gram_fused_speedup_vs_pallas']:.2f}x)")
        print(msg, flush=True)
    print(f"wrote {OUT} ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
