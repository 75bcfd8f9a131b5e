#!/usr/bin/env python
"""Benchmark: north-star config ADMM + Gram throughput on one TPU chip.

Config (BASELINE.md north star): SRTM-1000-shaped problem — N=1000 samples,
2D inputs, 4-qubit 3-layer chebyshev encoding, projected kernel + matern
outer, 4 agents, rho=L=100. P=40 -> 81 Gram evaluations per agent per
iteration.

Measured quantities (each in its OWN subprocess, and every timing uses the
two-point chained-program method of ``_two_point_time`` — on the axon TPU
relay ``jax.block_until_ready`` does not block, so loop-and-"sync" timings
would measure Python enqueue rates, not hardware):

* ``admm_iters_per_sec``        — f32-fast ADMM step (headline).
* ``admm_iters_per_sec_parity`` — reference defaults (direct f64 GP,
  Cholesky-failure fallback). Condition numbers are excluded from EVERY
  timed mode (compute_cond=False): they are reporting-only and the
  production default computes them off-device after training.
* ``admm_iters_per_sec_mixed``  — same features and f64-grade results via
  the mixed-precision solver (f32 factorization + f64 refinement,
  ops/linalg.solve_psd_mixed) — the recommended TPU mode.
* ``gram_entries_per_sec_chip`` — steady-state 1000x1000 projected Gram.
* ``nlpd_parity_ok``            — quality gate: 5 ADMM iterations in
  f32-fast AND mixed vs direct-f64 must select (near-)identical z, and the
  f64 CV-NLPD of all three must agree. A perf number only counts at parity.
* ``pallas_smoke_ok``           — on TPU, XLA-vs-Pallas Pauli-feature
  equality at 10 qubits is asserted BEFORE any timing (Mosaic drift guard);
  null on CPU hosts where the Pallas TPU kernel cannot run.

``vs_baseline`` compares the gated mixed-mode iteration time against a
NumPy implementation of the reference's algorithmic structure on this host
(per-shift Gram rebuilds through a batched NumPy statevector + f64 LAPACK
NLL — charitable: the real reference simulates per-pair via qiskit-aer and
adds two levels of process-pool pickling). Cached in BASELINE_LOCAL.json.
``vs_baseline_f64_direct`` / ``vs_baseline_f32`` are the same ratio for
the direct-f64 and raw-f32 modes.

Prints ONE JSON line with all fields.
"""

import json
import os
import subprocess
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
PARITY_Z_TOL = 5e-3     # z rounds to 4dp each iteration; tolerance covers
PARITY_NLPD_TOL = 0.05  # a last-digit flip, not a numerics divergence


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


def get_baseline_seconds(spec, splits):
    cache_path = os.path.join(REPO, "BASELINE_LOCAL.json")
    config = {"n": N_SAMPLES, "agents": N_AGENTS, "qubits": NUM_QUBITS,
              "layers": NUM_LAYERS, "P": spec.num_parameters}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        # a cached time only denominates vs_baseline honestly if it measured
        # THIS problem shape — recompute on any constant/spec change
        if cached.get("config") == config:
            return cached["baseline_iteration_seconds"]
    base_dt = baseline_iteration_time(spec, splits, spec.num_parameters)
    with open(cache_path, "w") as f:
        json.dump({
            "baseline_iteration_seconds": base_dt,
            "description": "NumPy/LAPACK reference-style ADMM iteration "
                           "(per-shift Gram rebuilds, batched statevector), "
                           "north-star config, this host",
            "config": config,
        }, f, indent=2)
    return base_dt


# ---------------------------------------------------------------------------
# Sub-benchmarks (each runs in its own process; prints one JSON line)
# ---------------------------------------------------------------------------


def _two_point_time(make_k_program, k_lo=4, k_hi=24, repeats=3,
                    min_delta=0.05, max_k=1 << 16):
    """Per-iteration device time via the two-point chained-program method.

    On the axon TPU relay ``jax.block_until_ready`` does NOT block (an
    8192^3 matmul "completes" in 0.03 ms while fetching one element of the
    result takes its real execution time), so timing enqueue loops measures
    Python dispatch, not hardware. Instead: compile one program that runs
    the iteration k times ON DEVICE (``lax.fori_loop``) and returns a
    scalar, force completion by fetching that scalar to the host, and take
    the slope between two chain lengths — the fixed relay round-trip
    (~25-30 ms) and the per-program dispatch cancel in the difference.

    For very cheap iterations the delta at the initial chain lengths can
    drown in relay-latency jitter (and even come out negative); when the
    measured delta is below ``min_delta`` seconds, the chain lengths
    escalate 4x and the measurement repeats, so the slope is always taken
    where the chained work dominates the noise. The per-iteration time is
    the MEDIAN over repeats of the paired difference — a min would pair a
    lucky-fast t_hi with an unlucky-slow t_lo and bias every number low
    (difference noise is two-sided, unlike single-measurement noise).
    If even max_k chains cannot clear the noise floor, this raises rather
    than floor-clamping: a negative or near-zero delta would otherwise
    publish absurd throughput with no error flag.
    """
    while True:
        f_lo, f_hi = make_k_program(k_lo), make_k_program(k_hi)
        float(f_lo())  # compile + first real run
        float(f_hi())
        deltas = []
        for _ in range(repeats):
            t0 = time.time()
            v_lo = float(f_lo())
            t_lo = time.time() - t0
            t0 = time.time()
            v_hi = float(f_hi())
            t_hi = time.time() - t0
            assert np.isfinite(v_lo) and np.isfinite(v_hi)
            deltas.append((t_hi - t_lo) / (k_hi - k_lo))
        per_iter = float(np.median(deltas))
        if per_iter * (k_hi - k_lo) >= min_delta:
            return per_iter
        if k_hi >= max_k:
            raise RuntimeError(
                f"two-point timing never cleared the noise floor: median "
                f"delta {per_iter * (k_hi - k_lo):.4f}s < {min_delta}s at "
                f"k_hi={k_hi} — relay too jittery for an honest number")
        k_lo, k_hi = k_hi, 4 * k_hi


def _admm_step_time(mode: str):
    import jax
    import jax.numpy as jnp

    from dqgp_tpu.driver import init_admm_state
    from dqgp_tpu.parallel import make_admm_step, make_agent_batch

    spec, X, Y, splits = make_problem()
    batch = make_agent_batch(splits)
    theta0, psi0, _ = init_admm_state(N_AGENTS, spec.num_parameters, 42, RHO)
    theta0, psi0 = jnp.asarray(theta0), jnp.asarray(psi0)
    # compute_cond=False in every mode: the driver's default cond_mode
    # ("auto" -> "host" on accelerators) keeps condition numbers OUT of the
    # device program — they backfill from an exact f64 eigvalsh on the CPU
    # backend after training. (An earlier version passed compute_cond=True
    # here, but the chain body below only carried theta/psi, so XLA
    # dead-code-eliminated the cond computation and the numbers silently
    # measured a cond-free step anyway — the in-program f64 cond path
    # actually costs ~118 ms/iter at this shape, 12x the rest of the step.)
    if mode == "parity":          # reference defaults: direct f64 + rescue
        step = make_admm_step(
            spec, None, rho=RHO, L=L_CONST, noise_std=NOISE_STD,
            compute_cond=False, psd_fallback=True, gp_dtype="float64",
        )
    elif mode == "mixed":         # f64-grade accuracy, f32 factorization
        step = make_admm_step(
            spec, None, rho=RHO, L=L_CONST, noise_std=NOISE_STD,
            compute_cond=False, psd_fallback=True, gp_dtype="mixed",
        )
    else:                         # raw f32 fast path
        step = make_admm_step(
            spec, None, rho=RHO, L=L_CONST, noise_std=NOISE_STD,
            compute_cond=False, psd_fallback=False, gp_dtype="float32",
        )

    def make_k_program(k):
        @jax.jit
        def f(theta, psi):
            # accumulate everything the driver's _pack fetches per iteration
            # (z, NLL + components, consensus norms ride on theta) so no
            # step output is dead code under the chain
            def body(i, carry):
                th, ps, acc = carry
                out = step(th, ps, batch)
                acc = acc + (jnp.sum(out.z) + jnp.sum(out.nll)
                             + jnp.sum(out.log_det_term)
                             + jnp.sum(out.quadratic_term)
                             + jnp.sum(out.constant_term)).astype(acc.dtype)
                return (out.theta.astype(th.dtype), out.psi.astype(ps.dtype),
                        acc)
            th, ps, acc = jax.lax.fori_loop(
                0, k, body, (theta, psi, jnp.float32(0.0)))
            return jnp.sum(th) + jnp.sum(ps) + acc
        return lambda: f(theta0, psi0)

    # start each mode's chains long enough that the two-point delta clears
    # the 50 ms noise floor WITHOUT escalation — every escalation round
    # compiles two more fori_loop programs (minutes each on the remote
    # relay) and has blown a subprocess timeout before
    k = {"f32": (16, 128), "mixed": (8, 48)}.get(mode, (4, 24))
    return _two_point_time(make_k_program, k_lo=k[0], k_hi=k[1])


def mode_admm_f32():
    print(json.dumps({"iter_seconds": _admm_step_time("f32")}))


def mode_admm_parity():
    print(json.dumps({"iter_seconds": _admm_step_time("parity")}))


def mode_admm_mixed():
    print(json.dumps({"iter_seconds": _admm_step_time("mixed")}))


def mode_pallas_smoke():
    """Own process: the smoke check compiles programs of its own, and on the
    axon relay later-compiled executables in a process run slower — timings
    must come from a fresh process."""
    import jax

    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        print(json.dumps({"pallas_smoke_ok": None}))
        return
    print(json.dumps({"pallas_smoke_ok": _pallas_smoke()}))


def mode_gram():
    """Steady-state 1000^2 Gram timing (first-compiled program in process)."""
    import jax
    import jax.numpy as jnp

    from dqgp_tpu.models.kernels.quantum_kernel import gram

    spec, X, Y, _ = make_problem()
    theta0 = jnp.asarray(
        np.random.RandomState(0).uniform(0, np.pi, spec.num_parameters), jnp.float32
    )
    Xj = jnp.asarray(X, jnp.float32)

    def make_k_program(k):
        @jax.jit
        def f(x, t):
            def body(i, carry):
                th, acc = carry
                K = gram(spec, x, th)
                # data dependence serializes the chain (no overlap/DCE)
                return (th + K[0, 0] * 1e-12, acc + K[0, 0])
            _, acc = jax.lax.fori_loop(0, k, body, (t, jnp.float32(0.0)))
            return acc
        return lambda: f(Xj, theta0)

    # a 1000^2 f32 Gram is ~0.1 ms — start the chain long enough that the
    # two-point delta clears relay jitter without escalation round-trips
    dt = _two_point_time(make_k_program, k_lo=256, k_hi=2048)
    print(json.dumps({
        "gram_seconds": dt,
        "entries_per_sec": N_SAMPLES * N_SAMPLES / dt,
    }))


def _pallas_smoke(batch: int = 256) -> bool:
    """XLA-vs-Pallas equality on the real chip (Mosaic drift guard — VERDICT
    r1 weak #5): Pauli features at the north-star size (4 qubits) and at 10
    qubits, plus the fidelity Gram through the Pallas states kernel. Complex
    arrays cannot cross the axon host boundary (fetch -> UNIMPLEMENTED), so
    the states check compares the real-valued Gram, exactly like production.
    """
    import jax
    import jax.numpy as jnp

    from dqgp_tpu.models.circuits import build_circuit
    from dqgp_tpu.ops.pallas_circuit import (
        make_pallas_pauli_features_fn,
        make_pallas_states_fn,
    )
    from dqgp_tpu.ops.statevector import angle_matrix, pauli_features, state_from_angles

    ok = True
    for num_qubits in (4, 10):
        circuit = build_circuit("chebyshev", num_qubits, 2, 2)
        rng = np.random.RandomState(1)
        X = jnp.asarray(rng.uniform(-0.9, 0.9, (batch, 2)), jnp.float32)
        theta = jnp.asarray(rng.uniform(0, np.pi, circuit.num_parameters), jnp.float32)
        A = angle_matrix(circuit, X, theta)
        pallas_feats = make_pallas_pauli_features_fn(circuit)

        def fid_gram(states):
            return jnp.abs(states @ states.conj().T) ** 2

        # ONE jitted program per qubit count (remote-relay compiles are
        # minutes each — separate programs per path blew the mode budget on
        # slow relay days). Both paths run jitted exactly as production
        # does; eager mode would also materialize weak complex scalars as
        # c128 (unsupported on TPU).
        if num_qubits == 4:
            @jax.jit
            def check(a):
                return (pauli_features(state_from_angles(circuit, a), 4),
                        pallas_feats(a),
                        fid_gram(state_from_angles(circuit, a)),
                        fid_gram(make_pallas_states_fn(circuit)(a)))

            ref, pal, g_xla, g_pal = (np.asarray(v) for v in check(A))
            ok = ok and bool(np.allclose(g_pal, g_xla, rtol=2e-4, atol=2e-5))
        else:
            @jax.jit
            def check(a):
                return (pauli_features(state_from_angles(circuit, a), num_qubits),
                        pallas_feats(a))

            ref, pal = (np.asarray(v) for v in check(A))
        ok = ok and bool(np.allclose(ref, pal, rtol=2e-4, atol=2e-5))
    return ok


def mode_probe():
    """Own process: is the device backend reachable at all? On this image a
    fresh init of the axon TPU plugin blocks indefinitely when its relay is
    down — the orchestrator bounds this probe with a short timeout so a dead
    relay costs minutes, not the sum of every mode's timeout budget."""
    import jax
    import jax.numpy as jnp

    n = len(jax.devices())
    v = float(jnp.ones((8, 8)).sum())
    assert v == 64.0
    print(json.dumps({"probe_ok": True, "backend": jax.default_backend(),
                      "n_devices": n}))


PARITY_GATE_ITERS = 25


def mode_parity_gate():
    """25 ADMM iterations f32-fast AND mixed vs f64-parity: per-iteration z
    agreement along the WHOLE trajectory plus final f64 CV-NLPD (the accuracy
    gate behind every non-f64 timing). 25 iterations (VERDICT r4 weak #2: the
    old 5-iteration gate was a smoke test — a slow mixed-vs-f64 divergence
    would have passed it)."""
    import jax.numpy as jnp

    from dqgp_tpu.driver import init_admm_state
    from dqgp_tpu.models.gp.cv import k_fold_cross_validation_consensus
    from dqgp_tpu.parallel import make_admm_step, make_agent_batch

    spec, X, Y, splits = make_problem()
    batch = make_agent_batch(splits)
    theta0, psi0, _ = init_admm_state(N_AGENTS, spec.num_parameters, 42, RHO)

    def run(gp_dtype, psd_fallback):
        # psd_fallback mirrors the TIMED configuration of each mode
        # (_admm_step_time: f32 False, parity/mixed True) — the gate must
        # certify the program the timing measured, not a stricter variant
        # that could NaN where the timed one rescues.
        theta, psi = jnp.asarray(theta0), jnp.asarray(psi0)
        step = make_admm_step(
            spec, None, rho=RHO, L=L_CONST, noise_std=NOISE_STD,
            compute_cond=False, psd_fallback=psd_fallback, gp_dtype=gp_dtype,
        )
        zs = []
        for _ in range(PARITY_GATE_ITERS):
            out = step(theta, psi, batch)
            theta, psi = out.theta, out.psi
            zs.append(np.asarray(out.z, np.float64))
        return np.stack(zs)  # (iters, P)

    z32 = run("float32", False)
    z64 = run("float64", True)
    zmx = run("mixed", True)
    # max over the whole trajectory, not just the final iterate — a mid-run
    # divergence that happened to re-converge would still trip this
    z_dev = float(np.max(np.abs(z32 - z64)))
    z_dev_f32_5it = float(np.max(np.abs(z32[:5] - z64[:5])))
    z_dev_mixed = float(np.max(np.abs(zmx - z64)))
    # per-iteration 4-dp equality (z quantizes to 4 decimals each iteration
    # under parity semantics; a boundary flip shows up here first)
    flips_f32 = int(np.sum(np.any(np.round(z32, 4) != np.round(z64, 4),
                                  axis=1)))
    flips_mixed = int(np.sum(np.any(np.round(zmx, 4) != np.round(z64, 4),
                                    axis=1)))
    z32, z64, zmx = z32[-1], z64[-1], zmx[-1]

    nlpds = {}
    for name, z in (("f32", z32), ("f64", z64), ("mixed", zmx)):
        cv = k_fold_cross_validation_consensus(
            spec, X, Y, z, NOISE_STD, k_folds=5, random_seed=42,
            cv_dtype="float64",
        )
        nlpds[name] = cv["mean_nlpd"]
    nlpd_dev = abs(nlpds["f32"] - nlpds["f64"])
    # The gate certifies the MIXED mode — the configuration behind
    # vs_baseline — along the full 25-iteration trajectory. Raw f32 is only
    # required to hold short-horizon (5-iteration) parity: measured on CPU
    # 2026-08-20, a 4-dp rounding-boundary flip forks the f32 trajectory
    # within ~10 iterations (z dev 3.1 by iter 25, landing on a DIFFERENT
    # valid optimum, CV-NLPD 0.80 vs f64's 1.32) — so a long-horizon f32
    # gate would measure chaotic divergence, not solver error. Its
    # long-horizon deviation is still reported below for the record.
    ok = bool(z_dev_f32_5it <= PARITY_Z_TOL
              and z_dev_mixed <= PARITY_Z_TOL
              and abs(nlpds["mixed"] - nlpds["f64"]) <= PARITY_NLPD_TOL
              and np.isfinite(nlpds["f64"]))
    print(json.dumps({
        "nlpd_parity_ok": ok,
        "parity_gate_iters": PARITY_GATE_ITERS,
        "z_max_abs_dev_f32_25it": z_dev,
        "z_max_abs_dev_f32_5it": z_dev_f32_5it,
        "z_max_abs_dev_mixed": z_dev_mixed,
        "z_4dp_flip_iters_f32": flips_f32,
        "z_4dp_flip_iters_mixed": flips_mixed,
        "nlpd_dev_f32_25it": nlpd_dev,
        "cv_nlpd_f32": nlpds["f32"],
        "cv_nlpd_f64": nlpds["f64"],
        "cv_nlpd_mixed": nlpds["mixed"],
    }))


def mode_admm_chained():
    """Chained-dispatch wall-clock ms/iter at chain_iters=50 (VERDICT r5 #5):
    the PRODUCTION fast path — driver.train with the fused step+CV body
    scanned 50 iterations per device program, one fetch per chunk. Unlike the
    two-point device timings this is honest END-TO-END wall time per
    iteration including host bookkeeping and the one fetch per 50 iterations.

    max_iter=150 -> 3 chunks; the first chunk absorbs compile, so the metric
    is the mean iter_time over iterations 50..149."""
    from dqgp_tpu.driver import TrainConfig, train

    spec, X, Y, splits = make_problem()
    cfg = TrainConfig(
        max_iter=150, chain_iters=50, noise_std=NOISE_STD, rho=RHO,
        L=L_CONST, gp_dtype="mixed", cv_dtype="mixed", compute_cond=False,
        cv_patience=10_000, tolerance=0.0, verbose=False,
    )
    res = train(spec, splits, X, Y, cfg)
    times = [row["iter_time"] for row in res.nll_history[50:]]
    if not times:
        raise RuntimeError("chained run stopped before the timed chunks")
    print(json.dumps({
        "chained_ms_per_iter": float(np.mean(times)) * 1e3,
        "chained_iters_measured": len(times),
        "chain_iters": 50,
    }))


MODES = {
    "probe": mode_probe,
    "admm_f32": mode_admm_f32,
    "admm_parity": mode_admm_parity,
    "admm_mixed": mode_admm_mixed,
    "pallas_smoke": mode_pallas_smoke,
    "gram": mode_gram,
    "parity_gate": mode_parity_gate,
    "admm_chained": mode_admm_chained,
}


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


def _run_mode(mode: str, timeout: int):
    # Persistent compile cache for the mode subprocess (verified on the axon
    # relay 2026-08-18: executable serialization works, warm-start cuts the
    # compile wall-clock). Compile time never enters the measurements — the
    # two-point method times only steady-state execution — so the cache only
    # trims each subprocess's setup minutes. Same-host reuse is safe (the
    # CPU AOT-cache SIGILL hazard is cross-machine cache sharing).
    env = dict(os.environ)
    env.setdefault("DQGP_COMPILE_CACHE", os.path.join(REPO, ".dqgp_cache"))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"{mode}: timeout after {timeout}s"}
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else "?"
        return {"error": f"{mode}: rc={proc.returncode}: {tail}"}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": f"{mode}: no JSON output"}


def main():
    # Reachability gate FIRST: it needs no baseline, and when the relay is
    # down every mode would burn its full timeout (hours in total) — while a
    # missing BASELINE_LOCAL.json would additionally pay the minutes-long
    # NumPy baseline for nothing. A healthy relay answers this probe in well
    # under a minute (device list + one tiny compiled program).
    probe_res = _run_mode("probe", 300)
    if "error" in probe_res:
        probe_res = _run_mode("probe", 900)
    if "error" in probe_res:
        print(json.dumps({
            "metric": "admm_iters_per_sec", "value": None,
            "unit": "iterations/s (north-star SRTM-1000 config, 1 chip)",
            "vs_baseline": None,
            "error": f"device backend unreachable: {probe_res['error']}",
        }))
        return

    spec, X, Y, splits = make_problem()
    base_dt = get_baseline_seconds(spec, splits)

    smoke_res = _run_mode("pallas_smoke", 1500)
    if "error" in smoke_res and "timeout" in smoke_res["error"]:
        # slow remote-compile relay day, not Mosaic drift — retry once with
        # a bigger budget before deciding anything
        smoke_res = _run_mode("pallas_smoke", 2400)
    smoke_timeout = "error" in smoke_res and "timeout" in smoke_res["error"]
    # The gate trips on an explicit mismatch AND on a CRASHED smoke
    # subprocess (a Mosaic compile failure is the likeliest drift symptom);
    # a clean null (CPU host) passes, and a persistent TIMEOUT degrades to
    # an un-gated run with the error recorded (zeroing the whole bench
    # because the relay was slow would be a false alarm).
    if smoke_res.get("pallas_smoke_ok") is False or (
            "error" in smoke_res and not smoke_timeout):
        # Mosaic drift: timing numbers would be untrustworthy — fail loudly
        # but still emit the (gated) record for the driver.
        print(json.dumps({
            "metric": "admm_iters_per_sec", "value": 0.0,
            "unit": "iterations/s (north-star SRTM-1000 config, 1 chip)",
            "vs_baseline": 0.0, "pallas_smoke_ok": False,
            "error": smoke_res.get("error", "pallas smoke failed"),
        }))
        return

    gram_res = _run_mode("gram", 1200)
    f32_res = _run_mode("admm_f32", 1500)
    par_res = _run_mode("admm_parity", 1500)
    mix_res = _run_mode("admm_mixed", 1500)
    if "error" in mix_res and "timeout" in mix_res["error"]:
        # the mixed timing feeds vs_baseline and the headline fallback —
        # worth one retry on a slow relay day
        mix_res = _run_mode("admm_mixed", 2400)
    gate_res = _run_mode("parity_gate", 1800)
    if "error" in gate_res and "timeout" in gate_res["error"]:
        # a timed-out attempt still warms the relay's compile cache, so a
        # same-budget retry typically completes in minutes (observed:
        # smoke 900s-timeout -> 102s pass)
        gate_res = _run_mode("parity_gate", 1800)
    chain_res = _run_mode("admm_chained", 2400)
    if "error" in chain_res and "timeout" in chain_res["error"]:
        # first-ever compile of the chained step+CV program is minutes on the
        # remote-compile relay; the persistent cache makes the retry cheap
        chain_res = _run_mode("admm_chained", 2400)

    f32_dt = f32_res.get("iter_seconds")
    par_dt = par_res.get("iter_seconds")
    mix_dt = mix_res.get("iter_seconds")
    # headline = raw f32; if that one mode failed (subprocess timeout on a
    # slow relay day), fall back to the gated mixed number rather than
    # recording null — any available timing beats none
    head_dt, head_unit = f32_dt, "iterations/s (north-star SRTM-1000 config, 1 chip)"
    if not head_dt and mix_dt:
        head_dt = mix_dt
        head_unit = ("iterations/s (north-star SRTM-1000 config, 1 chip; "
                     "mixed-solver mode — f32 timing unavailable this run)")
    record = {
        "metric": "admm_iters_per_sec",
        "value": round(1.0 / head_dt, 4) if head_dt else None,
        "unit": head_unit,
        # honest ratio: the mixed mode (f64-grade accuracy via f32
        # factorization + f64 refinement, cond + fallback on — gated below
        # to match the direct-f64 trajectory) vs the NumPy reference-style
        # baseline. Direct-f64 and raw-f32 ratios are reported alongside.
        "vs_baseline": round(base_dt / mix_dt, 2) if mix_dt else None,
        "vs_baseline_f64_direct": round(base_dt / par_dt, 2) if par_dt else None,
        "vs_baseline_f32": round(base_dt / f32_dt, 2) if f32_dt else None,
        "admm_iters_per_sec_parity": round(1.0 / par_dt, 4) if par_dt else None,
        "admm_iters_per_sec_mixed": round(1.0 / mix_dt, 4) if mix_dt else None,
        "gram_entries_per_sec_chip": (
            round(gram_res["entries_per_sec"], 1)
            if "entries_per_sec" in gram_res else None
        ),
        "chained_ms_per_iter": (
            round(chain_res["chained_ms_per_iter"], 3)
            if "chained_ms_per_iter" in chain_res else None
        ),
        "nlpd_parity_ok": gate_res.get("nlpd_parity_ok"),
        "parity_gate_iters": gate_res.get("parity_gate_iters"),
        "z_4dp_flip_iters_mixed": gate_res.get("z_4dp_flip_iters_mixed"),
        # raw f32 forks from the f64 trajectory over long horizons (4-dp
        # rounding-boundary flips; both end on valid optima) — reported, not
        # gated; the gated configuration is mixed, which backs vs_baseline
        "z_max_abs_dev_f32_25it": gate_res.get("z_max_abs_dev_f32_25it"),
        "nlpd_dev_f32_25it": gate_res.get("nlpd_dev_f32_25it"),
        "cv_nlpd_f32": gate_res.get("cv_nlpd_f32"),
        "cv_nlpd_f64": gate_res.get("cv_nlpd_f64"),
        "cv_nlpd_mixed": gate_res.get("cv_nlpd_mixed"),
        "z_max_abs_dev_mixed": gate_res.get("z_max_abs_dev_mixed"),
        # A persistent smoke TIMEOUT (distinct from a clean CPU-host null)
        # means the timing numbers below were published with the Mosaic
        # drift gate unexecuted — mark the record so downstream consumers
        # can tell an un-gated run from a CPU run (advisor finding, r2).
        "pallas_smoke_ok": ("timeout" if smoke_timeout
                            else smoke_res.get("pallas_smoke_ok")),
    }
    errors = [r["error"] for r in (smoke_res, gram_res, f32_res, par_res,
                                   mix_res, gate_res, chain_res)
              if "error" in r]
    if errors:
        record["errors"] = errors
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--mode":
        # the package init honors a non-axon JAX_PLATFORMS before any
        # backend init (the host sitecustomize would otherwise pin its
        # accelerator plugin and a CPU-targeted mode would hang on a dead
        # relay); mode bodies import jax before dqgp_tpu, so do it here
        import dqgp_tpu  # noqa: F401

        MODES[sys.argv[2]]()
    else:
        main()
