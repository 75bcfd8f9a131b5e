"""Micro-breakdown of the mixed-dtype CV fold cost at the north star
(5 folds x 800-row training Grams): which emulated-f64 piece costs 6.6 ms?

Each variant times ONE isolated piece of the fold computation, vmapped over
the 5 folds and chained with bench._two_point_time (fresh process per
variant — later-compiled executables run slower on the axon relay).

Usage:  python scripts/profile_cv_micro.py <variant> | all
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("gram32", "chol32", "tri32", "cast64", "matvec64", "matmat64",
            "matpad64", "split3", "solve_mixed", "solve_f32")


def run_variant(variant: str) -> float:
    import jax
    import jax.numpy as jnp

    import bench
    from dqgp_tpu.models.gp.cv import kfold_pad_indices
    from dqgp_tpu.models.kernels.quantum_kernel import (
        gram_from_features, kernel_features)
    from dqgp_tpu.ops.linalg import masked_identity_pad, solve_psd_mixed
    from jax.scipy.linalg import solve_triangular

    spec, X, Y, splits = bench.make_problem()
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    tr_i, tr_m, va_i, va_m = kfold_pad_indices(len(X), 5, 42)
    theta = jnp.asarray([0.3] * spec.num_parameters, jnp.float64)

    F = jax.jit(lambda t: kernel_features(spec, Xj, t))(theta)
    F = jax.block_until_ready(F)
    noise2 = bench.NOISE_STD**2 + 1e-6

    def fold_quantities(ti, tm, vi):
        tmf = tm.astype(jnp.float32)
        F_tr = F[ti] * tmf[:, None]
        F_va = F[vi]
        y_tr = Yj[ti].astype(jnp.float32) * tmf
        K_tt = gram_from_features(spec, F_tr)
        K_vt = gram_from_features(spec, F_va, F_tr)
        C32 = masked_identity_pad(K_tt, tmf) + noise2 * jnp.diag(tmf)
        return C32, K_vt, y_tr

    # Precompute per-fold inputs once (outside the timed chain).
    C32s, K_vts, y_trs = jax.jit(jax.vmap(fold_quantities))(tr_i, tr_m, va_i)
    C64s = C32s.astype(jnp.float64)
    y64s = y_trs.astype(jnp.float64)
    L32s = jax.vmap(jnp.linalg.cholesky)(C32s)
    x64s = jax.vmap(lambda L, y: solve_triangular(
        L.T, solve_triangular(L, y, lower=True), lower=False))(
            L32s, y_trs).astype(jnp.float64)
    for a in (C32s, C64s, y64s, L32s, x64s, K_vts):
        jax.block_until_ready(a)

    def body_for(variant):
        if variant == "gram32":
            def body(t):
                C, K_vt, y = jax.vmap(fold_quantities)(tr_i, tr_m, va_i)
                return jnp.sum(C) + jnp.sum(K_vt) + jnp.sum(y) + t
        elif variant == "chol32":
            def body(t):
                L = jax.vmap(jnp.linalg.cholesky)(C32s + t * 1e-20)
                return jnp.sum(L) + t
        elif variant == "tri32":
            def body(t):
                def one(L, y, K_vt):
                    w = solve_triangular(L, y + t * 1e-20, lower=True)
                    x = solve_triangular(L.T, w, lower=False)
                    v = solve_triangular(L, K_vt.T, lower=True)
                    return jnp.dot(K_vt @ x, K_vt @ x) + jnp.sum(v * v)
                return jnp.sum(jax.vmap(one)(L32s, y_trs, K_vts)) + t
        elif variant == "cast64":
            def body(t):
                C64 = (C32s + t * 1e-20).astype(jnp.float64)
                return jnp.sum(C64).astype(jnp.float32) + t
        elif variant == "matvec64":
            def body(t):
                def one(C, x, y):
                    r1 = y - C @ (x + t.astype(jnp.float64) * 1e-20)
                    r2 = y - C @ (x + r1 * 1e-30)
                    r3 = y - C @ (x + r2 * 1e-30)
                    return jnp.linalg.norm(r3)
                return jnp.sum(jax.vmap(one)(C64s, x64s, y64s)).astype(jnp.float32) + t
        elif variant == "matmat64":
            # identical f64 arithmetic, but rank-2 dot shapes: does XLA's
            # f64 emulation keep the efficient path it uses for matmuls?
            def body(t):
                def one(C, x, y):
                    def mv(v):
                        return (C @ v[:, None])[:, 0]
                    r1 = y - mv(x + t.astype(jnp.float64) * 1e-20)
                    r2 = y - mv(x + r1 * 1e-30)
                    r3 = y - mv(x + r2 * 1e-30)
                    return jnp.linalg.norm(r3)
                return jnp.sum(jax.vmap(one)(C64s, x64s, y64s)).astype(jnp.float32) + t
        elif variant == "matpad64":
            # pad the RHS to 8 columns: does XLA's f64 emulation pick the
            # efficient (square-matmul) path once both output dims tile?
            def body(t):
                def one(C, x, y):
                    def mv(v):
                        vp = jnp.zeros((v.shape[0], 8), jnp.float64)
                        vp = vp.at[:, 0].set(v)
                        return (C @ vp)[:, 0]
                    r1 = y - mv(x + t.astype(jnp.float64) * 1e-20)
                    r2 = y - mv(x + r1 * 1e-30)
                    r3 = y - mv(x + r2 * 1e-30)
                    return jnp.linalg.norm(r3)
                return jnp.sum(jax.vmap(one)(C64s, x64s, y64s)).astype(jnp.float32) + t
        elif variant == "split3":
            # hi/lo split: 3 f32 MXU matvecs accumulated in f64 (residual
            # precision ~sqrt(N) * eps_f32 — enough for a ~1e-5 gate)
            C_hi = C32s  # = C64s.astype(f32) by construction
            C_lo = (C64s - C_hi.astype(jnp.float64)).astype(jnp.float32)

            def body(t):
                def one(Ch, Cl, x, y):
                    def mv(v):
                        vh = v.astype(jnp.float32)
                        vl = (v - vh.astype(jnp.float64)).astype(jnp.float32)
                        return ((Ch @ vh).astype(jnp.float64)
                                + (Ch @ vl).astype(jnp.float64)
                                + (Cl @ vh).astype(jnp.float64))
                    r1 = y - mv(x + t.astype(jnp.float64) * 1e-20)
                    r2 = y - mv(x + r1 * 1e-30)
                    r3 = y - mv(x + r2 * 1e-30)
                    return jnp.linalg.norm(r3)
                return jnp.sum(jax.vmap(one)(C_hi, C_lo, x64s, y64s)).astype(jnp.float32) + t
        elif variant == "solve_mixed":
            def body(t):
                def one(C, y):
                    r = solve_psd_mixed(C, y + t.astype(jnp.float64) * 1e-20,
                                        fallback=False, need_inverse=False,
                                        on_fail="flag")
                    return jnp.sum(r.C_inv_y) + r.logdet
                return jnp.sum(jax.vmap(one)(C64s, y64s)).astype(jnp.float32) + t
        else:  # solve_f32
            def body(t):
                def one(C, y):
                    L = jnp.linalg.cholesky(C + t * 1e-20)
                    w = solve_triangular(L, y, lower=True)
                    x = solve_triangular(L.T, w, lower=False)
                    return jnp.sum(x) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
                return jnp.sum(jax.vmap(one)(C32s, y_trs)) + t
        return body

    body = body_for(variant)

    def make_k_program(k):
        @jax.jit
        def f(t0):
            return jax.lax.fori_loop(0, k, lambda i, t: body(t), t0)
        return lambda: f(jnp.float32(0.0))

    return bench._two_point_time(make_k_program, k_lo=16, k_hi=128)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all":
        print(json.dumps({"variant": which,
                          "iter_seconds": run_variant(which)}), flush=True)
        return
    env = dict(os.environ)
    env.setdefault("DQGP_COMPILE_CACHE", "/tmp/dqgp_cache")
    for v in VARIANTS:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), v],
                           capture_output=True, text=True, timeout=3600,
                           env=env)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({"variant": v, "error": r.stderr[-500:]}),
                  flush=True)


if __name__ == "__main__":
    main()
