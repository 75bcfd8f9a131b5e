"""Break down the fused per-training-iteration device program at the
north-star config (bench.make_problem): where do the ~9-10 ms go?

Variants (one per process — on the axon relay later-compiled executables in
a process run slower, so every timed program must be first-compiled):

  step          ADMM step only, gp_dtype=mixed        (bench mode "mixed")
  step_cv       step + 5 fused CV folds, cv_dtype=mixed  (the production
                per-iteration program, what --chain-iters scans over)
  step_cv_f32   step + 5 fused CV folds, cv_dtype=float32
  cv            5 fused CV folds only, cv_dtype=mixed
  cv_f32        5 fused CV folds only, cv_dtype=float32

Usage:  python scripts/profile_step_cv.py <variant>
        python scripts/profile_step_cv.py all   # fan out subprocesses
Prints one JSON line {"variant": ..., "iter_seconds": ...} per variant.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("step", "step_cv", "step_cv_f32", "cv", "cv_f32")


def run_variant(variant: str) -> float:
    import jax
    import jax.numpy as jnp

    import bench
    from dqgp_tpu.driver import init_admm_state
    from dqgp_tpu.models.gp.cv import cv_fold_scores_impl, kfold_pad_indices
    from dqgp_tpu.parallel import make_admm_step, make_agent_batch

    spec, X, Y, splits = bench.make_problem()
    batch = make_agent_batch(splits)
    theta0, psi0, _ = init_admm_state(bench.N_AGENTS, spec.num_parameters,
                                      42, bench.RHO)
    theta0, psi0 = jnp.asarray(theta0), jnp.asarray(psi0)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    idx = kfold_pad_indices(len(X), 5, 42)

    with_step = variant.startswith("step")
    with_cv = "cv" in variant
    cv_dtype = "float32" if variant.endswith("f32") else "mixed"

    step = make_admm_step(
        spec, None, rho=bench.RHO, L=bench.L_CONST, noise_std=bench.NOISE_STD,
        compute_cond=False, psd_fallback=True, gp_dtype="mixed",
    ) if with_step else None

    def make_k_program(k):
        @jax.jit
        def f(theta, psi):
            def body(i, carry):
                th, ps, acc = carry
                if with_step:
                    out = step(th, ps, batch)
                    th, ps = out.theta.astype(th.dtype), out.psi.astype(ps.dtype)
                    acc = acc + (jnp.sum(out.z) + jnp.sum(out.nll)).astype(acc.dtype)
                    z = out.z
                else:
                    # data-dependent parameter point so the chain cannot be
                    # collapsed: fold scores feed the next "z"
                    z = (th[0] + acc * 1e-9).astype(jnp.float64)
                if with_cv:
                    nlpds, r2s, rmses = cv_fold_scores_impl(
                        spec, Xj, Yj, z, *idx,
                        noise_std=bench.NOISE_STD, cv_dtype=cv_dtype)
                    acc = acc + (jnp.sum(nlpds) + jnp.sum(r2s)
                                 + jnp.sum(rmses)).astype(acc.dtype)
                return (th, ps, acc)

            th, ps, acc = jax.lax.fori_loop(
                0, k, body, (theta, psi, jnp.float32(0.0)))
            return jnp.sum(th) + jnp.sum(ps) + acc

        return lambda: f(theta0, psi0)

    k = {"step": (8, 48), "step_cv": (4, 24), "step_cv_f32": (8, 48),
         "cv": (4, 24), "cv_f32": (16, 128)}[variant]
    return bench._two_point_time(make_k_program, k_lo=k[0], k_hi=k[1])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all":
        print(json.dumps({"variant": which,
                          "iter_seconds": run_variant(which)}), flush=True)
        return
    env = dict(os.environ)
    env.setdefault("DQGP_COMPILE_CACHE", "/tmp/dqgp_cache")
    for v in VARIANTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=3600, env=env)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({"variant": v, "error": r.stderr[-500:]}),
                  flush=True)


if __name__ == "__main__":
    main()
