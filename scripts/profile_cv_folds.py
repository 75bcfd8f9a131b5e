"""Profile the fused CV-fold device cost at the north-star shape.

The chained-dispatch measurement (driver, DQGP_TIMING=1) shows ~108 ms of
real device time per training iteration at the SRTM-1000 north star while
the ADMM step alone two-points at ~3 ms — the 5 fused CV folds are the
cost. This script two-point-times (bench._two_point_time) the pieces:

  * step only (mixed)            — reference point
  * cv_fold_scores_impl mixed    — the default fused fold scoring
  * cv_fold_scores_impl float32  — cheap-ordering mode
  * kernel_features only         — feature extraction share

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_cv_folds.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _two_point_time, make_problem  # noqa: E402
from dqgp_tpu.models.gp.cv import cv_fold_scores_impl, kfold_pad_indices  # noqa: E402
from dqgp_tpu.models.kernels.quantum_kernel import kernel_features  # noqa: E402


def main():
    spec, X, Y, _splits = make_problem()
    n_cv = 900
    Xj = jnp.asarray(X[:n_cv], jnp.float32)
    Yj = jnp.asarray(Y[:n_cv], jnp.float32)
    tr_i, tr_m, va_i, va_m = kfold_pad_indices(n_cv, 5, 0)
    P = spec.num_parameters
    theta0 = jnp.asarray(np.random.RandomState(0).uniform(0, np.pi, P),
                         jnp.float32)

    def chain(body, k):
        @jax.jit
        def run():
            def f(i, carry):
                th, acc = carry
                s = body(th)
                return th + 1e-6 * s, acc + s
            _, acc = jax.lax.fori_loop(0, k, f, (theta0, jnp.float32(0.0)))
            return acc
        return run

    def folds_body(cv_dtype):
        def body(th):
            scores = cv_fold_scores_impl(
                spec, Xj, Yj, th, tr_i, tr_m, va_i, va_m,
                noise_std=0.1, cv_dtype=cv_dtype)
            return jnp.sum(jnp.asarray(scores[0], jnp.float32))
        return body

    def features_body(th):
        F = kernel_features(spec, Xj, th)
        return jnp.sum(F).astype(jnp.float32)

    for name, body, k in [
        ("features", features_body, (8, 64)),
        ("folds f32", folds_body("float32"), (4, 24)),
        ("folds mixed", folds_body("mixed"), (4, 24)),
        ("folds f64", folds_body("float64"), (2, 8)),
    ]:
        t = _two_point_time(functools.partial(chain, body),
                            k_lo=k[0], k_hi=k[1])
        print(f"{name:14s} {t * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
