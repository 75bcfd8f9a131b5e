"""GP linear algebra with the reference's numerical-fallback semantics.

The reference's solve chain is Cholesky -> LU -> pinv
(agent_riemannian.py:414-428) and Cholesky -> explicit inverse in the predict
path (main.py:1450-1486). Under XLA a failed Cholesky yields NaNs instead of
raising, so the fallback is expressed as a ``lax.cond`` on finiteness: the
happy path stays a single fused Cholesky program, and the (rare) indefinite
case pays for an eigendecomposition-based pseudo-inverse. Both branches are
compiled once; only one executes per call.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


class SolveResult(NamedTuple):
    C_inv: jax.Array        # (N, N)
    C_inv_y: jax.Array      # (N,)
    logdet: jax.Array       # scalar
    chol_ok: jax.Array      # bool scalar
    L: jax.Array            # Cholesky factor (garbage if chol_ok is False)


def solve_psd_with_fallback(C: jax.Array, y: jax.Array, fallback: bool = True,
                            need_inverse: bool = True) -> SolveResult:
    """C^{-1}, C^{-1} y and logdet(C) via Cholesky, eigh-pinv on failure.

    Mirrors agent_riemannian.py:414-428 + the slogdet guard at :442-444 (the
    LU middle step is collapsed into the pinv branch: for any invertible C
    they agree to rounding; for singular C the reference also lands on pinv).

    ``fallback=False`` skips compiling the eigh branch entirely (a large
    compile-time cost on TPU); a failed Cholesky then yields non-finite
    outputs, which callers surface as inf NLL / failed folds — the same
    observable outcome as the reference's exception paths.

    ``need_inverse=False`` skips the O(N^3) explicit C^{-1} on the Cholesky
    path (posterior/CV callers only need L and C^{-1} y; the inverse is only
    required for the NLL gradient's bracket matrix) — ~4x less linalg work
    per GP fit.
    """
    n = C.shape[-1]
    eye = jnp.eye(n, dtype=C.dtype)
    L = jnp.linalg.cholesky(C)
    chol_ok = jnp.all(jnp.isfinite(L))
    L_safe = jnp.where(chol_ok, L, eye)

    def chol_branch(_):
        w = solve_triangular(L_safe, y, lower=True)
        C_inv_y = solve_triangular(L_safe.T, w, lower=False)
        if need_inverse:
            Vi = solve_triangular(L_safe, eye, lower=True)
            C_inv = solve_triangular(L_safe.T, Vi, lower=False)
        else:
            C_inv = jnp.zeros_like(C)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_safe)))
        return C_inv, C_inv_y, logdet

    def pinv_branch(_):
        # Rescue path for a failed Cholesky: eigendecomposition in f32 (f64
        # eigh compiles pathologically slowly on emulated-f64 TPU backends;
        # a matrix that defeated f64 Cholesky has no f64-accurate inverse
        # anyway — the reference's pinv end-state is equally approximate).
        w32, V32 = jnp.linalg.eigh(C.astype(jnp.float32))
        w, V = w32.astype(C.dtype), V32.astype(C.dtype)
        cutoff = jnp.max(jnp.abs(w)) * n * jnp.finfo(jnp.float32).eps
        w_inv = jnp.where(jnp.abs(w) > cutoff, 1.0 / w, 0.0)
        C_inv = (V * w_inv[None, :]) @ V.T
        C_inv_y = C_inv @ y
        logdet = jnp.sum(jnp.log(jnp.abs(w) + 1e-8))
        return C_inv, C_inv_y, logdet

    if fallback:
        C_inv, C_inv_y, logdet = lax.cond(chol_ok, chol_branch, pinv_branch, None)
    else:
        nan = jnp.asarray(jnp.nan, C.dtype)
        C_inv, C_inv_y, logdet = chol_branch(None)
        C_inv = jnp.where(chol_ok, C_inv, nan)
        C_inv_y = jnp.where(chol_ok, C_inv_y, nan)
        logdet = jnp.where(chol_ok, logdet, nan)
    return SolveResult(C_inv, C_inv_y, logdet, chol_ok, L_safe)


def condition_number(C: jax.Array, method: str = "auto") -> jax.Array:
    """2-norm condition number, resolvable past the reference's reporting
    buckets at 1e12/1e15 (main.py:2629-2642; np.linalg.cond at
    agent_riemannian.py:411, main.py:1441 is an f64 SVD).

    An f32 eigendecomposition cannot resolve cond beyond ~1e7 (absolute
    eigenvalue error ~ eps * lambda_max swamps small eigenvalues), so:

    * ``eigh`` (auto-selected on CPU): f64 ``eigvalsh`` — for the symmetric
      Grams this is applied to, |eigenvalues| == singular values, and eigh is
      far cheaper to compile and run than SVD.
    * ``iterative`` (auto-selected on TPU, where f64 eigendecompositions
      compile pathologically slowly): f64 power iteration for lambda_max and
      Cholesky inverse iteration for lambda_min — O(iters * N^2) matvecs /
      triangular solves, all MXU/VPU-friendly. Accurate to a few percent,
      ample for order-of-magnitude buckets. Indefinite/singular C (failed
      f64 Cholesky) reports inf, which lands in the reference's "Poor"
      bucket just as its ~1e16+ SVD estimates do.
    """
    if method == "auto":
        use_eigh = jax.config.jax_enable_x64 and jax.default_backend() == "cpu"
    else:
        use_eigh = method == "eigh"
    if use_eigh:
        dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        w = jnp.abs(jnp.linalg.eigvalsh(C.astype(dt)))
        cond = jnp.max(w, axis=-1) / jnp.min(w, axis=-1)
        return cond.astype(C.dtype)
    return _condition_number_iterative(C).astype(C.dtype)


def _condition_number_iterative(C: jax.Array, iters: int = 64) -> jax.Array:
    """Power iteration on C and (explicit) C^{-1}.

    The inverse is materialized once via two triangular solves with N
    right-hand sides — a single batched latency step — after which BOTH
    extremal eigenvalues are matmul-only power iterations that vmap freely
    over agents. (The textbook alternative, inverse iteration with two
    triangular solves per step, is latency-bound on emulated-f64 TPU:
    measured ~0.24 s/agent/ADMM-iteration vs microseconds for this form.)
    Indefinite/singular C (failed f64 Cholesky) reports inf.
    """
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    A = C.astype(dt)
    n = A.shape[-1]
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    # Deterministic non-degenerate start vector (no RNG inside jit).
    v0 = jnp.ones((n,), dt) + jnp.linspace(0.0, 0.5, n, dtype=dt)
    v0 = v0 / jnp.linalg.norm(v0)

    def power(M):
        def body(_, v):
            w = M @ v
            return w / jnp.maximum(jnp.linalg.norm(w), tiny)

        v = lax.fori_loop(0, iters, body, v0)
        return v @ (M @ v)

    lam_max = power(A)

    L = jnp.linalg.cholesky(A)
    ok = jnp.all(jnp.isfinite(L))
    L_safe = jnp.where(ok, L, jnp.eye(n, dtype=dt))
    Vi = solve_triangular(L_safe, jnp.eye(n, dtype=dt), lower=True)
    A_inv = solve_triangular(L_safe.T, Vi, lower=False)
    lam_min = 1.0 / jnp.maximum(power(A_inv), tiny)

    cond = jnp.abs(lam_max) / jnp.maximum(jnp.abs(lam_min), tiny)
    return jnp.where(ok, cond, jnp.asarray(jnp.inf, dt))


def masked_identity_pad(K: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero padded rows/cols of a Gram and put 1 on padded diagonal entries.

    Padded block becomes an identity: its Cholesky is trivial, its logdet
    contribution is 0, and it decouples from the real block — the device-side
    answer to ragged per-agent shard sizes (static shapes for XLA).
    """
    m2 = mask[:, None] * mask[None, :]
    return K * m2 + jnp.diag(1.0 - mask)
