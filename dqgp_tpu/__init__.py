"""dqgp_tpu — TPU-native distributed Quantum Gaussian Process Regression.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``mpala-lab/distributed-quantum-gaussian-processes`` (quantum-kernel GPs whose
encoding-circuit parameters are optimized by multi-agent Riemannian ADMM
consensus on a torus manifold).

Architecture (TPU-first, not a port):

* ``dqgp_tpu.ops``      — circuit IR, batched statevector engine (XLA + Pallas),
                          GP linear algebra. The reference's per-pair C++
                          statevector calls (qiskit-aer) become one batched
                          state-preparation pass + Gram-as-matmul on the MXU.
* ``dqgp_tpu.models``   — encoding-circuit library, fidelity/projected quantum
                          kernels with outer kernels, GP posterior/NLL/metrics/CV.
* ``dqgp_tpu.manifold`` — torus manifold, Riemannian optimizers, ADMM algebra
                          (pure jittable functions; class API mirrors the
                          reference's public surface).
* ``dqgp_tpu.parallel`` — multi-agent execution on a ``jax.sharding.Mesh``:
                          agents are a named mesh axis, the consensus circular
                          mean is a ``psum`` of (cos, sin) sums, data stays
                          device-resident (the reference re-pickles every round
                          over ProcessPoolExecutor pipes).
* ``dqgp_tpu.data``     — synthetic quantum-GP sampling, classical test
                          functions, real-world loaders (SST / robot-push /
                          SRTM .hgt), partitioning, scalers.
* ``dqgp_tpu.utils``    — config/CLI (flag-compatible with the reference),
                          metrics history, plotting, checkpointing.

Precision: statevectors run in complex64 (fidelity entries are magnitudes —
well conditioned); Gram/Cholesky/NLPD run in float64 (XLA emulates f64 on TPU)
unless ``DQGP_X64=0``.
"""

from __future__ import annotations

import os

import jax

# Honor JAX_PLATFORMS even on hosts whose sitecustomize registers an
# overriding accelerator plugin (the axon image does): a user who exported
# JAX_PLATFORMS=cpu gets the CPU backend, not a hang inside the plugin's
# backend init when its relay is unreachable. The baked-in "axon" value is
# the image DEFAULT, not a user choice — re-pinning it here would clobber a
# script's explicit jax.config.update("jax_platforms", "cpu") made before
# importing this package (observed: a CPU-pinned script dying on axon
# backend init). So only a non-axon env value — necessarily a deliberate
# user export — wins over earlier pins.
_env_platforms = os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and _env_platforms != "axon":
    # A config value that is unset or still one of the image defaults (the
    # env value itself, or the axon plugin's register()-time 'axon'/
    # 'axon,cpu') is not a user choice — override it with the env export.
    # Anything else is an explicit jax.config.update(...) pin made by the
    # importing script: respect it and say so in one line, instead of
    # silently repinning to what a PARENT tool exported for its own
    # subprocesses (advisor finding, round 2).
    try:
        _cur = jax.config.jax_platforms
    except Exception:
        _cur = None
    if _cur in (None, "", _env_platforms, "axon", "axon,cpu"):
        try:
            jax.config.update("jax_platforms", _env_platforms)
        except Exception:
            pass  # backend already initialized — too late to repin
    elif _cur != _env_platforms:
        import sys as _sys

        print(
            f"dqgp_tpu: keeping explicit jax_platforms={_cur!r} "
            f"(env JAX_PLATFORMS={_env_platforms!r} not applied)",
            file=_sys.stderr,
        )

# GP-side linear algebra wants f64 for parity with the reference's LAPACK
# numerics; the statevector path explicitly uses complex64/float32 regardless.
if os.environ.get("DQGP_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to one-pass bf16 for f32 operands; Gram matrices built
# from nearly-parallel feature vectors then lose PSD-ness (observed: indefinite
# C -> NaN Cholesky on v5e). GP numerics need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Opt-in persistent compilation cache: DQGP_COMPILE_CACHE=<dir>. On the axon
# remote-compile relay a cold process pays minutes of compile time per
# program; a disk cache amortizes that across CLI/bench invocations. Off by
# default: on CPU the AOT cache is machine-feature-pinned (loading a cache
# written by a different host can SIGILL), and the relay backend's executable
# serialization support is environment-dependent.
_cache_dir = os.environ.get("DQGP_COMPILE_CACHE", "")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from . import manifold  # noqa: E402,F401


def __getattr__(name):  # lazy top-level conveniences (avoid import cycles)
    if name in ("QuantumKernelSpec", "QuantumKernel", "create_quantum_kernel"):
        from .models import kernels as _k

        return getattr(_k, name)
    if name == "build_circuit":
        from .models.circuits import build_circuit

        return build_circuit
    if name in ("TrainConfig", "TrainResult", "train"):
        from . import driver as _d

        return getattr(_d, name)
    if name == "RiemannianAgent":
        from .agent import RiemannianAgent

        return RiemannianAgent
    raise AttributeError(name)
