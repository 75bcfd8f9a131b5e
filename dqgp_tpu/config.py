"""Runtime configuration knobs.

``use_pallas``: "auto" (default) enables the fused Pallas circuit kernel on
TPU backends (measured with honest two-point timings: 8.3x at 4 qubits,
3.6x at 8, 9.4x at 12 over the XLA gate-by-gate path for Pauli features);
"on"/"off" force it. Settable via env ``DQGP_USE_PALLAS`` or
``dqgp_tpu.config.use_pallas = ...``.
"""

from __future__ import annotations

import os

use_pallas: str = os.environ.get("DQGP_USE_PALLAS", "auto")

# The fused kernel wins at every circuit size once timings are honest
# (two-point chained-program method, v5e: 8.3x at 4 qubits, 3.6x at 8,
# 9.4x at 12 for Pauli features; 2.6x on the whole f32 ADMM step at the
# 4-qubit north-star config). The old >=10 threshold came from pre-rewrite
# timings whose device sync did not actually block. Floor of 2 qubits =
# the smallest size the equality sweep covers on hardware.
PALLAS_MIN_QUBITS: int = int(os.environ.get("DQGP_PALLAS_MIN_QUBITS", "2"))

# Round-5 gate-fusion pass (ops/fusion.py): SU(2) runs pre-multiplied outside
# the kernel + diagonal rings collapsed to one MXU phase matmul. Default
# "auto" applies the pass only where the v5e roofline shows it WINNING
# (results_round5/pallas_roofline.json): the Pauli-FEATURE path at >= 10
# qubits (1.4x at 10q — the 2.2x sweep reduction nets out against a ~1.45x
# per-sweep cost for generic SU(2)/phase ops plus a fixed ~0.13 ms/4096
# host-side coefficient precompute). At small dim the precompute dominates
# (0.12x at 4 qubits), and on the raw-STATES path (fidelity Gram) the fused
# kernel measured 0.94x at 10q — both keep the round-4 gate-by-gate kernel.
# "on" forces fusion everywhere, "off" nowhere. Env: DQGP_FUSION.
use_fusion: str = os.environ.get("DQGP_FUSION", "auto")

FUSION_MIN_QUBITS_FEATURES: int = int(
    os.environ.get("DQGP_FUSION_MIN_QUBITS", "10"))


def fusion_enabled(num_qubits: int | None = None,
                   path: str = "features") -> bool:
    """Measured fusion policy. ``path`` is "features" (Pauli features — the
    projected-kernel hot path) or "states" (raw statevectors / fidelity)."""
    if use_fusion == "off":
        return False
    if use_fusion == "on":
        return True
    if num_qubits is None:  # auto with no size context: be conservative
        return False
    return path == "features" and num_qubits >= FUSION_MIN_QUBITS_FEATURES


def pallas_enabled(num_qubits: int) -> bool:
    import jax

    mode = use_pallas
    if mode == "off":
        return False
    if mode == "on":
        return True
    backend = jax.default_backend()
    # the kernel is written in pallas.tpu — only TPU-class backends qualify
    return (backend not in ("cpu", "gpu", "cuda", "rocm")
            and num_qubits >= PALLAS_MIN_QUBITS)


def resolve_dtype_mode(mode: str) -> str:
    """Resolve a GP/CV linalg dtype mode ("auto" | "float64" | "mixed" |
    "float32") to a concrete one.

    "auto" picks "float64" where f64 is native LAPACK-grade (CPU/GPU) and
    "mixed" on TPU-class backends, where f64 is software-emulated and the
    mixed solver (``ops/linalg.solve_psd_mixed``: f32 factorization + f64
    refinement, with an automatic f64 re-run on refinement failure) gives
    f64-grade results at near-f32 cost — measured 29x faster ADMM
    iterations with bit-identical 4-dp trajectories.
    """
    if mode != "auto":
        return mode
    import jax

    return ("float64" if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")
            else "mixed")


def supports_complex128() -> bool:
    """complex128 exists on CPU and GPU; TPU-class backends cannot even
    convert c64->c128 ("Unsupported CVT X64 expansion")."""
    import jax

    return jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")


def resolve_gram_dtype(dtype: str) -> str:
    """Resolve a Gram/statevector-pipeline dtype request ("auto" | "float32"
    | "float64") to a concrete one — ONE home for the precision policy shared
    by the QuantumKernel facade, dataset generation, and noise fitting.

    "auto" picks float64 wherever the complex128 pipeline is native (CPU/GPU
    with x64 on) — reference-grade entries, matching qiskit-aer's double
    precision — and float32 on TPU-class backends (the production path).
    An EXPLICIT "float64" without x64 raises: jnp would silently build f32
    arrays and the caller would get f32-grade values under an f64 label.
    """
    import jax

    if dtype == "auto":
        return ("float64"
                if supports_complex128() and jax.config.jax_enable_x64
                else "float32")
    if dtype not in ("float32", "float64"):
        raise ValueError(
            f"dtype must be 'auto'/'float32'/'float64', got {dtype!r}")
    if dtype == "float64" and not jax.config.jax_enable_x64:
        raise ValueError(
            "dtype='float64' requires x64 (unset DQGP_X64=0 or enable "
            "jax_enable_x64); with x64 off the values would silently be "
            "float32-grade")
    return dtype
