"""Runtime configuration knobs.

``use_pallas``: "auto" (default) enables the fused Pallas circuit kernel on
TPU backends for circuits where it wins (measured: ~1x at 4 qubits, 2.5x at
8, ~9x at 12 over the XLA gate-by-gate path); "on"/"off" force it. Settable
via env ``DQGP_USE_PALLAS`` or ``dqgp_tpu.config.use_pallas = ...``.
"""

from __future__ import annotations

import os

use_pallas: str = os.environ.get("DQGP_USE_PALLAS", "auto")

# Pallas pays off once the state no longer fits XLA's loop fusions (measured
# on v5e: XLA matches pallas through 8 qubits, pallas wins ~9x at 12); below
# this qubit count the XLA path is equally fast, compiles quicker, and vmaps
# freely over agents.
PALLAS_MIN_QUBITS: int = int(os.environ.get("DQGP_PALLAS_MIN_QUBITS", "10"))


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


def supports_complex128() -> bool:
    """complex128 exists on CPU and GPU; TPU-class backends cannot even
    convert c64->c128 ("Unsupported CVT X64 expansion")."""
    import jax

    return jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")
