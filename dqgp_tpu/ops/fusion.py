"""Trace-time gate fusion for the circuit engine (round-5 MXU/VPU pass).

The reference simulates every gate of the encoding circuit individually inside
qiskit-aer (agent_riemannian.py:116-119, main.py:245). The round-4 roofline
showed our fused-VMEM Pallas kernel is VPU-bound with ~2x mask/select overhead
per gate — so the next factor comes from issuing FEWER state sweeps, not from
scheduling the same ones better. Two algebraic fusions do that:

1. **SU(2) fusion** — maximal runs of uncontrolled single-qubit gates on the
   same qubit (``H·RZ(x)·RY(p)`` in hubregtsen, ``RY·RZ`` in yz_cx,
   ``RY·RY·RZ`` in kyriienko, ``RX·RY·RZ`` in layered, cross-layer ``RY·RX``
   in chebyshev) are pre-multiplied into ONE generic 2x2 unitary per sample.
   The per-sample 2x2 products are computed OUTSIDE the kernel on (B,)-sized
   arrays (so cos/sin of gate angles leaves the hot loop entirely) and enter
   the kernel as 8 packed float rows per fused op. Applying a generic SU(2)
   costs about one rotation sweep, so a k-gate run gets ~k-fold cheaper.
   Controlled rotations (CRX/CRY) ride the same path as single-gate SU(2)
   ops with a control mask.

2. **Diagonal-run fusion** — RZ, CRZ, CZ and RZZ are all diagonal, hence
   mutually commuting. A maximal commuting run (e.g. an ENTIRE nearest-
   neighbour CRZ ring of chebyshev/hubregtsen — n gates) collapses into one
   phase op: ``state[i] *= exp(i * phi[i])`` with

       phi = C @ a_rows        # (2^n, K) static pattern  @  (K, B) angles

   The pattern matrix ``C`` is a trace-time constant (columns are the
   +-1/2-valued bit patterns of each member gate), so inside the Pallas
   kernel the phase accumulation is a single small MXU matmul followed by
   one cos/sin sweep — an n-gate ring costs ~1.5 gate sweeps instead of n.

Both fusions are pure reorderings/compositions of unitaries: gates on
disjoint qubits commute, and diagonal gates commute with each other, so the
fused program is mathematically identical to the original sequence. The
float64 XLA oracle (`statevector.state_from_angles`) remains unfused;
``tests/test_fusion.py`` pins the fused engines against it at 1e-12 (f64)
and f32-grade tolerances for all 8 encoding families.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import numpy as np

from .circuit import (
    CRX, CRY, CRZ, CX, CZ, H, RX, RY, RZ, RZZ, Circuit,
)

# Gate kinds that are diagonal in the computational basis.
_DIAG_KINDS = (RZ, CRZ, CZ, RZZ)
# Single-qubit (uncontrolled) gate kinds eligible for SU(2) runs.
_SU2_KINDS = (RX, RY, RZ, H)
# Gate kinds whose 2x2 matrix is real (products of these stay real).
_REAL_KINDS = (RY, H)


@dataclasses.dataclass(frozen=True)
class SU2Op:
    """A fused 2x2 unitary on one qubit (optionally controlled).

    ``gate_idxs`` are indices into ``circuit.gates`` in application order;
    ``slot`` is this op's index into the packed 8-row coefficient block.
    ``real``/``diag`` are static structure flags used to skip dead terms.
    """

    qubit: int
    gate_idxs: Tuple[int, ...]
    slot: int
    control: int = -1
    real: bool = False
    diag: bool = False


@dataclasses.dataclass(frozen=True)
class PermOp:
    """A CX gate: static basis-state permutation."""

    qubit: int
    control: int


@dataclasses.dataclass(frozen=True)
class DiagOp:
    """A fused run of diagonal gates.

    ``members`` holds (kind, qubit, control, gate_idx) per member; CZ members
    carry gate_idx == -1 (their 'angle' is the constant pi). ``row_start`` is
    the first packed row of this op's K angle rows.
    """

    members: Tuple[Tuple[int, int, int, int], ...]
    row_start: int

    @property
    def K(self) -> int:
        return len(self.members)


@dataclasses.dataclass(frozen=True)
class FusedProgram:
    """The fused op sequence plus the packed-input row layout."""

    circuit: Circuit
    ops: Tuple
    n_su2: int
    n_rows: int  # total packed rows: 8 * n_su2 + sum of DiagOp K

    @property
    def num_state_sweeps(self) -> int:
        """Ops that touch the full state once (diag ops count ~2 for the
        cos/sin + complex-multiply sweeps) — the fusion figure of merit."""
        total = 0
        for op in self.ops:
            total += 2 if isinstance(op, DiagOp) else 1
        return total


def _qubits_of(op) -> frozenset:
    if isinstance(op, SU2Op):
        s = {op.qubit}
        if op.control >= 0:
            s.add(op.control)
        return frozenset(s)
    if isinstance(op, PermOp):
        return frozenset((op.qubit, op.control))
    raise TypeError(op)


class _DiagSeed:
    """Pass-1 marker for CZ / RZZ (fused into DiagOps in pass 2)."""

    def __init__(self, kind, qubit, control, gate_idx):
        self.kind, self.qubit, self.control, self.gate_idx = (
            kind, qubit, control, gate_idx)

    @property
    def qubits(self):
        return frozenset((self.qubit, self.control))


@functools.lru_cache(maxsize=256)
def fuse_circuit(circuit: Circuit) -> FusedProgram:
    """Run both fusion passes over a circuit's gate list."""
    # ---- pass 1: per-qubit SU(2) runs -------------------------------------
    pending: dict = {}  # qubit -> list of gate indices
    seq1: List = []

    def flush(q):
        idxs = pending.pop(q, None)
        if idxs:
            kinds = [circuit.gates[i].kind for i in idxs]
            seq1.append(SU2Op(
                qubit=q, gate_idxs=tuple(idxs), slot=-1,
                real=all(k in _REAL_KINDS for k in kinds),
                diag=all(k == RZ for k in kinds),
            ))

    for gi, g in enumerate(circuit.gates):
        if g.kind in _SU2_KINDS and g.control < 0:
            pending.setdefault(g.qubit, []).append(gi)
            continue
        flush(g.qubit)
        if g.control >= 0:
            flush(g.control)
        if g.kind == CX:
            seq1.append(PermOp(qubit=g.qubit, control=g.control))
        elif g.kind in (CZ, RZZ):
            seq1.append(_DiagSeed(g.kind, g.qubit, g.control,
                                  -1 if g.kind == CZ else gi))
        elif g.kind in (CRX, CRY, CRZ):
            seq1.append(SU2Op(
                qubit=g.qubit, gate_idxs=(gi,), slot=-1,
                control=g.control, real=(g.kind == CRY),
                diag=(g.kind == CRZ),
            ))
        else:  # pragma: no cover - kinds are exhaustive
            raise ValueError(f"unhandled gate kind {g.kind}")
    for q in sorted(pending):
        flush(q)

    # ---- pass 2: commuting diagonal runs ----------------------------------
    # A diagonal op joins the pending run; a non-diagonal op may be emitted
    # BEFORE the pending run iff it is disjoint from every run member (gates
    # on disjoint qubits commute). Each member therefore only ever commutes
    # past later non-diag ops that were verified disjoint at emission time.
    seq2: List = []
    pend_members: List[Tuple[int, int, int, int]] = []
    pend_sources: List = []
    pend_qubits: set = set()

    def flush_diag():
        nonlocal pend_members, pend_sources, pend_qubits
        if pend_members:
            if len(pend_sources) == 1 and isinstance(pend_sources[0], SU2Op):
                # A lone RZ run / CRZ costs one cheap roll-free sweep as a
                # diagonal SU(2); a K=1 DiagOp would cost ~2 sweeps.
                seq2.append(pend_sources[0])
            else:
                seq2.append(DiagOp(members=tuple(pend_members), row_start=-1))
        pend_members, pend_sources, pend_qubits = [], [], set()

    def diag_members(op):
        if isinstance(op, _DiagSeed):
            return [(op.kind, op.qubit, op.control, op.gate_idx)]
        # SU2Op that is purely diagonal: RZ run or a single CRZ
        out = []
        for gi in op.gate_idxs:
            g = circuit.gates[gi]
            out.append((g.kind, g.qubit, g.control, gi))
        return out

    for op in seq1:
        is_diag = isinstance(op, _DiagSeed) or (
            isinstance(op, SU2Op) and op.diag)
        if is_diag:
            pend_sources.append(op)
            for m in diag_members(op):
                pend_members.append(m)
                pend_qubits.add(m[1])
                if m[2] >= 0:
                    pend_qubits.add(m[2])
        else:
            if pend_members and (_qubits_of(op) & pend_qubits):
                flush_diag()
            seq2.append(op)
    flush_diag()

    # ---- assign slots / packed rows ---------------------------------------
    ops: List = []
    n_su2 = 0
    row = 0
    for op in seq2:
        if isinstance(op, SU2Op):
            ops.append(dataclasses.replace(op, slot=n_su2))
            n_su2 += 1
        elif isinstance(op, DiagOp):
            ops.append(dataclasses.replace(op, row_start=8 * 0 + row))
            row += op.K
        else:
            ops.append(op)
    # diag rows live AFTER the 8*n_su2 coefficient block
    final_ops = []
    for op in ops:
        if isinstance(op, DiagOp):
            final_ops.append(dataclasses.replace(
                op, row_start=8 * n_su2 + op.row_start))
        else:
            final_ops.append(op)
    return FusedProgram(
        circuit=circuit, ops=tuple(final_ops), n_su2=n_su2,
        n_rows=8 * n_su2 + row,
    )


# ---------------------------------------------------------------------------
# Packed-input builder (runs under jit, outside the Pallas kernel)
# ---------------------------------------------------------------------------


def _gate_matrix_entries(kind, half_c, half_s, one, zero):
    """2x2 entries (complex) of a gate given cos/sin of half its angle."""
    import jax.numpy as jnp

    if kind in (RX, CRX):
        ims = -1j * half_s
        return half_c + 0j, ims, ims, half_c + 0j
    if kind in (RY, CRY):
        return half_c + 0j, -half_s + 0j, half_s + 0j, half_c + 0j
    if kind in (RZ, CRZ):
        return half_c - 1j * half_s, zero, zero, half_c + 1j * half_s
    if kind == H:
        r = jnp.full_like(half_c, 0.7071067811865476) + 0j
        return r, r, r, -r
    raise ValueError(f"kind {kind} has no SU(2) matrix")


def su2_products(program: FusedProgram, angles):
    """Per-sample fused 2x2 unitaries for every SU2Op.

    angles: (B, G) real. Returns (u00, u01, u10, u11), each (B, n_su2)
    complex (complex128 iff angles are float64).
    """
    import jax.numpy as jnp

    circ = program.circuit
    B = angles.shape[0]
    cdtype = jnp.complex128 if angles.dtype == jnp.float64 else jnp.complex64
    zero = jnp.zeros((B,), cdtype)
    one = jnp.ones((B,), cdtype)
    cols = {k: [] for k in range(4)}
    for op in program.ops:
        if not isinstance(op, SU2Op):
            continue
        u00, u01, u10, u11 = one, zero, zero, one
        for gi in op.gate_idxs:
            g = circ.gates[gi]
            half = 0.5 * angles[:, gi]
            g00, g01, g10, g11 = _gate_matrix_entries(
                g.kind, jnp.cos(half), jnp.sin(half), one, zero)
            g00 = jnp.asarray(g00, cdtype); g01 = jnp.asarray(g01, cdtype)
            g10 = jnp.asarray(g10, cdtype); g11 = jnp.asarray(g11, cdtype)
            u00, u01, u10, u11 = (
                g00 * u00 + g01 * u10,
                g00 * u01 + g01 * u11,
                g10 * u00 + g11 * u10,
                g10 * u01 + g11 * u11,
            )
        cols[0].append(u00); cols[1].append(u01)
        cols[2].append(u10); cols[3].append(u11)
    if not cols[0]:
        e = jnp.zeros((B, 0), cdtype)
        return e, e, e, e
    return tuple(jnp.stack(cols[k], axis=1) for k in range(4))


def packed_inputs(program: FusedProgram, angles):
    """The (B, n_rows) float matrix the fused Pallas kernels consume.

    Row layout: SU2 slot s owns rows [8s, 8s+8) in the order
    (u00re, u00im, u01re, u01im, u10re, u10im, u11re, u11im); DiagOp angle
    rows follow, contiguous per op (CZ members contribute a constant-pi row).
    Always float32 — the packed path feeds the f32 Pallas kernels only.
    """
    import jax.numpy as jnp

    B = angles.shape[0]
    u00, u01, u10, u11 = su2_products(program, angles)
    blocks = []
    if program.n_su2:
        su2 = jnp.stack([
            jnp.real(u00), jnp.imag(u00), jnp.real(u01), jnp.imag(u01),
            jnp.real(u10), jnp.imag(u10), jnp.real(u11), jnp.imag(u11),
        ], axis=2)  # (B, n_su2, 8)
        blocks.append(su2.reshape(B, 8 * program.n_su2))
    for op in program.ops:
        if not isinstance(op, DiagOp):
            continue
        rows = []
        for kind, q, c, gi in op.members:
            if gi < 0:  # CZ: constant pi
                rows.append(jnp.full((B,), np.pi, angles.dtype))
            else:
                rows.append(angles[:, gi])
        blocks.append(jnp.stack(rows, axis=1))
    if not blocks:
        return jnp.zeros((B, 0), jnp.float32)
    return jnp.concatenate(blocks, axis=1).astype(jnp.float32)


def diag_patterns_concat(program: FusedProgram) -> np.ndarray:
    """All DiagOps' pattern matrices side by side: (2^n, K_total) float32.

    Column block for an op starts at ``op.row_start - 8 * n_su2`` (diag rows
    are allocated contiguously in op order). Returns a (2^n, 1) zero matrix
    when the program has no DiagOp so Pallas callers can pass a fixed input.
    """
    dim = program.circuit.dim
    blocks = [diag_pattern(op, program.circuit.num_qubits)
              for op in program.ops if isinstance(op, DiagOp)]
    if not blocks:
        return np.zeros((dim, 1), np.float32)
    return np.concatenate(blocks, axis=1).astype(np.float32)


def diag_pattern(op: DiagOp, num_qubits: int) -> np.ndarray:
    """Static (2^n, K) phase-pattern matrix C: phi = C @ member_angles.

    Column conventions (state[i] *= exp(i * phi[i])):
      RZ(q):     bit_q - 1/2
      CRZ(c,t):  bit_c * (bit_t - 1/2)
      CZ(c,t):   bit_c * bit_t            (angle row is the constant pi)
      RZZ(c,t):  (bit_c XOR bit_t) - 1/2
    """
    dim = 1 << num_qubits
    idx = np.arange(dim)
    C = np.zeros((dim, op.K), np.float64)
    for k, (kind, q, c, gi) in enumerate(op.members):
        bq = (idx >> q) & 1
        if kind == RZ:
            C[:, k] = bq - 0.5
        elif kind == CRZ:
            bc = (idx >> c) & 1
            C[:, k] = bc * (bq - 0.5)
        elif kind == CZ:
            bc = (idx >> c) & 1
            C[:, k] = bc * bq
        elif kind == RZZ:
            bc = (idx >> c) & 1
            C[:, k] = (bq ^ bc) - 0.5
        else:  # pragma: no cover
            raise ValueError(f"non-diagonal kind {kind} in DiagOp")
    return C


# ---------------------------------------------------------------------------
# Fused XLA engine (oracle cross-check + CPU execution of the fused program)
# ---------------------------------------------------------------------------


def state_from_angles_fused(circuit: Circuit, angles, dtype=None):
    """Run the FUSED program on |0..0> with plain XLA ops.

    Numerically validates the fusion algebra against the unfused oracle
    (1e-12 in complex128) and serves as the CPU path for the fused program.
    ``dtype`` defaults to complex128 for float64 angles else complex64.
    """
    import jax.numpy as jnp

    from .statevector import _control_mask, _merge, _split

    program = fuse_circuit(circuit)
    n = circuit.num_qubits
    if dtype is None:
        dtype = (jnp.complex128 if angles.dtype == jnp.float64
                 else jnp.complex64)
    rdtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    B = angles.shape[0]
    state = jnp.zeros((B, circuit.dim), dtype).at[:, 0].set(1.0)
    u00, u01, u10, u11 = su2_products(program, angles.astype(rdtype))
    u00 = u00.astype(dtype); u01 = u01.astype(dtype)
    u10 = u10.astype(dtype); u11 = u11.astype(dtype)

    for op in program.ops:
        if isinstance(op, SU2Op):
            s = op.slot
            a, b, c, d = (u[:, s, None, None] for u in (u00, u01, u10, u11))
            s0, s1 = _split(state, op.qubit, n)
            new = _merge(a * s0 + b * s1, c * s0 + d * s1, op.qubit, n)
            if op.control >= 0:
                mask = jnp.asarray(_control_mask(op.control, n))
                new = jnp.where(mask[None, :], new, state)
            state = new
        elif isinstance(op, PermOp):
            idx = np.arange(1 << n)
            perm = np.where((idx >> op.control) & 1, idx ^ (1 << op.qubit), idx)
            state = jnp.take(state, jnp.asarray(perm), axis=-1)
        else:  # DiagOp
            C = jnp.asarray(diag_pattern(op, n), rdtype)
            rows = []
            for kind, q, c, gi in op.members:
                rows.append(jnp.full((B,), np.pi, rdtype) if gi < 0
                            else angles[:, gi].astype(rdtype))
            a_rows = jnp.stack(rows, axis=1)              # (B, K)
            phi = a_rows @ C.T                            # (B, dim)
            state = state * (jnp.cos(phi) + 1j * jnp.sin(phi)).astype(dtype)
    return state
