"""Pallas TPU kernel: the whole encoding circuit fused into one VMEM pass.

This is the BASELINE.md north-star kernel. The XLA reference path
(``statevector.py``) emits one (or a few) HBM-roundtripping ops per gate; this
kernel keeps the statevector batch resident in VMEM across the ENTIRE gate
sequence and, for projected kernels, also fuses the Pauli-expectation
reductions — HBM traffic drops from O(G * B * 2^n) to O(B * (G + features)).

Layout: the batch rides the lane axis (128 lanes fully used even for small
state dims), the 2^n state index rides the sublane axis:

    state_re, state_im : (2^n, TILE_B) float32
    angles             : (G, TILE_B)   float32  (transposed outside)

A gate on qubit q pairs sublanes i <-> i + 2^q; partners are fetched with
``pltpu.roll`` along the sublane axis (no wraparound can select a wrong
element: for bit q = 0, i + 2^q never overflows the axis, and the masked
select discards the wrapped half). Per-sample rotation angles broadcast along
sublanes as (1, TILE_B) rows.

The kernel body is generated per circuit (static Python loop over the gate
list) and compiled once per (circuit, batch-tile) shape. The XLA engine stays
as the numerics oracle; ``interpret=True`` makes the kernel testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .circuit import CRX, CRY, CRZ, CX, CZ, H, RX, RY, RZ, RZZ, Circuit
from .fusion import (
    DiagOp, PermOp, SU2Op, diag_pattern, diag_patterns_concat, fuse_circuit,
    packed_inputs,
)

_SQRT1_2 = 0.7071067811865476


def _tile_b(circuit: Circuit, batch: int) -> int:
    """Lane-aligned batch tile bounded by a VMEM budget for the state pair."""
    dim = circuit.dim
    budget = 6 * 1024 * 1024  # bytes for re+im (+ slack for partners)
    cap = max(128, (budget // (dim * 4 * 2)) // 128 * 128)
    return int(min(512, cap, max(128, ((batch + 127) // 128) * 128)))


def _bit_mask(dim: int, q: int):
    """(dim, 1) f32 mask of sublanes whose state-index bit q is 1."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (dim, 1), 0)
    return ((idx >> q) & 1).astype(jnp.float32)


def _apply_gates_ref(circuit: Circuit, a_ref, re_ref, im_ref):
    """Unrolled gate sequence on (2^n, TILE_B) state planes held in scratch
    refs — in-place writes bound live VMEM to ~4 state buffers regardless of
    gate count (pure SSA form made Mosaic stack-allocate tens of copies)."""
    dim = circuit.dim
    for gi, g in enumerate(circuit.gates):
        st_re = re_ref[:]
        st_im = im_ref[:]
        q, kind = g.qubit, g.kind
        s_dist = 1 << q

        if kind in (RX, RY, RZ, CRX, CRY, CRZ, RZZ):
            half = 0.5 * a_ref[gi : gi + 1, :]      # (1, TILE_B)
            c = jnp.cos(half)
            s = jnp.sin(half)

        if kind in (CX, CZ, CRX, CRY, CRZ):
            ctrl = _bit_mask(dim, g.control)        # (dim, 1)

        if kind == RZ or kind == CRZ:
            bit = _bit_mask(dim, q)
            sgn = 1.0 - 2.0 * bit                   # +1 at bit0, -1 at bit1
            new_re = c * st_re + sgn * s * st_im
            new_im = c * st_im - sgn * s * st_re
        elif kind == RZZ:
            bq = _bit_mask(dim, q)
            bc = _bit_mask(dim, g.control)
            agree = 1.0 - jnp.abs(bq - bc)          # 1 where bits equal
            sgn = 2.0 * agree - 1.0                 # e^{-i a/2 * sgn}
            new_re = c * st_re + sgn * s * st_im
            new_im = c * st_im - sgn * s * st_re
        elif kind == CZ:
            bq = _bit_mask(dim, q)
            flip = 1.0 - 2.0 * (bq * ctrl)
            new_re = st_re * flip
            new_im = st_im * flip
        else:
            bit = _bit_mask(dim, q)
            # pltpu.roll requires non-negative shifts: roll(-s) == roll(dim - s)
            pa_re = jnp.where(
                bit > 0.5,
                pltpu.roll(st_re, np.int32(s_dist), 0),
                pltpu.roll(st_re, np.int32(dim - s_dist), 0),
            )
            pa_im = jnp.where(
                bit > 0.5,
                pltpu.roll(st_im, np.int32(s_dist), 0),
                pltpu.roll(st_im, np.int32(dim - s_dist), 0),
            )
            if kind == H:
                sgn = 1.0 - 2.0 * bit
                new_re = (sgn * st_re + pa_re) * _SQRT1_2
                new_im = (sgn * st_im + pa_im) * _SQRT1_2
            elif kind == CX:
                re_ref[:] = jnp.where(ctrl > 0.5, pa_re, st_re)
                im_ref[:] = jnp.where(ctrl > 0.5, pa_im, st_im)
                continue
            elif kind in (RX, CRX):
                # [[c, -is], [-is, c]]
                new_re = c * st_re + s * pa_im
                new_im = c * st_im - s * pa_re
            elif kind in (RY, CRY):
                sgn = 2.0 * bit - 1.0               # -1 at bit0, +1 at bit1
                new_re = c * st_re + sgn * s * pa_re
                new_im = c * st_im + sgn * s * pa_im
            else:
                raise ValueError(f"unsupported gate kind {kind}")

        if kind in (CRX, CRY, CRZ):
            new_re = jnp.where(ctrl > 0.5, new_re, st_re)
            new_im = jnp.where(ctrl > 0.5, new_im, st_im)
        re_ref[:] = new_re
        im_ref[:] = new_im


def _apply_fused_ref(program, p_ref, c_ref, re_ref, im_ref):
    """Unrolled FUSED op sequence on (2^n, TILE_B) state planes (round 5).

    Op set after `fusion.fuse_circuit`: generic SU(2) (coefficients arrive as
    8 packed rows — all trig for fused single-qubit runs happens OUTSIDE the
    kernel), CX permutations, and diagonal runs whose phase accumulation is
    one small matmul ``C @ rows`` (MXU for K >= 8) + one cos/sin sweep — an
    n-gate CRZ ring costs ~1.5 sweeps instead of n. ``c_ref`` holds the
    concatenated static phase patterns (fusion.diag_patterns_concat).
    """
    circuit = program.circuit
    dim = circuit.dim
    n_su2 = program.n_su2
    for op in program.ops:
        st_re = re_ref[:]
        st_im = im_ref[:]
        if isinstance(op, DiagOp):
            K = op.K
            rows = p_ref[op.row_start : op.row_start + K, :]       # (K, T)
            off = op.row_start - 8 * n_su2
            if K >= 8:
                phi = jax.lax.dot_general(
                    c_ref[:, off : off + K], rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                phi = c_ref[:, off : off + 1] * rows[0:1, :]
                for k in range(1, K):
                    phi = phi + c_ref[:, off + k : off + k + 1] * rows[k : k + 1, :]
            cs = jnp.cos(phi)
            sn = jnp.sin(phi)
            re_ref[:] = cs * st_re - sn * st_im
            im_ref[:] = cs * st_im + sn * st_re
            continue

        q = op.qubit
        s_dist = 1 << q
        bit = _bit_mask(dim, q)
        bsel = bit > 0.5

        if isinstance(op, PermOp):
            ctrl = _bit_mask(dim, op.control)
            pa_re = jnp.where(
                bsel,
                pltpu.roll(st_re, np.int32(s_dist), 0),
                pltpu.roll(st_re, np.int32(dim - s_dist), 0),
            )
            pa_im = jnp.where(
                bsel,
                pltpu.roll(st_im, np.int32(s_dist), 0),
                pltpu.roll(st_im, np.int32(dim - s_dist), 0),
            )
            re_ref[:] = jnp.where(ctrl > 0.5, pa_re, st_re)
            im_ref[:] = jnp.where(ctrl > 0.5, pa_im, st_im)
            continue

        # SU2Op: rows (u00re, u00im, u01re, u01im, u10re, u10im, u11re, u11im)
        r0 = 8 * op.slot
        u = [p_ref[r0 + k : r0 + k + 1, :] for k in range(8)]      # (1, T) each
        a_re = jnp.where(bsel, u[6], u[0])       # bit0 -> u00, bit1 -> u11
        if op.diag:
            a_im = jnp.where(bsel, u[7], u[1])
            new_re = a_re * st_re - a_im * st_im
            new_im = a_re * st_im + a_im * st_re
        else:
            pa_re = jnp.where(
                bsel,
                pltpu.roll(st_re, np.int32(s_dist), 0),
                pltpu.roll(st_re, np.int32(dim - s_dist), 0),
            )
            pa_im = jnp.where(
                bsel,
                pltpu.roll(st_im, np.int32(s_dist), 0),
                pltpu.roll(st_im, np.int32(dim - s_dist), 0),
            )
            b_re = jnp.where(bsel, u[4], u[2])   # bit0 -> u01, bit1 -> u10
            if op.real:
                new_re = a_re * st_re + b_re * pa_re
                new_im = a_re * st_im + b_re * pa_im
            else:
                a_im = jnp.where(bsel, u[7], u[1])
                b_im = jnp.where(bsel, u[5], u[3])
                new_re = (a_re * st_re - a_im * st_im
                          + b_re * pa_re - b_im * pa_im)
                new_im = (a_re * st_im + a_im * st_re
                          + b_re * pa_im + b_im * pa_re)
        if op.control >= 0:
            ctrl = _bit_mask(dim, op.control)
            new_re = jnp.where(ctrl > 0.5, new_re, st_re)
            new_im = jnp.where(ctrl > 0.5, new_im, st_im)
        re_ref[:] = new_re
        im_ref[:] = new_im


def _init_state(dim: int, tile_b: int):
    idx = jax.lax.broadcasted_iota(jnp.int32, (dim, tile_b), 0)
    # NB: jnp.where with two weak python-float branches materializes f64 under
    # x64 mode, which Mosaic cannot lower — build the basis state via astype.
    st_re = (idx == 0).astype(jnp.float32)
    st_im = jnp.zeros((dim, tile_b), jnp.float32)
    return st_re, st_im


@functools.lru_cache(maxsize=64)
def make_pallas_states_fn(circuit: Circuit, interpret: bool = False) -> Callable:
    """angles (B, G) -> complex states (B, 2^n), fused single pass."""
    dim = circuit.dim
    G = max(circuit.num_gates, 1)

    def kernel(a_ref, re_ref, im_ref):
        tile_b = a_ref.shape[1]
        st_re, st_im = _init_state(dim, tile_b)
        re_ref[:] = st_re
        im_ref[:] = st_im
        _apply_gates_ref(circuit, a_ref, re_ref, im_ref)

    def run(angles: jax.Array) -> jax.Array:
        B = angles.shape[0]
        tile_b = _tile_b(circuit, B)
        B_pad = ((B + tile_b - 1) // tile_b) * tile_b
        At = jnp.zeros((G, B_pad), jnp.float32)
        At = At.at[: circuit.num_gates, :B].set(angles.T.astype(jnp.float32))
        grid = (B_pad // tile_b,)
        re, im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((G, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((dim, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((dim, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((dim, B_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(At)
        return (re[:, :B] + 1j * im[:, :B]).T

    return run


@functools.lru_cache(maxsize=64)
def make_pallas_states_fused_fn(circuit: Circuit, interpret: bool = False) -> Callable:
    """angles (B, G) -> complex states (B, 2^n) via the FUSED program.

    Same contract as ``make_pallas_states_fn`` but runs the gate-fused op
    sequence (see ``ops/fusion.py``): ~2-3x fewer state sweeps for the
    rotation-block + entangling-ring families (hubregtsen 48 gates -> 18
    sweeps at 4q/3L; chebyshev 40 -> 22)."""
    program = fuse_circuit(circuit)
    dim = circuit.dim
    R = max(program.n_rows, 1)
    Cmat = diag_patterns_concat(program)
    KT = Cmat.shape[1]

    def kernel(p_ref, c_ref, re_ref, im_ref):
        tile_b = p_ref.shape[1]
        st_re, st_im = _init_state(dim, tile_b)
        re_ref[:] = st_re
        im_ref[:] = st_im
        _apply_fused_ref(program, p_ref, c_ref, re_ref, im_ref)

    def run(angles: jax.Array) -> jax.Array:
        B = angles.shape[0]
        tile_b = _tile_b(circuit, B)
        B_pad = ((B + tile_b - 1) // tile_b) * tile_b
        P = packed_inputs(program, angles)                  # (B, n_rows) f32
        Pt = jnp.zeros((R, B_pad), jnp.float32)
        Pt = Pt.at[: program.n_rows, :B].set(P.T)
        grid = (B_pad // tile_b,)
        re, im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, KT), lambda i: (np.int32(0), np.int32(0)), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((dim, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((dim, B_pad), jnp.float32),
                jax.ShapeDtypeStruct((dim, B_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(Pt, jnp.asarray(Cmat))
        return (re[:, :B] + 1j * im[:, :B]).T

    return run


@functools.lru_cache(maxsize=64)
def make_pallas_pauli_features_fused_fn(circuit: Circuit, interpret: bool = False) -> Callable:
    """angles (B, G) -> Pauli features (B, 3n) via the FUSED program."""
    program = fuse_circuit(circuit)
    dim = circuit.dim
    n = circuit.num_qubits
    R = max(program.n_rows, 1)
    Cmat = diag_patterns_concat(program)
    KT = Cmat.shape[1]

    def kernel(p_ref, c_ref, f_ref, re_ref, im_ref):
        tile_b = p_ref.shape[1]
        st_re, st_im = _init_state(dim, tile_b)
        re_ref[:] = st_re
        im_ref[:] = st_im
        _apply_fused_ref(program, p_ref, c_ref, re_ref, im_ref)
        st_re = re_ref[:]
        st_im = im_ref[:]
        for q in range(n):
            s_dist = 1 << q
            bit = _bit_mask(dim, q)
            mask0 = 1.0 - bit
            pa_re = pltpu.roll(st_re, np.int32(dim - s_dist), 0)
            pa_im = pltpu.roll(st_im, np.int32(dim - s_dist), 0)
            cross_re = st_re * pa_re + st_im * pa_im
            cross_im = st_re * pa_im - st_im * pa_re
            f_ref[q : q + 1, :] = 2.0 * jnp.sum(mask0 * cross_re, axis=0, keepdims=True)
            f_ref[n + q : n + q + 1, :] = 2.0 * jnp.sum(mask0 * cross_im, axis=0, keepdims=True)
            prob = st_re * st_re + st_im * st_im
            f_ref[2 * n + q : 2 * n + q + 1, :] = jnp.sum(
                (1.0 - 2.0 * bit) * prob, axis=0, keepdims=True
            )

    def run(angles: jax.Array) -> jax.Array:
        B = angles.shape[0]
        tile_b = _tile_b(circuit, B)
        B_pad = ((B + tile_b - 1) // tile_b) * tile_b
        P = packed_inputs(program, angles)
        Pt = jnp.zeros((R, B_pad), jnp.float32)
        Pt = Pt.at[: program.n_rows, :B].set(P.T)
        grid = (B_pad // tile_b,)
        F = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, KT), lambda i: (np.int32(0), np.int32(0)), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * n, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * n, B_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((dim, tile_b), jnp.float32),
                pltpu.VMEM((dim, tile_b), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(Pt, jnp.asarray(Cmat))
        return F[:, :B].T

    return run


@functools.lru_cache(maxsize=64)
def make_pallas_pauli_features_fn(circuit: Circuit, interpret: bool = False) -> Callable:
    """angles (B, G) -> Pauli features (B, 3n): [X block, Y block, Z block].

    Fuses state preparation AND the per-qubit expectation reductions — the
    statevector never leaves VMEM."""
    dim = circuit.dim
    n = circuit.num_qubits
    G = max(circuit.num_gates, 1)

    def kernel(a_ref, f_ref, re_ref, im_ref):
        tile_b = a_ref.shape[1]
        st_re, st_im = _init_state(dim, tile_b)
        re_ref[:] = st_re
        im_ref[:] = st_im
        _apply_gates_ref(circuit, a_ref, re_ref, im_ref)
        st_re = re_ref[:]
        st_im = im_ref[:]
        for q in range(n):
            s_dist = 1 << q
            bit = _bit_mask(dim, q)
            mask0 = 1.0 - bit
            pa_re = pltpu.roll(st_re, np.int32(dim - s_dist), 0)
            pa_im = pltpu.roll(st_im, np.int32(dim - s_dist), 0)
            # <X_q> = 2 sum_{bit0} Re(conj(s0) s1); <Y_q> = 2 sum Im(...)
            cross_re = st_re * pa_re + st_im * pa_im
            cross_im = st_re * pa_im - st_im * pa_re
            f_ref[q : q + 1, :] = 2.0 * jnp.sum(mask0 * cross_re, axis=0, keepdims=True)
            f_ref[n + q : n + q + 1, :] = 2.0 * jnp.sum(mask0 * cross_im, axis=0, keepdims=True)
            prob = st_re * st_re + st_im * st_im
            f_ref[2 * n + q : 2 * n + q + 1, :] = jnp.sum(
                (1.0 - 2.0 * bit) * prob, axis=0, keepdims=True
            )

    def run(angles: jax.Array) -> jax.Array:
        B = angles.shape[0]
        tile_b = _tile_b(circuit, B)
        B_pad = ((B + tile_b - 1) // tile_b) * tile_b
        At = jnp.zeros((G, B_pad), jnp.float32)
        At = At.at[: circuit.num_gates, :B].set(angles.T.astype(jnp.float32))
        grid = (B_pad // tile_b,)
        F = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((G, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3 * n, tile_b), lambda i: (np.int32(0), i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * n, B_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((dim, tile_b), jnp.float32),
                pltpu.VMEM((dim, tile_b), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(At)
        return F[:, :B].T

    return run
