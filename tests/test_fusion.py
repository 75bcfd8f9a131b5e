"""Gate-fusion pass (ops/fusion.py) + fused Pallas kernels vs the unfused
XLA oracle.

The fusion algebra (SU(2) runs pre-multiplied per sample; commuting diagonal
runs collapsed to one phase op) must be EXACT: the fused f64 XLA engine is
pinned at 1e-12 against the unfused complex128 oracle for all 8 encoding
families, and the fused Pallas kernels (interpret mode here; the same code
compiles on TPU) at f32 grade.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dqgp_tpu.models.circuits import ENCODING_TYPES, build_circuit
from dqgp_tpu.ops import statevector as sv
from dqgp_tpu.ops.fusion import (
    DiagOp, PermOp, SU2Op, fuse_circuit, packed_inputs,
    state_from_angles_fused,
)
from dqgp_tpu.ops.pallas_circuit import (
    make_pallas_pauli_features_fused_fn,
    make_pallas_states_fused_fn,
)


def _case(enc, n, d, L, batch=6, seed=0, dtype=jnp.float64):
    c = build_circuit(enc, n, d, L)
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (batch, d)), dtype)
    theta = jnp.asarray(rng.uniform(0, np.pi, c.num_parameters), dtype)
    return c, sv.angle_matrix(c, X, theta, dtype)


@pytest.mark.parametrize("enc", ENCODING_TYPES)
def test_fused_xla_matches_oracle_f64(enc):
    """Fusion is algebraically exact: 1e-12 in complex128."""
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    for (n, d, L) in [(2, 1, 1), (3, 2, 2), (4, 2, 3)]:
        c, ang = _case(enc, n, d, L)
        want = np.asarray(sv.state_from_angles(c, ang, jnp.complex128))
        got = np.asarray(state_from_angles_fused(c, ang))
        np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("enc", ENCODING_TYPES)
@pytest.mark.slow
def test_fused_pallas_states_match_oracle(enc):
    c, ang = _case(enc, 3, 2, 2, batch=7, dtype=jnp.float32)
    want = np.asarray(sv.state_from_angles(c, ang))
    got = np.asarray(make_pallas_states_fused_fn(c, interpret=True)(ang))
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize("enc", ["chebyshev", "hubregtsen", "multi_control"])
@pytest.mark.slow
def test_fused_pallas_features_match_oracle(enc):
    c, ang = _case(enc, 4, 2, 2, batch=5, seed=1, dtype=jnp.float32)
    want = np.asarray(sv.pauli_features(sv.state_from_angles(c, ang), 4))
    got = np.asarray(make_pallas_pauli_features_fused_fn(c, interpret=True)(ang))
    np.testing.assert_allclose(got, want, atol=8e-6)


def test_fused_pallas_batch_padding():
    c, _ = _case("hubregtsen", 2, 1, 1)
    rng = np.random.RandomState(2)
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (130, 1)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0, np.pi, c.num_parameters), jnp.float32)
    ang = sv.angle_matrix(c, X, theta)
    got = np.asarray(make_pallas_states_fused_fn(c, interpret=True)(ang))
    want = np.asarray(sv.state_from_angles(c, ang))
    assert got.shape == (130, 4)
    np.testing.assert_allclose(got, want, atol=2e-6)


# ---------------------------------------------------------------------------
# Structural expectations: the pass must actually fuse what it claims.
# ---------------------------------------------------------------------------


def test_hubregtsen_fuses_h_rz_ry_runs_and_crz_ring():
    """H·RZ(x)·RY(p) per qubit per layer -> ONE SU2Op; the n-gate CRZ ring
    -> ONE DiagOp with K = n columns."""
    c = build_circuit("hubregtsen", 4, 2, 3)  # 48 gates
    prog = fuse_circuit(c)
    su2 = [op for op in prog.ops if isinstance(op, SU2Op)]
    diag = [op for op in prog.ops if isinstance(op, DiagOp)]
    assert len(su2) == 12 and all(len(op.gate_idxs) == 3 for op in su2)
    assert len(diag) == 3 and all(op.K == 4 for op in diag)
    assert prog.num_state_sweeps == 18  # vs 48 unfused gate sweeps


def test_chebyshev_cross_layer_fusion_and_ring():
    c = build_circuit("chebyshev", 4, 2, 3)  # 40 gates
    prog = fuse_circuit(c)
    su2 = [op for op in prog.ops if isinstance(op, SU2Op)]
    diag = [op for op in prog.ops if isinstance(op, DiagOp)]
    # init RY + first RX fuse; end-of-layer RY + next-layer RX fuse
    assert sum(len(op.gate_idxs) == 2 for op in su2) >= 8
    assert len(diag) == 3 and all(op.K == 4 for op in diag)


def test_lone_rz_stays_cheap_su2_not_diag():
    """highdim's isolated RZ rotations must NOT become K=1 DiagOps (a lone
    diagonal SU(2) sweep is cheaper) — guards the round-5 regression."""
    c = build_circuit("highdim", 4, 3, 3)
    prog = fuse_circuit(c)
    assert not any(isinstance(op, DiagOp) for op in prog.ops)
    assert prog.num_state_sweeps <= c.num_gates


def test_controlled_rotations_become_controlled_su2():
    c = build_circuit("multi_control", 3, 2, 1)
    prog = fuse_circuit(c)
    ctl = [op for op in prog.ops
           if isinstance(op, SU2Op) and op.control >= 0]
    assert len(ctl) == 3 and all(len(op.gate_idxs) == 1 for op in ctl)


def test_packed_rows_layout_consistent():
    for enc in ENCODING_TYPES:
        c = build_circuit(enc, 3, 2, 2)
        prog = fuse_circuit(c)
        ang = jnp.zeros((5, max(c.num_gates, 1)), jnp.float32)
        P = packed_inputs(prog, ang[:, :c.num_gates])
        assert P.shape == (5, prog.n_rows)
        n_diag_rows = sum(op.K for op in prog.ops if isinstance(op, DiagOp))
        assert prog.n_rows == 8 * prog.n_su2 + n_diag_rows
        # DiagOp rows are contiguous and within bounds
        for op in prog.ops:
            if isinstance(op, DiagOp):
                assert op.row_start >= 8 * prog.n_su2
                assert op.row_start + op.K <= prog.n_rows


def test_fused_dispatch_respects_config_flag():
    """quantum_kernel routes through fused kernels per the measured policy:
    auto = features-only at >= FUSION_MIN_QUBITS_FEATURES qubits (v5e
    roofline, results_round5/pallas_roofline.json); on/off force."""
    from dqgp_tpu import config as cfg

    saved = cfg.use_fusion
    try:
        cfg.use_fusion = "auto"
        t = cfg.FUSION_MIN_QUBITS_FEATURES
        assert cfg.fusion_enabled(t, "features")
        assert cfg.fusion_enabled(t + 2, "features")
        assert not cfg.fusion_enabled(t - 1, "features")  # precompute-bound
        assert not cfg.fusion_enabled(t, "states")        # 0.94x at 10q
        assert not cfg.fusion_enabled()                   # no size context
        cfg.use_fusion = "on"
        assert cfg.fusion_enabled(2, "states")
        cfg.use_fusion = "off"
        assert not cfg.fusion_enabled(12, "features")
    finally:
        cfg.use_fusion = saved
