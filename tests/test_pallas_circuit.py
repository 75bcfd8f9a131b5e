"""Pallas fused-circuit kernel vs the XLA statevector oracle (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dqgp_tpu.models.circuits import ENCODING_TYPES, build_circuit
from dqgp_tpu.ops import statevector as sv
from dqgp_tpu.ops.pallas_circuit import (
    make_pallas_pauli_features_fn,
    make_pallas_states_fn,
)


@pytest.mark.parametrize("enc", ENCODING_TYPES)
@pytest.mark.slow
def test_pallas_states_match_xla(enc):
    c = build_circuit(enc, 3, 2, 2)
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (7, 2)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0, np.pi, c.num_parameters), jnp.float32)
    angles = sv.angle_matrix(c, X, theta)

    want = np.asarray(sv.state_from_angles(c, angles))
    got = np.asarray(make_pallas_states_fn(c, interpret=True)(angles))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("enc", ["chebyshev", "yz_cx", "kyriienko"])
@pytest.mark.slow
def test_pallas_pauli_features_match_xla(enc):
    c = build_circuit(enc, 4, 2, 2)
    rng = np.random.RandomState(1)
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (5, 2)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0, np.pi, c.num_parameters), jnp.float32)
    angles = sv.angle_matrix(c, X, theta)

    want = np.asarray(sv.pauli_features(sv.state_from_angles(c, angles), 4))
    got = np.asarray(make_pallas_pauli_features_fn(c, interpret=True)(angles))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_pallas_batch_padding():
    # batch not a multiple of the tile: padded lanes must not leak
    c = build_circuit("hubregtsen", 2, 1, 1)
    rng = np.random.RandomState(2)
    X = jnp.asarray(rng.uniform(-0.9, 0.9, (130, 1)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0, np.pi, c.num_parameters), jnp.float32)
    angles = sv.angle_matrix(c, X, theta)
    got = np.asarray(make_pallas_states_fn(c, interpret=True)(angles))
    want = np.asarray(sv.state_from_angles(c, angles))
    assert got.shape == (130, 4)
    np.testing.assert_allclose(got, want, atol=2e-6)
