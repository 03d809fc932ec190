"""Pallas SSD kernel vs the sequential reference (interpret mode on CPU; the
compiled TPU path is bit-identical to the XLA formulation, verified manually
on hardware)."""
import numpy as np
import pytest

import jax.numpy as jnp

from hnet_mamba_asr_tpu.ops.ssd import ssd_reference
from hnet_mamba_asr_tpu.ops.ssd_pallas import ssd_pallas


def _inputs(rng, B=2, L=37, H=3, P=8, N=16, G=1):
    x = jnp.asarray(rng.normal(size=(B, L, H, P)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.001, 0.2, size=(B, L, H)).astype(np.float32))
    A = jnp.asarray(-rng.uniform(0.5, 8.0, size=(H,)).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, L, G, N)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(B, L, G, N)).astype(np.float32))
    return x, dt, A, Bm, Cm


def test_pallas_matches_reference(rng):
    args = _inputs(rng)
    ref = ssd_reference(*args)
    out = ssd_pallas(*args, chunk_size=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_chunk_invariance(rng):
    args = _inputs(rng, L=48)
    a = np.asarray(ssd_pallas(*args, chunk_size=8, interpret=True))
    b = np.asarray(ssd_pallas(*args, chunk_size=16, interpret=True))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_pallas_groups(rng):
    args = _inputs(rng, H=4, G=2)
    ref = ssd_reference(*args)
    out = ssd_pallas(*args, chunk_size=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_strong_decay_finite(rng):
    x, dt, A, Bm, Cm = _inputs(rng, L=40)
    out = np.asarray(ssd_pallas(x, dt * 50.0, A, Bm, Cm, chunk_size=8,
                                interpret=True))
    assert np.isfinite(out).all()
