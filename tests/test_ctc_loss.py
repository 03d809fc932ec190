"""CTC loss: brute-force alignment-enumeration oracle + torch.nn.functional
cross-check (torch CPU is the independent reference implementation here),
zero_infinity semantics, reduction semantics, gradient flow."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.ops.ctc_loss import ctc_infeasible, ctc_loss


def brute_force_ctc_nll(log_probs, target, blank):
    """-log sum over ALL alignments that collapse to `target`."""
    T, C = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(C), repeat=T):
        # collapse: remove repeats then blanks
        out, prev = [], None
        for s in path:
            if s != prev and s != blank:
                out.append(s)
            prev = s
        if out == list(target):
            total = np.logaddexp(total, sum(log_probs[t, path[t]] for t in range(T)))
    return -total


def _lp(rng, B, T, C):
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    return np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))


def test_vs_brute_force(rng):
    B, T, C = 2, 4, 4                               # blank = 3
    lp = _lp(rng, B, T, C)
    targets = np.array([[1, 2], [2, 2]], dtype=np.int32)
    tlens = np.array([2, 2], dtype=np.int32)
    flens = np.array([4, 4], dtype=np.int32)
    out = ctc_loss(jnp.asarray(lp), jnp.asarray(flens), jnp.asarray(targets),
                   jnp.asarray(tlens), blank_id=3, reduction="none")
    for b in range(B):
        expect = brute_force_ctc_nll(lp[b].astype(np.float64), targets[b], blank=3)
        assert float(out[b]) == pytest.approx(expect, rel=1e-4)


def test_vs_torch(rng):
    import torch
    import torch.nn.functional as F
    B, T, C, U = 3, 12, 7, 4
    lp = _lp(rng, B, T, C)
    targets = rng.integers(0, 6, size=(B, U)).astype(np.int32)   # blank = 6
    tlens = np.array([4, 2, 3], dtype=np.int32)
    flens = np.array([12, 9, 7], dtype=np.int32)
    ours = ctc_loss(jnp.asarray(lp), jnp.asarray(flens), jnp.asarray(targets),
                    jnp.asarray(tlens), blank_id=6, reduction="none")
    ref = F.ctc_loss(torch.tensor(lp).transpose(0, 1), torch.tensor(targets.astype(np.int64)),
                     torch.tensor(flens.astype(np.int64)), torch.tensor(tlens.astype(np.int64)),
                     blank=6, reduction="none", zero_infinity=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_vs_torch_mean_reduction(rng):
    import torch
    import torch.nn.functional as F
    B, T, C, U = 2, 10, 5, 3
    lp = _lp(rng, B, T, C)
    targets = rng.integers(0, 4, size=(B, U)).astype(np.int32)
    tlens = np.array([3, 2], dtype=np.int32)
    flens = np.array([10, 8], dtype=np.int32)
    ours = ctc_loss(jnp.asarray(lp), jnp.asarray(flens), jnp.asarray(targets),
                    jnp.asarray(tlens), blank_id=4, reduction="mean")
    ref = F.ctc_loss(torch.tensor(lp).transpose(0, 1), torch.tensor(targets.astype(np.int64)),
                     torch.tensor(flens.astype(np.int64)), torch.tensor(tlens.astype(np.int64)),
                     blank=4, reduction="mean", zero_infinity=True)
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)


def test_zero_infinity(rng):
    """T < U (+repeats): that row contributes 0, others unaffected."""
    B, T, C = 2, 3, 5
    lp = _lp(rng, B, T, C)
    targets = np.array([[1, 1, 2, 3], [2, 0, 0, 0]], dtype=np.int32)  # row0 needs T>=5
    tlens = np.array([4, 1], dtype=np.int32)
    flens = np.array([3, 3], dtype=np.int32)
    out = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(flens), jnp.asarray(targets),
                              jnp.asarray(tlens), blank_id=4, reduction="none"))
    assert out[0] == 0.0
    assert out[1] > 0.0
    infeasible = np.asarray(ctc_infeasible(jnp.asarray(flens), jnp.asarray(targets),
                                           jnp.asarray(tlens)))
    np.testing.assert_array_equal(infeasible, [True, False])


def test_gradient_flows_and_is_finite(rng):
    B, T, C, U = 2, 8, 5, 3
    logits = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 4, size=(B, U)).astype(np.int32))
    tlens = jnp.asarray([3, 1])
    flens = jnp.asarray([8, 6])

    def f(lg):
        lp = jax.nn.log_softmax(lg, -1)
        return ctc_loss(lp, flens, targets, tlens, blank_id=4)

    g = np.asarray(jax.grad(f)(logits))
    assert np.isfinite(g).all() and (g != 0).any()
    # frames beyond feat_length must get zero gradient
    assert np.abs(g[1, 6:]).max() == 0.0


def test_zero_infinity_zero_grad(rng):
    B, T, C = 1, 2, 4
    logits = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    targets = jnp.asarray([[1, 2, 1]], dtype=jnp.int32)   # needs T >= 3
    g = np.asarray(jax.grad(lambda lg: ctc_loss(
        jax.nn.log_softmax(lg, -1), jnp.asarray([2]), targets, jnp.asarray([3]),
        blank_id=3))(logits))
    np.testing.assert_array_equal(g, 0.0)


def test_empty_target(rng):
    """U=0: loss = -sum of blank log-probs over valid frames."""
    T, C = 5, 3
    lp = _lp(rng, 1, T, C)
    out = ctc_loss(jnp.asarray(lp), jnp.asarray([4]),
                   jnp.zeros((1, 1), jnp.int32), jnp.asarray([0]),
                   blank_id=2, reduction="none")
    assert float(out[0]) == pytest.approx(-lp[0, :4, 2].sum(), rel=1e-5)
