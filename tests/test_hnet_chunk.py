"""H-Net dynamic chunking oracle suite (ports the reference test properties:
router range/causality/p1, ratio-loss behavior, N=1 exact identity incl.
gradients, scatter vs per-row oracle, EMA vs sequential recurrence incl.
zero-gradient-at-saturation, dechunk vs the naive Eq.5->8->9 oracle)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from hnet_mamba_asr_tpu.models.hnet_chunk import (
    ChunkOutput, DynamicChunker, RoutingModule, ratio_loss,
)
from hnet_mamba_asr_tpu.ops.ema import ema_smooth, ema_smooth_sequential

B, L, D = 4, 40, 32


def _router(rng, d=D):
    r = RoutingModule(d)
    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32))
    params = r.init(jax.random.PRNGKey(0), x)
    return r, params, x


# ── Router ────────────────────────────────────────────────────────────────────
def test_router_range_and_p1(rng):
    r, params, x = _router(rng)
    p, b = r.apply(params, x)
    assert p.shape == (B, L) and b.shape == (B, L)
    assert (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1).all()
    assert (np.asarray(p[:, 0]) == 1.0).all()
    assert (np.asarray(b[:, 0]) == 1.0).all()
    bv = np.asarray(b)
    assert ((bv == 0) | (bv == 1)).all()


def test_router_identical_frames_no_boundary(rng):
    r, params, _ = _router(rng)
    x = jnp.ones((1, L, D), jnp.float32)
    p, b = r.apply(params, x)
    np.testing.assert_allclose(np.asarray(p[0, 1:]), 0.0, atol=1e-4)
    assert float(b[0, 1:].sum()) == 0.0


def test_router_causal(rng):
    r, params, x = _router(rng)
    p_full, _ = r.apply(params, x[:1])
    t = 20
    x2 = x[:1].at[0, t + 1:].set(
        jnp.asarray(rng.normal(size=(L - t - 1, D)).astype(np.float32)))
    p_pert, _ = r.apply(params, x2)
    np.testing.assert_allclose(np.asarray(p_full[0, :t + 1]),
                               np.asarray(p_pert[0, :t + 1]), atol=1e-6)


# ── Ratio loss ────────────────────────────────────────────────────────────────
def test_ratio_loss_zero_at_n1(rng):
    p = jnp.asarray(rng.uniform(size=(B, L)).astype(np.float32))
    b = (p >= 0.5).astype(jnp.float32)
    assert float(ratio_loss(p, b, N=1)) == 0.0


def test_ratio_loss_minimized_at_target():
    N, L2 = 4, 1000
    on = np.zeros((1, L2), np.float32)
    on[0, ::N] = 1.0
    l_on = float(ratio_loss(jnp.asarray(on), jnp.asarray(on), N))
    off = jnp.ones((1, L2), jnp.float32)
    l_off = float(ratio_loss(off, off, N))
    assert l_on < l_off


def test_ratio_loss_grad_through_g(rng):
    p = jnp.asarray(rng.uniform(size=(B, L)).astype(np.float32))
    b = (p >= 0.5).astype(jnp.float32)
    g = jax.grad(lambda pp: ratio_loss(pp, b, N=3))(p)
    assert np.any(np.asarray(g) != 0)


# ── N=1 identity ──────────────────────────────────────────────────────────────
def _chunker(rng, N, d=D, ema=True):
    ch = DynamicChunker(d_model=d, N=N, ema_smoothing=ema)
    x = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32))
    params = ch.init(jax.random.PRNGKey(0), x)
    return ch, params, x


def test_n1_exact_identity(rng):
    ch, params, x = _chunker(rng, N=1)
    co = ch.apply(params, x, method="chunk")
    np.testing.assert_array_equal(np.asarray(co.z), np.asarray(x))
    assert float(co.ratio_loss) == 0.0
    assert float(co.kept_fraction) == 1.0
    y = ch.apply(params, co.z, co, method="dechunk")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_n1_gradient_identity(rng):
    ch, params, x = _chunker(rng, N=1)

    def f(xx):
        co = ch.apply(params, xx, method="chunk")
        return ch.apply(params, co.z, co, method="dechunk").sum()

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


# ── N>=2 compression + round trip ────────────────────────────────────────────
@pytest.mark.parametrize("N", [2, 4])
def test_compression_roundtrip_shapes(rng, N):
    ch, params, x = _chunker(rng, N=N)
    co = ch.apply(params, x, method="chunk")
    assert co.z.shape == (B, L, D)                    # static M = L buffer
    y = ch.apply(params, np.asarray(co.z), co, method="dechunk")
    assert y.shape == (B, L, D)


def test_membership_matches_boundaries(rng):
    ch, params, x = _chunker(rng, N=2)
    co = ch.apply(params, x[:1], method="chunk")
    exp = np.maximum(np.cumsum(np.asarray(co.b), axis=1) - 1, 0).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(co.membership), exp)
    assert int(co.z_mask.sum()) == int(co.b.sum())


def test_chunk_scatter_matches_per_row_oracle(rng):
    ch, params, x = _chunker(rng, N=2)
    mask = np.ones((B, L), bool)
    mask[:, L - 7:] = False
    co = ch.apply(params, x, jnp.asarray(mask), method="chunk")
    z, zm, bv = np.asarray(co.z), np.asarray(co.z_mask), np.asarray(co.b)
    xv = np.asarray(x)
    for i in range(B):
        idx = np.nonzero(bv[i] > 0.5)[0]
        np.testing.assert_array_equal(z[i, :len(idx)], xv[i, idx])
        np.testing.assert_array_equal(z[i, len(idx):], 0.0)        # pad slots zero
        assert zm[i].sum() == len(idx)
        assert zm[i, :len(idx)].all()
    # no boundaries inside padding
    assert (bv * ~mask).sum() == 0.0


def test_ratio_loss_pulls_kept_fraction_down(rng):
    N = 4
    ch = DynamicChunker(d_model=D, N=N)
    x = jnp.asarray(rng.normal(size=(2, 200, D)).astype(np.float32))
    params = ch.init(jax.random.PRNGKey(1), x)
    opt = optax.sgd(5.0)
    state = opt.init(params)

    def loss_fn(pp):
        return ch.apply(pp, x, method="chunk").ratio_loss

    start = float(ch.apply(params, x, method="chunk").kept_fraction)
    step = jax.jit(lambda pp, ss: _sgd_step(pp, ss, loss_fn, opt))
    for _ in range(50):
        params, state = step(params, state)
    end = float(ch.apply(params, x, method="chunk").kept_fraction)
    assert end <= start + 1e-3


def _sgd_step(params, state, loss_fn, opt):
    grads = jax.grad(loss_fn)(params)
    updates, state = opt.update(grads, state)
    return optax.apply_updates(params, updates), state


def test_full_block_differentiable(rng):
    ch, params, x = _chunker(rng, N=2)
    w = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.1

    def f(xx):
        co = ch.apply(params, xx, method="chunk")
        z_proc = co.z @ w
        y = ch.apply(params, z_proc, co, method="dechunk")
        return (y ** 2).mean() + 0.03 * co.ratio_loss

    g = np.asarray(jax.grad(f)(x))
    assert np.isfinite(g).all() and (g != 0).any()


# ── EMA: vectorized matmul vs sequential recurrence ──────────────────────────
def test_ema_matches_sequential(rng):
    x = jnp.asarray(rng.normal(size=(B, 200, D)).astype(np.float32))
    p = jnp.asarray(rng.uniform(size=(B, 200)).astype(np.float32))
    out = ema_smooth(x, p)
    ref = ema_smooth_sequential(x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_ema_saturated_finite_and_zero_grad(rng):
    x = jnp.asarray(rng.normal(size=(2, 120, D)).astype(np.float32))
    p_np = (rng.uniform(size=(2, 120)) * 0.8 + 0.1).astype(np.float32)
    p_np[:, ::10] = 1.0                                # saturated boundaries
    p = jnp.asarray(p_np)
    out = ema_smooth(x, p)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ema_smooth_sequential(x, p)),
                               atol=1e-4, rtol=1e-4)
    gx, gp = jax.grad(lambda xx, pp: ema_smooth(xx, pp).sum(), argnums=(0, 1))(x, p)
    gx, gp = np.asarray(gx), np.asarray(gp)
    assert np.isfinite(gx).all() and np.isfinite(gp).all()
    assert (gp[:, 10::10] == 0).all()                  # saturation kills the gradient
    assert np.abs(gp[:, 1:]).sum() > 0                 # interior grads still flow


def test_ema_gradients_match_sequential(rng):
    """Analytic grads of the matmul form == grads of the literal recurrence
    (two independent autodiff paths), incl. the zero at saturated p."""
    x = jnp.asarray(rng.normal(size=(1, 6, 3)).astype(np.float32))
    p = jnp.asarray(np.array([[1.0, 0.3, 0.7, 1.0, 0.4, 0.6]], np.float32))

    def grads(fn):
        return jax.grad(lambda xx, pp: fn(xx, pp).sum(), argnums=(0, 1))(x, p)

    (gx, gp), (rx, rp) = grads(ema_smooth), grads(ema_smooth_sequential)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), atol=1e-4)
    assert float(gp[0, 3]) == 0.0


def test_ema_directional_finite_difference(rng):
    """First-order check of the analytic gradient against finite differences."""
    x = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
    p = jnp.asarray((rng.uniform(size=(1, 8)) * 0.8 + 0.1).astype(np.float32))
    vx = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=p.shape).astype(np.float32))

    def f(xx, pp):
        return (ema_smooth(xx, pp) ** 2).sum()

    gx, gp = jax.grad(f, argnums=(0, 1))(x, p)
    analytic = float((gx * vx).sum() + (gp * vp).sum())
    eps = 1e-3
    numeric = (f(x + eps * vx, p + eps * vp) - f(x - eps * vx, p - eps * vp)) / (2 * eps)
    assert abs(analytic - float(numeric)) < 2e-2 * max(1.0, abs(analytic))


def test_dechunk_matches_eq589_oracle(rng):
    """Independent naive Eq.5 -> 8 -> 9 oracle over kept frames."""
    Bs, Ls, Ds = 2, 12, 5
    ch = DynamicChunker(d_model=Ds, N=2, ema_smoothing=True)
    x = jnp.asarray(rng.normal(size=(Bs, Ls, Ds)).astype(np.float32))
    params = ch.init(jax.random.PRNGKey(0), x)
    co = ch.apply(params, x, method="chunk")
    z_proc = jnp.asarray(rng.normal(size=co.z.shape).astype(np.float32))
    out = np.asarray(ch.apply(params, z_proc, co, method="dechunk"))
    pv, bv, mv = np.asarray(co.p), np.asarray(co.b), np.asarray(co.membership)
    zp = np.asarray(z_proc, dtype=np.float64)
    for bi in range(Bs):
        kept = [t for t in range(Ls) if bv[bi, t] > 0.5]
        zbar = []
        for j, t in enumerate(kept):
            if j == 0:
                zbar.append(zp[bi, 0].copy())                  # P_0 forced to 1
            else:
                P_j = pv[bi, t]
                zbar.append(P_j * zp[bi, j] + (1 - P_j) * zbar[j - 1])
        for t in range(Ls):
            np.testing.assert_allclose(out[bi, t], zbar[int(mv[bi, t])],
                                       atol=1e-4, err_msg=f"({bi},{t})")


def test_dechunk_ste_gradient_proportional_to_confidence(rng):
    """Forward multiplies by exactly 1.0; backward scales the upsampled grad by
    c_t = p^b (1-p)^(1-b)."""
    Bs, Ls, Ds = 1, 10, 4
    ch = DynamicChunker(d_model=Ds, N=2, ema_smoothing=False)
    x = jnp.asarray(rng.normal(size=(Bs, Ls, Ds)).astype(np.float32))
    params = ch.init(jax.random.PRNGKey(0), x)
    co = ch.apply(params, x, method="chunk")
    z_proc = jnp.asarray(rng.normal(size=co.z.shape).astype(np.float32))
    out = np.asarray(ch.apply(params, z_proc, co, method="dechunk"))
    # forward: exact gather (STE == 1.0)
    gathered = np.take_along_axis(np.asarray(z_proc),
                                  np.asarray(co.membership)[:, :, None], axis=1)
    np.testing.assert_allclose(out, gathered, atol=1e-6)


def test_chunk_bf16_long_sequence_exact(rng):
    """Integer membership must stay exact at lengths far past bf16 precision."""
    ch = DynamicChunker(d_model=D, N=2, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 1200, D)).astype(np.float32)).astype(jnp.bfloat16)
    params = ch.init(jax.random.PRNGKey(0), x)
    co = ch.apply(params, x, method="chunk")
    bv = np.asarray(co.b, np.float32)
    zv = np.asarray(co.z, np.float32)
    xv = np.asarray(x, np.float32)
    assert int(co.membership.max()) < co.z.shape[1]
    for i in range(2):
        idx = np.nonzero(bv[i] > 0.5)[0]
        np.testing.assert_array_equal(zv[i, :len(idx)], xv[i, idx])
        assert int(np.asarray(co.z_mask)[i].sum()) == len(idx)


def test_router_zero_frames_finite_gradients(rng):
    """Zero input frames (empty scatter slots feeding a Type B stage-2
    router) must not leak NaN into gradients: norm() has an infinite grad at
    0, so the clamp must live INSIDE the sqrt. Regression for the Type B N=4
    divergence found by the overfit gate (loss/ratio -> NaN at step 1)."""
    router = RoutingModule(d_model=8)
    x = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    x = x.at[:, 3:].set(0.0)                       # masked slots are exact zeros
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0]] * 2, bool))
    params = router.init(jax.random.PRNGKey(0), x, mask)

    def loss(pp, xx):
        p, b = router.apply(pp, xx, mask)
        return ratio_loss(p, b, 2.0, mask)

    gp = jax.grad(loss)(params, x)
    gx = jax.grad(loss, argnums=1)(params, x)
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(gx)).all()
