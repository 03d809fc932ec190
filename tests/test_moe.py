"""MoE FFN: dispatch/combine oracle, capacity semantics, aux loss, the
expert-parallel 'ep' mesh plane, and LM/AED integration.

The reference has no MoE anywhere — this is a beyond-reference plane; the
tests pin the routing semantics (GShard slot-priority capacity rule, Switch
aux loss) against brute-force oracles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnet_mamba_asr_tpu.models.moe import MoEFFN, moe_aux_from_vars


def _init(module, x, **kw):
    variables = module.init(jax.random.PRNGKey(0), x, **kw)
    return variables["params"]


def _apply(module, params, x, **kw):
    y, mvars = module.apply({"params": params}, x, mutable=["moe"], **kw)
    return y, mvars


def _dense_oracle(params, x, top_k, n_experts, capacity=None,
                  token_mask=None):
    """Brute-force routing: per-token top-k + slot-major capacity rule."""
    S, D = x.shape
    wg = np.asarray(params["router"], np.float64)
    w1 = np.asarray(params["w1"], np.float64)
    b1 = np.asarray(params["b1"], np.float64)
    w2 = np.asarray(params["w2"], np.float64)
    b2 = np.asarray(params["b2"], np.float64)
    xs = np.asarray(x, np.float64)
    logits = xs @ wg
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    valid = np.ones(S, bool) if token_mask is None else np.asarray(token_mask)
    k = min(top_k, n_experts)
    order = np.argsort(-probs, axis=-1, kind="stable")[:, :k]
    gates = np.take_along_axis(probs, order, -1)
    gates = gates / np.maximum(gates.sum(-1, keepdims=True), 1e-9)

    counts = np.zeros(n_experts, int)
    keep = np.zeros((S, k), bool)
    for slot in range(k):                     # slot-major priority
        for s in range(S):
            if not valid[s]:
                continue
            e = order[s, slot]
            if capacity is None or counts[e] < capacity:
                keep[s, slot] = True
                counts[e] += 1

    def gelu(v):
        # flax nn.gelu default is the tanh approximation
        return 0.5 * v * (1.0 + np.tanh(np.sqrt(2.0 / np.pi)
                                        * (v + 0.044715 * v ** 3)))

    y = np.zeros_like(xs)
    for s in range(S):
        if not valid[s]:
            continue
        for slot in range(k):
            if not keep[s, slot]:
                continue
            e = order[s, slot]
            h = gelu(xs[s] @ w1[e] + b1[e])
            y[s] += gates[s, slot] * (h @ w2[e] + b2[e])
    return y


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_bruteforce_oracle(rng, top_k):
    S, D, F, E = 24, 16, 32, 4
    m = MoEFFN(D, F, E, top_k=top_k, capacity_factor=8.0)   # no drops
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)
    y, _ = _apply(m, params, x)
    ref = _dense_oracle(params, x, top_k, E)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)


def test_moe_topk_equals_experts_is_softmax_dense_mix(rng):
    """top_k == E with ample capacity == full softmax mixture of all experts."""
    S, D, F, E = 16, 12, 24, 3
    m = MoEFFN(D, F, E, top_k=E, capacity_factor=float(E) * 2)
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)
    y, _ = _apply(m, params, x)
    ref = _dense_oracle(params, x, E, E)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)


def test_moe_capacity_drops_match_oracle(rng):
    """Tokens over capacity contribute zero, first-come-first-kept within a
    slot, first choices beat second choices (GShard rule)."""
    S, D, F, E = 32, 8, 16, 2
    cf = 0.25                                        # force heavy drops
    m = MoEFFN(D, F, E, top_k=2, capacity_factor=cf)
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)
    y, mvars = _apply(m, params, x)
    C = int(np.ceil(S * 2 * cf / E))
    C = min(((S + 7) // 8) * 8, ((C + 7) // 8) * 8)  # module rounds up to 8
    ref = _dense_oracle(params, x, 2, E, capacity=C)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)
    _, stats = moe_aux_from_vars(mvars, 1.0)
    assert float(stats["moe/dropped"]) > 0.0


def test_moe_token_mask_zeroes_and_frees_capacity(rng):
    """Masked tokens output 0 and consume no expert slots: with capacity for
    exactly the real tokens, masking the first half must let the second half
    through untouched."""
    S, D, F, E = 16, 8, 16, 2
    m = MoEFFN(D, F, E, top_k=1, capacity_factor=0.5)   # C = S/(2E)*2... tight
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)
    mask = jnp.asarray([False] * (S // 2) + [True] * (S // 2))
    y, _ = _apply(m, params, x, token_mask=mask)
    np.testing.assert_allclose(np.asarray(y[: S // 2]), 0.0, atol=0)
    # oracle over only the surviving tokens (same capacity C as the module)
    C = min(((S + 7) // 8) * 8, 8)
    ref = _dense_oracle(params, x, 1, E, capacity=C,
                        token_mask=np.asarray(mask))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)


def test_moe_aux_loss_value(rng):
    """Switch aux = E * sum_e f_e p_e against a hand computation."""
    S, D, F, E = 20, 8, 8, 4
    m = MoEFFN(D, F, E, top_k=2, capacity_factor=4.0)
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)
    _, mvars = _apply(m, params, x)
    logits = np.asarray(x, np.float64) @ np.asarray(params["router"],
                                                    np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    f_e = np.bincount(probs.argmax(-1), minlength=E) / S
    p_e = probs.mean(0)
    want = E * float(np.sum(f_e * p_e))
    aux, stats = moe_aux_from_vars(mvars, 1.0)
    assert float(aux) == pytest.approx(want, rel=1e-4)
    assert float(stats["moe/aux"]) == pytest.approx(want, rel=1e-4)


def test_moe_grads_flow_everywhere(rng):
    S, D, F, E = 16, 8, 16, 4
    m = MoEFFN(D, F, E, top_k=2, capacity_factor=2.0)
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)

    def loss(p):
        y, mvars = m.apply({"params": p}, x, mutable=["moe"])
        aux, _ = moe_aux_from_vars(mvars, 0.01)
        return jnp.sum(y ** 2) + aux

    g = jax.grad(loss)(params)
    for name in ("router", "w1", "w2", "b1", "b2"):
        assert np.isfinite(np.asarray(g[name])).all(), name
    assert float(jnp.abs(g["router"]).sum()) > 0          # via gates + aux
    assert float(jnp.abs(g["w1"]).sum()) > 0


def test_moe_batched_shape_and_determinism(rng):
    B, T, D, F, E = 2, 10, 8, 16, 4
    m = MoEFFN(D, F, E, top_k=2)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    params = _init(m, x)
    y1, _ = _apply(m, params, x)
    y2, _ = _apply(m, params, x)
    assert y1.shape == (B, T, D)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


# ── expert-parallel plane ────────────────────────────────────────────────────

def test_ep_sharded_matches_replicated(rng):
    """(dp=4, ep=2) mesh: expert-sharded params + dp-sharded tokens produce
    the same outputs and grads as the unsharded single-device run."""
    from hnet_mamba_asr_tpu.parallel.mesh import (
        batch_sharding, ep_specs, make_mesh, place_params,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    S, D, F, E = 32, 16, 32, 4
    m = MoEFFN(D, F, E, top_k=2, capacity_factor=2.0)
    x = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    params = _init(m, x)

    def loss(p, xx):
        y, mvars = m.apply({"params": p}, xx, mutable=["moe"])
        aux, _ = moe_aux_from_vars(mvars, 0.01)
        return jnp.sum(y ** 2) + aux

    base_l, base_g = jax.value_and_grad(loss)(params, x)

    mesh = make_mesh(8, tp=2, tp_axis="ep")
    specs = ep_specs(params)
    assert specs["w1"] == P("ep", None, None)
    assert specs["router"] == P()
    pp = place_params(params, mesh)
    assert pp["w1"].sharding.spec == P("ep", None, None)
    xs = jax.device_put(x, batch_sharding(mesh))
    l, g = jax.jit(jax.value_and_grad(loss))(pp, xs)
    assert float(l) == pytest.approx(float(base_l), rel=1e-5)
    for name in ("router", "w1", "w2"):
        np.testing.assert_allclose(np.asarray(g[name]),
                                   np.asarray(base_g[name]),
                                   rtol=1e-4, atol=1e-5)


def test_composed_tp_ep_mesh_matches_dp(rng, tmp_path):
    """(dp=2, tp=2, ep=2) 3-axis mesh: tensor-sharded projections AND
    expert-sharded MoE weights in ONE trained step, parameter-identical to
    the plain dp mesh."""
    from hnet_mamba_asr_tpu.parallel.mesh import make_mesh, place_params
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.training.trainer import Trainer
    from jax.sharding import PartitionSpec as P

    cfg_model = {
        "encoder": "dcasr", "head": "ctc",
        "frontend_conf": {"n_mels": 20},
        "encoder_conf": {"d_outer": 16, "d_main": 32, "n_enc": 1, "n_main": 1,
                         "n_dec": 1, "arch_type": "A", "d_state": 8,
                         "headdim": 8, "ssd_chunk_size": 16,
                         "hnet": {"compression_N": 1}},
        "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 32, "dropout": 0.0,
                     "moe": {"n_experts": 4, "top_k": 2,
                             "capacity_factor": 2.0, "aux_weight": 0.01}},
        "model_conf": {"ctc_weight": 0.5, "aed_weight": 0.5,
                       "lsm_weight": 0.1},
    }
    model = build_model(cfg_model, 12)
    mesh3 = make_mesh(8, tp=2, ep=2)
    assert mesh3.axis_names == ("dp", "tp", "ep")
    placed = place_params(model.init_params(jax.random.PRNGKey(0)), mesh3)
    flat = {jax.tree_util.keystr(p): l.sharding.spec for p, l in
            jax.tree_util.tree_leaves_with_path(placed)}
    assert any(s == P(None, "tp") for s in flat.values())     # projections
    assert any(s == P("ep", None, None) for s in flat.values())  # experts

    batch = {"wave": np.asarray(rng.normal(size=(8, 4000)), np.float32) * 0.1,
             "wave_lens": np.full(8, 4000, np.int32),
             "tokens": np.asarray(rng.integers(4, 12, size=(8, 8)), np.int32),
             "token_lens": np.full(8, 8, np.int32),
             "row_mask": np.ones(8, bool),
             "aug_ref": np.array([0, 0], np.int32),
             "item_index": np.arange(8, dtype=np.int32)}

    class OneBatch:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([dict(batch)])

        def __len__(self):
            return 1

    cfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1,
           "log_interval": 1, "valid_interval_epoch": 1,
           "keep_nbest_models": 0, "optim": "adamw",
           "optim_conf": {"lr": 1e-2}, "scheduler": "warmuplr",
           "scheduler_conf": {"warmup_steps": 10}}
    tr_dp = Trainer(model, OneBatch(), cfg, ckpt_dir=tmp_path / "dp",
                    mesh=make_mesh())
    tr_dp.train()
    tr_3d = Trainer(model, OneBatch(), cfg, ckpt_dir=tmp_path / "3d",
                    mesh=mesh3)
    tr_3d.train()
    a = jax.device_get(tr_dp.params)
    b = jax.device_get(tr_3d.params)
    for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(a),
                                 jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(pa))


# ── model integration ────────────────────────────────────────────────────────

def _lm_cfg():
    return {"lm_conf": {"d_model": 16, "n_layers": 2, "n_heads": 2,
                        "d_ff": 32, "dropout": 0.0, "lsm_weight": 0.0,
                        "moe": {"n_experts": 4, "top_k": 2,
                                "capacity_factor": 2.0, "aux_weight": 0.01}}}


def test_lm_moe_loss_and_stats(rng):
    from hnet_mamba_asr_tpu.tasks.lm_task import build_lm

    model = build_lm(_lm_cfg(), vocab_size=32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "moe" in params["lm"]["block_0"], "MoE params missing from LM"
    batch = {"tokens": jnp.asarray(rng.integers(4, 32, size=(4, 12)),
                                   jnp.int32),
             "token_lens": jnp.asarray([12, 8, 5, 12], jnp.int32),
             "row_mask": jnp.asarray([True, True, True, False])}
    loss, stats = model.loss_fn(params, batch, 0, True)
    assert np.isfinite(float(loss))
    assert float(stats["moe/aux"]) > 0
    # aux contributes: recompute with zero weight differs
    model.moe_aux_weight = 0.0
    loss0, _ = model.loss_fn(params, batch, 0, True)
    assert float(loss) != pytest.approx(float(loss0))


def test_lm_moe_trains_a_step(rng, tmp_path):
    from hnet_mamba_asr_tpu.tasks.lm_task import build_lm
    from hnet_mamba_asr_tpu.training.trainer import Trainer

    model = build_lm(_lm_cfg(), vocab_size=32)
    batch = {"tokens": np.asarray(rng.integers(4, 32, size=(8, 10)), np.int32),
             "token_lens": np.full(8, 10, np.int32),
             "row_mask": np.ones(8, bool)}

    class _Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            return iter([dict(batch)])

        def __len__(self):
            return 1

    cfg = {"max_epoch": 1, "grad_clip": 5.0, "accum_grad": 1,
           "log_interval": 1, "valid_interval_epoch": 1,
           "keep_nbest_models": 0, "optim": "adamw",
           "optim_conf": {"lr": 1e-3}, "scheduler": "warmuplr",
           "scheduler_conf": {"warmup_steps": 10}}
    tr = Trainer(model, _Loader(), cfg, ckpt_dir=str(tmp_path))
    tr._train_epoch()
    assert tr.global_step == 1


def test_aed_moe_loss_decode(rng):
    """ASR model with an MoE AED decoder: hybrid loss finite, aux in stats,
    greedy decode runs (step path exercises the MoE with T=1)."""
    from hnet_mamba_asr_tpu.tasks.asr_task import build_model

    cfg = {"encoder": "dcasr", "head": "ctc",
           "frontend_conf": {"n_mels": 20, "win_length": 400,
                             "hop_length": 160},
           "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                            "n_main": 1, "n_dec": 1, "arch_type": "A",
                            "d_state": 8, "headdim": 8, "ssd_chunk_size": 16,
                            "hnet": {"compression_N": 1}},
           "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 32,
                        "dropout": 0.0,
                        "moe": {"n_experts": 4, "top_k": 2,
                                "capacity_factor": 2.0, "aux_weight": 0.01}},
           "model_conf": {"ctc_weight": 0.3, "aed_weight": 0.7,
                          "lsm_weight": 0.1}}
    model = build_model(cfg, vocab_size=16)
    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": jnp.asarray(rng.normal(size=(B, n)), jnp.float32) * 0.1,
             "wave_lens": jnp.full(B, n, jnp.int32),
             "tokens": jnp.asarray(rng.integers(4, 16, size=(B, 6)),
                                   jnp.int32),
             "token_lens": jnp.full(B, 6, jnp.int32),
             "row_mask": jnp.ones(B, bool),
             "aug_ref": jnp.asarray([0, 0], jnp.int32),
             "item_index": jnp.arange(B, dtype=jnp.int32)}
    loss, stats = model.loss_fn(params, batch, 0, True)
    assert np.isfinite(float(loss))
    assert "moe/aux" in stats and np.isfinite(float(stats["moe/aux"]))
    hyps = model.greedy_decode(params, batch)
    assert len(hyps) == B


def test_make_mesh_composed_divisibility_raises():
    from hnet_mamba_asr_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, tp=3, ep=2)
    m = make_mesh(8, tp=2, ep=2)
    assert dict(zip(m.axis_names, m.devices.shape)) == \
        {"dp": 2, "tp": 2, "ep": 2}


def test_ep_placement_requires_expert_divisibility(rng):
    """E=4 experts cannot shard over ep=8 — placement must fail loudly, not
    silently replicate."""
    from hnet_mamba_asr_tpu.parallel.mesh import make_mesh, place_params

    m = MoEFFN(8, 16, 4, top_k=1)
    x = jnp.zeros((8, 8), jnp.float32)
    params = _init(m, x)
    mesh = make_mesh(8, tp=8, tp_axis="ep")      # (dp=1, ep=8)
    with pytest.raises(Exception):
        jax.block_until_ready(place_params(params, mesh))


def test_aed_moe_beam_cells_decode(rng):
    """MoE AED decoder through the beam decode cells (the KV-cached device
    steppers drive layer.step -> MoE with T=1 tokens)."""
    from types import SimpleNamespace

    from hnet_mamba_asr_tpu.tasks.asr_task import build_model
    from hnet_mamba_asr_tpu.tasks.decode_task import decode_batch

    cfg = {"encoder": "dcasr", "head": "ctc",
           "frontend_conf": {"n_mels": 20, "win_length": 400,
                             "hop_length": 160},
           "encoder_conf": {"d_outer": 16, "d_main": 24, "n_enc": 1,
                            "n_main": 1, "n_dec": 1, "arch_type": "A",
                            "d_state": 8, "headdim": 8, "ssd_chunk_size": 16,
                            "hnet": {"compression_N": 1}},
           "aed_conf": {"n_layers": 1, "n_heads": 2, "d_ff": 32,
                        "dropout": 0.0, "max_decode_len": 8,
                        "moe": {"n_experts": 4, "top_k": 2,
                                "capacity_factor": 2.0, "aux_weight": 0.01}},
           "model_conf": {"ctc_weight": 0.5, "aed_weight": 0.5,
                          "lsm_weight": 0.1}}
    model = build_model(cfg, 16)
    params = model.init_params(jax.random.PRNGKey(0))
    B, frames = 2, 64
    n = (frames - 1) * 160 + 400
    batch = {"wave": np.asarray(rng.normal(size=(B, n)), np.float32) * 0.1,
             "wave_lens": np.full(B, n, np.int32),
             "tokens": np.asarray(rng.integers(4, 16, size=(B, 6)), np.int32),
             "token_lens": np.full(B, 6, np.int32),
             "ids": ["u0", "u1"],
             "row_mask": np.ones(B, bool)}
    tok = SimpleNamespace(bos_id=1, eos_id=2, pad_id=3, vocab_size=16,
                          decode=lambda ids: " ".join(map(str, ids)))
    for cell in ({"read_out": "aed", "search": "beam", "lm": False,
                  "name": "aed_beam"},
                 {"read_out": "joint", "search": "beam", "lm": False,
                  "name": "joint_beam"}):
        recs = decode_batch(model, params, tok, batch, cell,
                            {"beam_size": 2, "pre_beam": 4,
                             "ctc_weight": 0.3})
        assert len(recs) == B, cell["name"]
        for r in recs:
            assert isinstance(r["hyp"], str), cell["name"]


def test_moe_fusion_lm_device_beam_matches_host(rng):
    """In-scan LM fusion with an MoE LM: with dropless decode-time capacity
    (capacity_factor = E/top_k, what tasks/decode_task.load_lm_scorer sets)
    the device stepper's per-token dense-mix FFN is exactly MoEFFN, so
    transcripts match the host engine's batched fusion."""
    from hnet_mamba_asr_tpu.decoders.ctc_decode import ctc_prefix_beam_search
    from hnet_mamba_asr_tpu.decoders.device_ctc_beam import (
        ctc_beam_search_device,
    )
    from hnet_mamba_asr_tpu.decoders.lm_scorer import CausalLMScorer
    from hnet_mamba_asr_tpu.models.lm import TransformerLM

    E, k = 4, 2
    lm = TransformerLM(vocab_size=10, d_model=16, n_layers=2, n_heads=2,
                       d_ff=32, dropout=0.0, moe_experts=E, moe_top_k=k,
                       moe_capacity_factor=E / k)       # dropless
    params = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    scorer = CausalLMScorer(lm, params)

    def _log_softmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    for seed in (0, 1):
        r = np.random.default_rng(300 + seed)
        B, T = 3, 10
        V1 = lm.vocab_size + 1                          # blank at V
        lp = _log_softmax(1.5 * r.normal(size=(B, T, V1))).astype(np.float32)
        lens = np.array([T, T - 3, 5])
        for w in (0.3, 0.8):
            host = ctc_prefix_beam_search(lp, lens, blank_id=V1 - 1,
                                          beam_size=4, pre_beam=5,
                                          lm=scorer, lm_weight=w)
            dev = ctc_beam_search_device(lp, lens, blank_id=V1 - 1,
                                         beam_size=4, pre_beam=5,
                                         lm=scorer, lm_weight=w)
            assert dev == host, (seed, w)


def test_load_lm_scorer_forces_dropless_moe(tmp_path):
    """decode.lm_config with an MoE lm_conf loads a scorer whose
    capacity_factor is E/top_k regardless of the training value."""
    import yaml

    from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer
    from hnet_mamba_asr_tpu.tasks.decode_task import load_lm_scorer
    from hnet_mamba_asr_tpu.tasks.lm_task import build_lm
    from hnet_mamba_asr_tpu.training.checkpoint import save_checkpoint

    tok = Tokenizer.train(["dropless experts score prefixes"],
                          tmp_path / "bpe", vocab_size=20,
                          hard_vocab_limit=False)
    lm_cfg = {"lm_conf": {"d_model": 16, "n_layers": 1, "n_heads": 2,
                          "d_ff": 32, "dropout": 0.0,
                          "moe": {"n_experts": 4, "top_k": 2,
                                  "capacity_factor": 1.25}}}
    (tmp_path / "lm.yaml").write_text(yaml.safe_dump(lm_cfg))
    model = build_lm(lm_cfg, tok.vocab_size)
    params = model.init_params(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "lm.ckpt",
                    {"params": params, "epoch": 0, "global_step": 0})
    scorer = load_lm_scorer({"lm_config": str(tmp_path / "lm.yaml"),
                             "lm_checkpoint": str(tmp_path / "lm.ckpt")},
                            "/", tok)
    assert scorer.lm_model.moe_experts == 4
    assert scorer.lm_model.moe_capacity_factor == pytest.approx(2.0)
