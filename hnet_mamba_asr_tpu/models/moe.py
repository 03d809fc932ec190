"""Mixture-of-Experts FFN with static-shape capacity dispatch (expert plane).

Beyond the reference (which has no MoE anywhere): an optional drop-in for the
dense GELU FFN inside the Transformer LM blocks and the AED decoder layers,
designed TPU-first:

- **Static shapes everywhere.** Dispatch is GShard/Switch-style: every expert
  processes exactly ``C = ceil(S * top_k * capacity_factor / E)`` token slots
  per step (rounded up to a multiple of 8 for TPU sublane tiling), selected by
  a cumulative-position rule. Tokens over capacity are DROPPED from the expert
  path — their residual branch contributes 0 and the skip connection carries
  them — so the compiled program has one shape regardless of routing.
- **Dispatch/combine are einsums**, not gathers: ``[S,E,C]`` one-hot tensors
  contracted against tokens ride the MXU and let GSPMD shard the expert axis.
- **Expert weights are stacked** ``[E, d_model, d_ff]`` so a single
  ``PartitionSpec('ep', ...)`` on the leading axis gives expert parallelism
  over an ``ep`` mesh axis (parallel/mesh.ep rules in ``tp_specs``); the
  per-expert matmuls become fully local and GSPMD inserts the all-to-alls
  around them.
- **Deterministic routing** (no jitter noise): resume-exactness is a repo-wide
  contract (CLAUDE.md conventions) and router argmax must not depend on RNG
  threading.

Routing math is fp32 (softmax over expert logits); expert matmuls run in the
module compute dtype like every other projection. The Switch load-balance aux
loss ``E * sum_e(f_e * p_e)`` is sown into the ``"moe"`` collection — callers
that train pass ``mutable=["moe"]`` and fold the mean sown value into the
loss with their configured weight; decode-time callers ignore it (``sow`` is
a no-op when the collection is immutable).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class MoEFFN(nn.Module):
    """Top-k routed mixture of GELU FFN experts with capacity dispatch.

    Call: ``x [..., D] -> y [..., D]`` (the pre-residual FFN branch value).
    ``token_mask`` (same leading shape as x, bool) marks REAL tokens; padded
    positions route nowhere (no capacity consumed, zero output, excluded from
    the aux-loss statistics).
    """

    d_model: int
    d_ff: int
    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, token_mask: jax.Array | None = None):
        E, D, F = self.n_experts, self.d_model, self.d_ff
        k = min(self.top_k, E)
        lead = x.shape[:-1]
        S = 1
        for n in lead:
            S *= int(n)
        xs = x.reshape(S, D)
        valid = (jnp.ones((S,), bool) if token_mask is None
                 else token_mask.reshape(S))

        wg = self.param("router", nn.initializers.lecun_normal(), (D, E),
                        jnp.float32)
        w1 = self.param("w1", nn.initializers.lecun_normal(batch_axis=(0,)),
                        (E, D, F), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, F), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(batch_axis=(0,)),
                        (E, F, D), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, D), jnp.float32)

        # ── routing (fp32) ───────────────────────────────────────────────
        logits = xs.astype(jnp.float32) @ wg                   # [S, E]
        probs = jax.nn.softmax(logits, axis=-1)
        gate_vals, expert_idx = jax.lax.top_k(probs, k)        # [S, k]
        gate_vals = gate_vals / jnp.maximum(
            gate_vals.sum(-1, keepdims=True), 1e-9)            # renormalize
        gate_vals = jnp.where(valid[:, None], gate_vals, 0.0)

        # capacity: every expert owns exactly C slots (static)
        C = max(1, -(-S * k * int(round(self.capacity_factor * 1024))
                     // (E * 1024)))
        C = min(_round_up(S, 8), _round_up(C, 8))

        # position of each (slot, token) within its expert. Slot-major order
        # gives first choices strict priority over second choices, and
        # earlier tokens priority within a slot (the GShard rule).
        flat_idx = expert_idx.T.reshape(-1)                    # [k*S]
        flat_valid = jnp.tile(valid, (k,)) & (
            gate_vals.T.reshape(-1) > 0)
        onehot = jax.nn.one_hot(flat_idx, E, dtype=jnp.int32) * \
            flat_valid[:, None].astype(jnp.int32)              # [k*S, E]
        pos = jnp.cumsum(onehot, axis=0) - onehot              # slots before
        pos_in_e = (pos * onehot).sum(-1)                      # [k*S]
        keep = flat_valid & (pos_in_e < C)

        # combine[s, e, c] = renormalized gate where token s sits in slot c
        # of expert e; dispatch = its support. Both are [S, E, C] einsum
        # operands — no scatters.
        slot_oh = jax.nn.one_hot(jnp.where(keep, pos_in_e, C), C,
                                 dtype=jnp.float32)            # [k*S, C]
        exp_oh = jax.nn.one_hot(flat_idx, E, dtype=jnp.float32) * \
            keep[:, None].astype(jnp.float32)                  # [k*S, E]
        per_slot = jnp.einsum("se,sc->sec", exp_oh, slot_oh)   # [k*S, E, C]
        gates_flat = gate_vals.T.reshape(-1)
        combine = (per_slot * gates_flat[:, None, None]) \
            .reshape(k, S, E, C).sum(0)                        # [S, E, C]
        dispatch = per_slot.reshape(k, S, E, C).sum(0)         # 0/1 weights

        # ── expert compute (compute dtype, MXU-shaped) ───────────────────
        cdt = self.dtype
        xin = jnp.einsum("sec,sd->ecd", dispatch.astype(cdt),
                         xs.astype(cdt))                       # [E, C, D]
        h = nn.gelu(jnp.einsum("ecd,edf->ecf", xin, w1.astype(cdt))
                    + b1.astype(cdt)[:, None, :])
        out = jnp.einsum("ecf,efd->ecd", h, w2.astype(cdt)) \
            + b2.astype(cdt)[:, None, :]
        y = jnp.einsum("sec,ecd->sd", combine.astype(cdt), out)

        # ── Switch load-balance aux + occupancy stats ────────────────────
        n_valid = jnp.maximum(valid.sum(), 1).astype(jnp.float32)
        top1 = jax.nn.one_hot(expert_idx[:, 0], E, dtype=jnp.float32) * \
            valid[:, None].astype(jnp.float32)
        f_e = top1.sum(0) / n_valid                            # dispatch frac
        p_e = (probs * valid[:, None]).sum(0) / n_valid        # mean router p
        aux = E * jnp.sum(f_e * p_e)
        dropped = 1.0 - keep.sum() / jnp.maximum(
            flat_valid.sum(), 1).astype(jnp.float32)
        self.sow("moe", "aux", aux)
        self.sow("moe", "dropped", jax.lax.stop_gradient(dropped))
        return y.reshape(*lead, D).astype(x.dtype)


def moe_aux_from_vars(mvars: dict, weight: float):
    """(weighted aux loss, stats) from the ``"moe"`` mutable collection.

    ``aux`` is the MEAN over all sown MoE layers (so the configured weight is
    layer-count independent); ``dropped`` likewise."""
    col = mvars.get("moe", {})
    aux_vals = [jnp.asarray(v) for path, v in _iter_sown(col) if
                path[-1] == "aux"]
    drop_vals = [jnp.asarray(v) for path, v in _iter_sown(col) if
                 path[-1] == "dropped"]
    if not aux_vals:
        z = jnp.asarray(0.0)
        return z, {"moe/aux": z, "moe/dropped": z}
    aux = sum(aux_vals) / len(aux_vals)
    dropped = sum(drop_vals) / max(len(drop_vals), 1)
    return weight * aux, {"moe/aux": jax.lax.stop_gradient(aux),
                          "moe/dropped": jax.lax.stop_gradient(dropped)}


def _iter_sown(tree, path=()):
    """Yield (path, leaf) over a sown collection (dicts of dicts of tuples)."""
    if isinstance(tree, dict):
        for name, sub in tree.items():
            yield from _iter_sown(sub, path + (name,))
    elif isinstance(tree, (tuple, list)):
        for v in tree:
            yield path, v
    else:
        yield path, tree
