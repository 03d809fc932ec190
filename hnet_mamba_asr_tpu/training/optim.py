"""Config-driven optimizer + LR-schedule factories (name + _conf registries).

ESPnet-style string registries so experiments swap optimizer/schedule from YAML
alone (reference: src/dcasr/optim.py). Built on optax:

- schedules: ``warmuplr`` (linear ramp -> inverse sqrt, peak base_lr at
  warmup_steps), ``noamlr`` (base-lr-agnostic Noam), cosine/step/exponential
- optimizers: adam/adamw/sgd/adadelta/adagrad/rmsprop/radam
- ``build_optimizer`` assembles the full transformation:
  global-norm clip -> optimizer with schedule -> param-group rules via
  optax.multi_transform. The group rules reproduce the reference trainer's
  weight-decay hygiene and router damping (reference:
  src/dcasr/training/trainer.py:134-173): decay only >= 2-D parameters (1-D
  biases/norm gains and the SSM A_log/D/dt_bias are 1-D here by construction),
  router W_q/W_k get lr * router_lr_mult and optionally their own adam eps.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import optax


# ── schedules ─────────────────────────────────────────────────────────────────
def warmup_lr(base_lr: float, warmup_steps: float = 25000) -> Callable:
    """lr(count) = base_lr * w^0.5 * min(s^-0.5, s * w^-1.5), s = count + 1."""
    def schedule(count):
        s = count + 1.0
        return base_lr * warmup_steps ** 0.5 * jax.numpy.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
    return schedule


def noam_lr(model_size: int, warmup_steps: float = 25000) -> Callable:
    def schedule(count):
        s = count + 1.0
        return model_size ** -0.5 * jax.numpy.minimum(s ** -0.5,
                                                      s * warmup_steps ** -1.5)
    return schedule


def build_schedule(name: str | None, base_lr: float,
                   conf: Mapping | None = None) -> Callable:
    """Schedule by name; None/'none' -> constant base_lr."""
    conf = dict(conf or {})
    if name in (None, "none", "None"):
        return optax.constant_schedule(base_lr)
    key = str(name).lower()
    if key == "warmuplr":
        return warmup_lr(base_lr, float(conf.get("warmup_steps", 25000)))
    if key == "noamlr":
        return noam_lr(int(conf["model_size"]),
                       float(conf.get("warmup_steps", 25000)))
    if key == "cosineannealinglr":
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=int(conf["T_max"]),
            alpha=float(conf.get("eta_min", 0.0)) / max(base_lr, 1e-12))
    if key == "steplr":
        step_size = int(conf["step_size"])
        gamma = float(conf.get("gamma", 0.1))
        return lambda count: base_lr * gamma ** (count // step_size)
    if key == "exponentiallr":
        gamma = float(conf.get("gamma", 0.99))
        return lambda count: base_lr * gamma ** count
    raise ValueError(f"unknown scheduler {name!r}")


# ── optimizers ────────────────────────────────────────────────────────────────
def _make_opt(name: str, lr, conf: dict) -> optax.GradientTransformation:
    key = name.lower()
    b1, b2 = conf.get("betas", (0.9, 0.999))
    eps = float(conf.get("eps", 1e-8))
    wd = float(conf.get("weight_decay", 0.0))
    if key == "adamw":
        return optax.adamw(lr, b1=float(b1), b2=float(b2), eps=eps, weight_decay=wd)
    if key == "adam":
        opt = optax.adam(lr, b1=float(b1), b2=float(b2), eps=eps)
        return optax.chain(opt, optax.add_decayed_weights(-0.0)) if wd == 0 else \
            optax.chain(optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps),
                        optax.add_decayed_weights(wd),
                        optax.scale_by_learning_rate(lr))
    if key == "sgd":
        return optax.sgd(lr, momentum=float(conf.get("momentum", 0.0)) or None,
                         nesterov=bool(conf.get("nesterov", False)))
    if key == "adadelta":
        return optax.adadelta(lr, rho=float(conf.get("rho", 0.9)), eps=eps)
    if key == "adagrad":
        return optax.adagrad(lr, eps=eps)
    if key == "rmsprop":
        return optax.rmsprop(lr, decay=float(conf.get("alpha", 0.99)), eps=eps,
                             momentum=float(conf.get("momentum", 0.0)) or None)
    if key == "radam":
        return optax.radam(lr, b1=float(b1), b2=float(b2), eps=eps)
    raise ValueError(f"unknown optimizer {name!r}")


OPTIMIZERS = ("adam", "adamw", "sgd", "adadelta", "adagrad", "rmsprop", "radam")


def _is_router_path(path: tuple) -> bool:
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    return any(k == "router" for k in keys) and any(k in ("W_q", "W_k") for k in keys)


def param_labels(params) -> Any:
    """Label pytree for multi_transform: 'router' | 'no_decay' | 'default'.

    no_decay = any parameter with ndim < 2 (biases, norm gains, and the Mamba
    SSM A_log/D/dt_bias, which are per-head 1-D vectors here). Router W_q/W_k
    (2-D) form their own damped group when active.
    """
    def label(path, leaf):
        if _is_router_path(path):
            return "router"
        return "no_decay" if getattr(leaf, "ndim", 0) < 2 else "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(name: str, conf: Mapping | None, schedule_name: str | None,
                    schedule_conf: Mapping | None, params,
                    grad_clip: float = 5.0) -> tuple[optax.GradientTransformation,
                                                     Callable, Any]:
    """Full training transformation: clip -> {default, no_decay, router} groups.

    Returns (tx, lr_schedule, labels). ``router_lr_mult`` / ``router_eps`` in
    ``conf`` activate the damped router group (the reference's N=2 divergence
    fix); weight decay is applied to >= 2-D parameters only.
    """
    conf = dict(conf or {})
    base_lr = float(conf.get("lr", 1e-3))
    router_mult = float(conf.pop("router_lr_mult", 1.0))
    router_eps = conf.pop("router_eps", None)
    schedule = build_schedule(schedule_name, base_lr, schedule_conf)

    default_conf = dict(conf)
    nodecay_conf = dict(conf, weight_decay=0.0)
    router_conf = dict(conf)
    if router_eps is not None:
        router_conf["eps"] = float(router_eps)
    router_schedule = (lambda count: schedule(count) * router_mult)

    labels = param_labels(params)
    transforms = {
        "default": _make_opt(name, schedule, default_conf),
        "no_decay": _make_opt(name, schedule, nodecay_conf),
        "router": _make_opt(name, router_schedule, router_conf),
    }
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip and grad_clip > 0
        else optax.identity(),
        optax.multi_transform(transforms, labels),
    )
    return tx, schedule, labels
