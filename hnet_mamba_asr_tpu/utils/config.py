"""Config system: YAML files + CLI dotlist overrides -> plain nested dicts.

The reference drives every experiment from YAML merged with ``key.sub=value``
command-line overrides (reference: scripts/train.py:38-43 via OmegaConf). This
is a dependency-free equivalent: ``load_config(path, overrides)`` returns a
plain nested dict; override values are parsed with YAML semantics so
``train.max_epoch=120``, ``optim_conf.betas=[0.9,0.98]``, ``scheduler=null``
all do the right thing. ``flatten_config`` hoists the nested ``train.*`` /
``eval.*`` blocks into the flat key set the Trainer reads (reference:
src/dcasr/tasks/build.py:34-58).
"""
from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any, Mapping, Sequence

import yaml


def load_yaml(path: str | Path) -> dict:
    with open(path) as f:
        out = yaml.safe_load(f)
    return out or {}


def deep_merge(base: dict, extra: Mapping) -> dict:
    """Recursively merge ``extra`` into a copy of ``base`` (extra wins)."""
    out = copy.deepcopy(dict(base))
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def parse_value(text: str) -> Any:
    """Parse a dotlist RHS: int/float first (so '1e-3' is a float — YAML 1.1
    would keep it a string), then YAML scalar semantics ('null'->None, lists...)."""
    s = text.strip()
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return text


def set_dotted(cfg: dict, key: str, value: Any) -> None:
    """Set ``a.b.c`` in a nested dict, creating intermediate dicts."""
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        nxt = node.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            node[p] = nxt
        node = nxt
    node[parts[-1]] = value


def apply_overrides(cfg: dict, overrides: Sequence[str]) -> dict:
    """Apply ``key.path=value`` strings on top of cfg (returns a new dict)."""
    out = copy.deepcopy(cfg)
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of the form key=value")
        key, _, raw = item.partition("=")
        set_dotted(out, key.strip(), parse_value(raw))
    return out


def load_config(path: str | Path, overrides: Sequence[str] = ()) -> dict:
    """YAML file + dotlist overrides -> resolved plain dict."""
    return apply_overrides(load_yaml(path), overrides)


def config_fingerprint(cfg: Mapping) -> str:
    """Stable short hash of a resolved config (provenance)."""
    import hashlib
    blob = json.dumps(cfg, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def flatten_config(cfg: Mapping[str, Any]) -> dict:
    """Nested YAML -> the flat key set the Trainer reads (train.*/eval.* hoisted).

    Mirrors reference src/dcasr/tasks/build.py:34-58 field-for-field so YAML
    recipes translate one-to-one.
    """
    c = dict(cfg)
    train = c.get("train", {}) or {}
    ev = c.get("eval", {}) or {}
    out = {
        "max_epoch": train.get("max_epoch", 120),
        "grad_clip": train.get("grad_clip", 5.0),
        "grad_clip_type": train.get("grad_clip_type", 2.0),
        "precision": train.get("precision", "bf16"),
        "log_interval": train.get("log_interval", 50),
        "max_steps": train.get("max_steps"),
        "scan_steps": train.get("scan_steps", 1),
        "tp": train.get("tp", 1),
        "ckpt_backend": train.get("ckpt_backend", "pickle"),
        "accum_grad": c.get("accum_grad", 1),
        "valid_interval_epoch": ev.get("valid_interval_epoch", 10),
        "keep_nbest_models": c.get("keep_nbest_models", 5),
        "keep_all_checkpoints": c.get("keep_all_checkpoints", False),
        "best_model_criterion": c.get("best_model_criterion", [["valid", "loss", "min"]]),
        "early_stopping": c.get("early_stopping", {}) or {},
        "optim": c.get("optim", "adamw"),
        "optim_conf": c.get("optim_conf", {}) or {},
        "scheduler": c.get("scheduler"),
        "scheduler_conf": c.get("scheduler_conf", {}) or {},
    }
    # generic hoist for every other train.*/eval.* knob (fsdp, sp, pp, ep,
    # async_ckpt, fsdp_min_elems, ...): the fixed map above pins the
    # reference-mirrored defaults; anything else flows through untouched so
    # new Trainer knobs are config-reachable without editing this map. A
    # train.* key silently dropped here looks exactly like "the flag does
    # nothing" from the CLI (found by the fsdp end-to-end verify). The two
    # blocks share one flat namespace, so a name collision would silently
    # pick the train value — fail loudly instead.
    clash = set(train) & set(ev)
    if clash:
        raise ValueError(
            f"config keys appear in BOTH train: and eval: blocks: "
            f"{sorted(clash)} — the Trainer reads one flat namespace; move "
            f"each key to exactly one block")
    # A block key that collides with a pinned key sourced from a DIFFERENT
    # level (e.g. train.keep_all_checkpoints vs the top-level pin) must be
    # honored, not setdefault-dropped — the drop looks exactly like "the flag
    # does nothing" from the CLI (advisor r3: interp_e2e passed
    # train.keep_all_checkpoints=true and pruning stayed on). If the
    # canonical level ALSO sets the key explicitly to a different value, the
    # intent is ambiguous: fail loudly.
    pinned_source = {
        "max_epoch": "train", "grad_clip": "train", "grad_clip_type": "train",
        "precision": "train", "log_interval": "train", "max_steps": "train",
        "scan_steps": "train", "tp": "train", "ckpt_backend": "train",
        "valid_interval_epoch": "eval",
        "accum_grad": "top", "keep_nbest_models": "top",
        "keep_all_checkpoints": "top", "best_model_criterion": "top",
        "early_stopping": "top", "optim": "top", "optim_conf": "top",
        "scheduler": "top", "scheduler_conf": "top",
    }
    levels = {"train": train, "eval": ev, "top": c}
    for src_name in ("train", "eval"):
        src = levels[src_name]
        for k, v in src.items():
            pin = pinned_source.get(k)
            if pin is None or pin == src_name:
                out.setdefault(k, v)
                continue
            canonical = levels[pin]
            if k in canonical and canonical[k] != v:
                where = "top-level" if pin == "top" else f"{pin}: block"
                raise ValueError(
                    f"{src_name}.{k}={v!r} contradicts the {where} "
                    f"{k}={canonical[k]!r} — set it in exactly one place")
            out[k] = v
    return out
