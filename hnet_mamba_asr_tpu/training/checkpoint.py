"""Checkpointing: atomic pickle of numpy-ified pytrees + selection utilities.

State = params + optimizer state + step/epoch + metric history + config + the
base PRNG seed. There is deliberately NO host-RNG state to capture: every
stochastic element (SpecAugment, dropout, sampler shuffles) is a pure function
of (seed, epoch, index | step), so restoring the integers restores the exact
stream — the TPU-side simplification of the reference's python/numpy/torch/
cuda RNG snapshots (reference: src/dcasr/training/trainer.py:62-73,515-519).

Files: epoch%04d.ckpt + latest.ckpt (atomic tmp + os.replace), best symlinks
{phase}.{metric}.best.ckpt, fp32 n-best averages {phase}.{metric}.ave.ckpt.

Two interchangeable on-disk backends behind the same API (``train.
ckpt_backend``, SURVEY.md §5.4):
  - 'pickle' (default): one atomic file — dependency-light and
    version-robust (opt state is path-keyed, see tree_to_path_dict);
  - 'orbax':  a DIRECTORY ``<name>.ckpt/`` holding an orbax array tree
    (``arrays/``, ecosystem-interoperable, async-capable on real pods) plus
    ``meta.pkl`` for the non-array run state.
``load_checkpoint`` dispatches on what is on disk (file vs directory), so
either backend's artifacts load regardless of the configured writer —
cross-backend resume/decode is tested.
"""
from __future__ import annotations

import os
import pickle
import shutil
from pathlib import Path

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), jax.device_get(tree))


def to_host_state(state: dict) -> dict:
    """Numpy-ify params/opt_state ONCE so a state written to several paths
    (epoch file + latest) pays a single device fetch — device->host transfer
    dominates save time on remote-attached devices."""
    out = dict(state)
    for key in ("params", "opt_state"):
        if key in out:
            out[key] = _to_host(out[key])
    return out


def save_checkpoint(path: str | Path, state: dict,
                    backend: str = "pickle") -> None:
    """Atomic write: serialize to tmp, fsync, rename (pickle) or write an
    orbax directory (finalized atomically by orbax) + meta.pkl."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = dict(state)
    for key in ("params", "opt_state"):
        if key in payload:
            payload[key] = _to_host(payload[key])
    if backend == "orbax":
        _save_orbax(path, payload)
        return
    if backend != "pickle":
        raise ValueError(f"ckpt_backend must be 'pickle' or 'orbax', "
                         f"got {backend!r}")
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        f.flush()
        os.fsync(f.fileno())
    if path.is_dir() and not path.is_symlink():
        shutil.rmtree(path)             # backend switched: orbax dir -> file
    os.replace(tmp, path)


_ARRAY_KEYS = ("params", "opt_state")


def _save_orbax(path: Path, payload: dict) -> None:
    import orbax.checkpoint as ocp

    arrays = {k: payload[k] for k in _ARRAY_KEYS if k in payload}
    meta = {k: v for k, v in payload.items() if k not in _ARRAY_KEYS}
    tmp = path.with_suffix(path.suffix + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp / "arrays").resolve(), arrays)
    getattr(ckptr, "wait_until_finished", lambda: None)()
    with open(tmp / "meta.pkl", "wb") as f:
        pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
        f.flush()
        os.fsync(f.fileno())
    if path.exists():                       # replace-in-place (latest.ckpt),
        remove_checkpoint(path)             # whichever backend wrote it
    os.replace(tmp, path)


def load_checkpoint(path: str | Path) -> dict:
    """Backend-dispatching load: a directory is an orbax checkpoint, a file
    is a pickle — so either writer's artifacts load under either config."""
    path = Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        state = dict(ckptr.restore((path / "arrays").resolve()))
        with open(path / "meta.pkl", "rb") as f:
            state.update(pickle.load(f))
        return state
    with open(path, "rb") as f:
        return pickle.load(f)


def remove_checkpoint(path: str | Path) -> None:
    """Delete a checkpoint of either backend (file or directory)."""
    path = Path(path)
    if path.is_dir() and not path.is_symlink():
        shutil.rmtree(path, ignore_errors=True)
    else:
        path.unlink(missing_ok=True)


def tree_to_path_dict(tree) -> dict[str, np.ndarray]:
    """Flatten a pytree to ``{keystr(path): ndarray}`` — a structure-free,
    library-version-independent serialization. Optax states are NamedTuple
    chains whose *class identity* changes across optax versions and whose
    *leaf order* changes if the chain is reordered; keying every leaf by its
    tree path makes the checkpoint immune to both (reference kept full torch
    state_dicts, which are path-keyed for the same reason:
    src/dcasr/training/trainer.py:515-519)."""
    # one batched fetch for the whole tree: per-leaf device_get costs one
    # relay round trip each on remote-attached devices
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(tree))
    out: dict[str, np.ndarray] = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key in out:
            raise ValueError(f"duplicate tree path {key!r} while flattening")
        out[key] = np.asarray(leaf)
    return out


def path_dict_to_tree(template, saved: dict):
    """Rebuild ``template``'s structure from a path-keyed leaf dict.

    Fails loudly (listing the offending paths) if the saved state and the
    freshly-built template disagree — a reordered/extended optax chain or an
    optax version that changed the state tree must never load garbage."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    tmpl_keys = [jax.tree_util.keystr(p) for p, _ in flat]
    missing = [k for k in tmpl_keys if k not in saved]
    extra = [k for k in saved if k not in set(tmpl_keys)]
    if missing or extra:
        raise ValueError(
            "checkpoint optimizer state does not match the configured "
            f"optimizer chain.\n  missing from checkpoint: {missing[:8]}"
            f"{' …' if len(missing) > 8 else ''}\n  unexpected in checkpoint: "
            f"{extra[:8]}{' …' if len(extra) > 8 else ''}\n"
            "Rebuild with the original optimizer config or start fresh.")
    leaves = []
    for key, (_, tmpl_leaf) in zip(tmpl_keys, flat):
        leaf = saved[key]
        if tuple(np.shape(leaf)) != tuple(np.shape(tmpl_leaf)):
            raise ValueError(
                f"checkpoint optimizer leaf {key!r} has shape "
                f"{tuple(np.shape(leaf))}, expected {tuple(np.shape(tmpl_leaf))}")
        leaves.append(np.asarray(leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def average_checkpoints(paths: list[str | Path]) -> dict:
    """fp32 parameter average of several checkpoints -> {"params", "averaged"}."""
    if not paths:
        raise ValueError("no checkpoints to average")
    acc = None
    for p in paths:
        params = load_checkpoint(p)["params"]
        as32 = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
        acc = as32 if acc is None else jax.tree_util.tree_map(np.add, acc, as32)
    avg = jax.tree_util.tree_map(lambda x: x / len(paths), acc)
    return {"params": avg, "averaged": [str(p) for p in paths]}


def update_best_symlink(ckpt_dir: Path, phase: str, metric: str, epoch: int) -> None:
    link = ckpt_dir / f"{phase}.{metric}.best.ckpt"
    if link.exists() or link.is_symlink():
        link.unlink()
    link.symlink_to(f"epoch{epoch:04d}.ckpt")


def resolve_resume(ckpt_dir: Path, resume) -> Path | None:
    """'auto' -> latest (or newest epoch file); explicit missing path raises —
    a typo must never silently fresh-start a long run."""
    if resume in (None, "", False):
        return None
    if resume == "auto":
        latest = ckpt_dir / "latest.ckpt"
        if latest.exists():
            return latest
        epochs = sorted(ckpt_dir.glob("epoch*.ckpt"))
        return epochs[-1] if epochs else None
    p = Path(resume)
    if not p.exists():
        raise FileNotFoundError(f"--resume checkpoint not found: {p}")
    return p
