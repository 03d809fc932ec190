"""Config-driven, mesh-parallel, resumable training loop.

The TPU rendition of the reference trainer (behavioral spec:
src/dcasr/training/trainer.py) with the DDP-era machinery translated to SPMD:

- Parallelism: params/opt state replicated, batches sharded on the leading
  axis over a 1-axis ``jax.sharding.Mesh``; gradient averaging is implicit in
  the jitted step's global-mean loss (XLA inserts the collectives). Constant
  global batch = frame budget x accum_grad x processes, same arithmetic as the
  reference's DDP contract.
- No OOM choreography: static padded shapes make memory compile-time constant,
  so the reference's group-skip / recovery-forward protocol has no TPU
  counterpart (SURVEY.md §5.3). No GradScaler either: bf16 training needs none.
- Determinism: dropout keys fold (seed, step); augmentation keys fold
  (seed, epoch, item); the sampler shuffles by (seed + epoch). Resume restores
  integers, not RNG blobs, and is therefore augmentation-exact.
- Model contract (duck-typed, built by tasks/asr_task.py): ``init_params(key)``,
  ``loss_fn(params, batch, step, train) -> (loss, stats)`` with stats containing
  "loss/total" (and optionally "batch_weight"), and optionally
  ``greedy_decode(params, batch) -> list[list[int]]`` for inline dev WER.
- Selection/early-stop semantics ported intact: N-best per [phase, metric,
  mode] criterion, best symlinks, pruning keeps the union + latest, fp32
  n-best averaging, early stopping on the last *significant* best (min_delta
  thresholding — sub-noise improvements must not reset patience).
"""
from __future__ import annotations

import copy
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hnet_mamba_asr_tpu.eval.metrics import char_errors, word_errors
from hnet_mamba_asr_tpu.parallel.mesh import (
    make_mesh, place_params, replicate, shard_batch,
)
from hnet_mamba_asr_tpu.training import checkpoint as ckpt
from hnet_mamba_asr_tpu.training.async_ckpt import AsyncWriter
from hnet_mamba_asr_tpu.training.optim import build_optimizer
from hnet_mamba_asr_tpu.utils.logging_utils import get_logger

logger = get_logger(__name__)


class Trainer:
    """Model-agnostic training loop over a data-parallel mesh."""

    def __init__(self, model, train_loader, cfg, *, dev_loaders=None, tokenizer=None,
                 metrics=None, ckpt_dir="checkpoints", mesh=None, seed: int = 0,
                 provenance=None):
        self.model = model
        self.train_loader = train_loader
        self.dev_loaders = dict(dev_loaders or {})
        self.tokenizer = tokenizer
        self.metrics = metrics
        self.provenance = provenance
        self.cfg = dict(cfg)
        self.seed = int(seed)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.is_main = jax.process_index() == 0
        self.ckpt_dir = Path(ckpt_dir)
        if self.is_main:
            self.ckpt_dir.mkdir(parents=True, exist_ok=True)

        g = self.cfg.get
        self.max_epoch = int(g("max_epoch", 120))
        self.grad_clip = float(g("grad_clip", 5.0))
        if float(g("grad_clip_type", 2.0)) != 2.0:
            raise ValueError("only L2 grad clipping is supported")
        self.accum_grad = max(1, int(g("accum_grad", 1)))
        self.scan_steps = max(1, int(g("scan_steps", 1)))
        if self.scan_steps > 1 and self.accum_grad > 1:
            raise ValueError("scan_steps and accum_grad are mutually exclusive")
        self.log_interval = int(g("log_interval", 50))
        self.valid_interval = int(g("valid_interval_epoch", 10))
        self.keep_nbest = int(g("keep_nbest_models", 5))
        self.keep_all = bool(g("keep_all_checkpoints", False))
        self.max_steps = g("max_steps")
        self.ckpt_backend = str(g("ckpt_backend", "pickle"))
        # overlap ckpt device->host fetch + disk IO with the next epoch's
        # compute (the fetch is ~30 s/100 MB on remote-attached devices).
        # Costs one extra device-resident generation of (params, opt_state)
        # while a save is in flight — disable at memory budgets that need it.
        self.async_ckpt = bool(g("async_ckpt", True))
        # FSDP/ZeRO: shard every large param leaf (and therefore its optax
        # moments, created from the placed params) over the dp axis; GSPMD
        # all-gathers weights per use and reduce-scatters grads. Checkpoint
        # saves gather to replicated first (see save_checkpoint) so the file
        # format is identical to the replicated path.
        from hnet_mamba_asr_tpu.parallel.mesh import _FSDP_MIN_ELEMS
        self.fsdp = bool(g("fsdp", False))
        self.fsdp_min_elems = int(g("fsdp_min_elems", _FSDP_MIN_ELEMS))
        self.best_model_criterion = [tuple(c) for c in
                                     g("best_model_criterion", [["valid", "loss", "min"]])]
        self.early_stopping = dict(g("early_stopping", {}) or {})

        key = jax.random.PRNGKey(self.seed)
        self.params = model.init_params(key)
        self.tx, self.lr_schedule, _ = build_optimizer(
            g("optim", "adamw"), dict(g("optim_conf", {}) or {}),
            g("scheduler"), dict(g("scheduler_conf", {}) or {}),
            self.params, grad_clip=self.grad_clip)

        # replicated on a dp mesh; tensor-sharded projections on a (dp, tp)
        # mesh (parallel/mesh.tp_specs). The optimizer state is created FROM
        # the placed params, so its moments inherit the param shardings;
        # scalar leaves (step counts) get replicated explicitly — tx.init
        # leaves them on one device, which would mix committed device sets.
        self.params = place_params(self.params, self.mesh, fsdp=self.fsdp,
                                   fsdp_min_elems=self.fsdp_min_elems)
        self.opt_state = self._normalize_placement(self.tx.init(self.params))

        self.epoch, self.global_step = 0, 0
        self.metric_history: dict[tuple[str, str], dict[int, float]] = {}
        self._ckpt_writer = (AsyncWriter() if (self.async_ckpt and self.is_main)
                             else None)
        # on-device snapshot: the train step DONATES params/opt_state buffers
        # (donate_argnums below), so an in-flight save must copy before the
        # next step dispatches; the writer thread fetches from the copies.
        # fsdp saves use _gather_to_host (bounded group-wise gather) instead;
        # a whole-tree replicated gather would materialize the FULL
        # params+moments on every chip — the exact memory the plane removes
        self._snapshot_state = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t))
        self._gather_group = jax.jit(lambda xs: xs,
                                     out_shardings=replicate(self.mesh))
        self._build_steps()
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        logger.info("Trainer: devices=%d processes=%d params=%.1fM accum_grad=%d "
                    "optim=%s sched=%s dev_splits=%s",
                    self.mesh.devices.size, jax.process_count(), n_params / 1e6,
                    self.accum_grad, g("optim", "adamw"), g("scheduler"),
                    list(self.dev_loaders))

    def _normalize_placement(self, tree):
        """Leaves already sharded over this mesh stay; everything else
        (scalar counts, single-device leftovers) replicates over the mesh."""
        from jax.sharding import NamedSharding

        rep = replicate(self.mesh)

        def place(leaf):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh.devices.tolist() == \
                    self.mesh.devices.tolist():
                return leaf
            return jax.device_put(leaf, rep)

        return jax.tree_util.tree_map(place, tree)

    # ---- compiled steps -------------------------------------------------------
    def _build_steps(self):
        model, tx, accum = self.model, self.tx, self.accum_grad

        def loss_for_grad(params, batch, step):
            loss, stats = model.loss_fn(params, batch, step, True)
            return loss, stats

        def fused_step(params, opt_state, batch, step):
            (loss, stats), grads = jax.value_and_grad(
                loss_for_grad, has_aux=True)(params, batch, step)
            gnorm = optax.global_norm(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, stats, gnorm

        def micro_step(params, batch, step):
            (loss, stats), grads = jax.value_and_grad(
                loss_for_grad, has_aux=True)(params, batch, step)
            grads = jax.tree_util.tree_map(lambda x: x / accum, grads)
            return grads, stats

        def accum_add(acc, grads):
            return jax.tree_util.tree_map(jnp.add, acc, grads)

        def apply_step(params, opt_state, grads):
            gnorm = optax.global_norm(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, gnorm

        def eval_loss(params, batch):
            return model.loss_fn(params, batch, 0, False)

        def scanned_steps(params, opt_state, batches, step0):
            """K fused steps in ONE device call (lax.scan over stacked batches).

            Amortizes per-dispatch latency — load-bearing on tunneled/remote
            device transports and reduces host involvement on real pods.
            """
            def body(carry, inp):
                params, opt_state = carry
                batch, off = inp
                (loss, stats), grads = jax.value_and_grad(
                    loss_for_grad, has_aux=True)(params, batch, step0 + off)
                gnorm = optax.global_norm(grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (stats, gnorm)

            k = jax.tree_util.tree_leaves(batches)[0].shape[0]
            (params, opt_state), (stats, gnorms) = jax.lax.scan(
                body, (params, opt_state), (batches, jnp.arange(k)))
            return params, opt_state, stats, gnorms

        self._fused_step = jax.jit(fused_step, donate_argnums=(0, 1))
        self._scanned_steps = jax.jit(scanned_steps, donate_argnums=(0, 1))
        self._micro_step = jax.jit(micro_step)
        self._accum_add = jax.jit(accum_add, donate_argnums=(0,))
        self._apply_step = jax.jit(apply_step, donate_argnums=(0, 1))
        self._eval_loss = jax.jit(eval_loss)

    # ---- bookkeeping ----------------------------------------------------------
    def _record(self, phase: str, metric: str, value: float) -> None:
        self.metric_history.setdefault((phase, metric), {})[self.epoch] = float(value)
        if self.is_main and self.metrics is not None:
            self.metrics.log_scalar(f"{phase}/{metric}", float(value),
                                    self.global_step, split=phase, epoch=self.epoch)

    def _best_epoch(self, phase, metric, mode):
        hist = self.metric_history.get((phase, metric))
        if not hist:
            return None
        pick = min if mode == "min" else max
        return pick(hist, key=lambda e: hist[e])

    # ---- one epoch -------------------------------------------------------------
    def _train_epoch(self) -> None:
        if hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(self.epoch)
        self._ep = {"loss_sum": 0.0, "weight_sum": 0.0, "seen": 0,
                    "t0": time.time(), "window": {}, "win_n": 0}
        grads_acc = None
        micro = 0
        pending: list[tuple[dict, int]] = []            # (host batch, b_real)
        pending_sig = None

        def flush_pending():
            nonlocal pending, pending_sig
            if not pending:
                return
            if len(pending) < self.scan_steps:
                # partial window (shape change or epoch end): run the
                # single-step executable per batch rather than compiling a
                # fresh K-length scan for every remainder size — executables
                # stay bounded to {fused, scan_K}
                for batch, b_real in pending:
                    sharded = shard_batch(batch, self.mesh)
                    self.params, self.opt_state, stats, gnorm = \
                        self._fused_step(self.params, self.opt_state, sharded,
                                         self.global_step)
                    self._commit_step(stats, gnorm, b_real)
            else:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *[b for b, _ in pending])
                sharded = shard_batch(stacked, self.mesh, batch_axis=1)
                self.params, self.opt_state, stats_k, gnorms = \
                    self._scanned_steps(self.params, self.opt_state, sharded,
                                        self.global_step)
                # ONE pytree fetch for stats + gnorms: each device_get is a
                # transport round trip; on high-latency links (HTTP relay)
                # per-leaf fetches dominate the inter-window gap
                stats_k, gnorms = jax.device_get((stats_k, gnorms))
                gnorms = np.asarray(gnorms)
                for i, (_, b_real) in enumerate(pending):
                    step_stats = {k: v[i] for k, v in stats_k.items()}
                    self._commit_step(step_stats, gnorms[i], b_real)
            pending, pending_sig = [], None

        import os
        ids_log = os.environ.get("HMASR_CONSUMED_IDS")
        for batch in self.train_loader:
            ids = batch.pop("ids", None)
            if ids_log and ids is not None:
                # per-process consumed-utterance audit trail (the 2-process
                # smoke asserts disjoint equal-count shards actually consumed)
                with open(ids_log, "a") as f:
                    import json
                    f.write(json.dumps({"epoch": self.epoch, "ids": ids}) + "\n")
            b_real = int(np.asarray(batch["row_mask"]).sum()) if "row_mask" in batch \
                else int(batch["tokens"].shape[0])
            if self.accum_grad > 1:
                sharded = shard_batch(batch, self.mesh)
                grads, stats = self._micro_step(self.params, sharded,
                                                self.global_step)
                grads_acc = grads if grads_acc is None \
                    else self._accum_add(grads_acc, grads)
                micro += 1
                self._accumulate_stats(stats, b_real)
                if micro % self.accum_grad != 0:
                    continue
                self.params, self.opt_state, gnorm = self._apply_step(
                    self.params, self.opt_state, grads_acc)
                grads_acc = None
                self._finish_step(float(gnorm))
            elif self.scan_steps > 1:
                sig = tuple((k, v.shape, str(v.dtype)) for k, v in
                            sorted(batch.items()) if isinstance(v, np.ndarray))
                if pending and sig != pending_sig:
                    flush_pending()
                pending.append((batch, b_real))
                pending_sig = sig
                if len(pending) == self.scan_steps:
                    flush_pending()
            else:
                sharded = shard_batch(batch, self.mesh)
                self.params, self.opt_state, stats, gnorm = self._fused_step(
                    self.params, self.opt_state, sharded, self.global_step)
                self._commit_step(stats, gnorm, b_real)
            if self.max_steps and self.global_step >= self.max_steps:
                break
        flush_pending()
        self._record("train", "loss",
                     self._ep["loss_sum"] / max(1.0, self._ep["weight_sum"]))

    # ---- per-step bookkeeping ----------------------------------------------
    def _accumulate_stats(self, stats, b_real: int) -> None:
        stats = {k: float(v) for k, v in jax.device_get(stats).items()}
        w = stats.get("batch_weight", float(b_real))
        ep = self._ep
        ep["loss_sum"] += stats["loss/total"] * w
        ep["weight_sum"] += w
        ep["seen"] += b_real
        for k, v in stats.items():
            ep["window"][k] = ep["window"].get(k, 0.0) + v
        ep["win_n"] += 1

    def _commit_step(self, stats, gnorm, b_real: int) -> None:
        self._accumulate_stats(stats, b_real)
        self._finish_step(float(gnorm))

    def _finish_step(self, gnorm: float) -> None:
        ep = self._ep
        applied_lr = float(self.lr_schedule(self.global_step))
        self.global_step += 1
        if self.is_main and self.global_step % self.log_interval == 0:
            dt = time.time() - ep["t0"]
            payload = {k: v / max(1, ep["win_n"]) for k, v in ep["window"].items()}
            payload["train/lr"] = applied_lr
            payload["train/grad_norm"] = gnorm
            payload["train/samples_per_s"] = ep["seen"] / dt if dt > 0 else 0.0
            if self.metrics is not None:
                self.metrics.log_scalars(payload, self.global_step,
                                         split="train", epoch=self.epoch)
            ep["seen"], ep["t0"] = 0, time.time()
        ep["window"], ep["win_n"] = {}, 0

    # ---- validation over all dev splits -----------------------------------------
    def validate(self) -> dict:
        # Multi-host: dev loaders are unsharded (every process holds the
        # identical full split), so batches are REPLICATED over the global
        # mesh — every device scores the full split, matching the reference's
        # dev-unsharded rule without assembling a bogus global batch from
        # duplicate process-local copies.
        replicate_dev = jax.process_count() > 1
        per_split, agg = {}, {"loss": [], "wer": [], "cer": []}
        for name, loader in self.dev_loaders.items():
            ls = ws = 0.0
            werr = wtot = cerr = ctot = 0
            for batch in loader:
                ids = batch.pop("ids", None)
                row_mask = np.asarray(batch["row_mask"])
                b_real = int(row_mask.sum())
                sharded = shard_batch(batch, self.mesh,
                                      replicate_batch=replicate_dev)
                loss, vstats = self._eval_loss(self.params, sharded)
                vstats = {k: float(v) for k, v in jax.device_get(vstats).items()}
                w = vstats.get("batch_weight", float(b_real))
                ls += vstats["loss/total"] * w
                ws += w
                if self.tokenizer is not None and hasattr(self.model, "greedy_decode"):
                    hyps = self.model.greedy_decode(self.params, sharded)
                    tokens = np.asarray(batch["tokens"])
                    tlens = np.asarray(batch["token_lens"])
                    for j in range(b_real):
                        ref = self.tokenizer.decode(tokens[j, :tlens[j]].tolist())
                        hyp = self.tokenizer.decode(hyps[j])
                        we, wc = word_errors(hyp, ref)
                        ce, cc = char_errors(hyp, ref)
                        werr += we; wtot += wc; cerr += ce; ctot += cc
            if ws <= 0:
                raise RuntimeError(f"validation split {name}: no batches scored")
            m = {"loss": ls / ws}
            if wtot > 0:
                m["wer"] = 100.0 * werr / wtot
            if ctot > 0:
                m["cer"] = 100.0 * cerr / ctot
            per_split[name] = m
            for k in ("loss", "wer", "cer"):
                if k in m:
                    agg[k].append(m[k])
            if self.is_main and self.metrics is not None:
                self.metrics.log_scalars({f"dev_{name}/{k}": v for k, v in m.items()},
                                         self.global_step, split=name, epoch=self.epoch)
        for k, values in agg.items():
            if values:
                self._record("valid", k, sum(values) / len(values))
        return per_split

    # ---- selection / early stop --------------------------------------------------
    def _update_best_symlinks(self) -> None:
        # decision (which criteria this epoch is best for) is computed NOW on
        # live metric_history; the file op rides the writer queue so it lands
        # AFTER the epoch file it points to
        if not self.is_main:
            return
        updates = [(phase, metric) for phase, metric, mode in
                   self.best_model_criterion
                   if self._best_epoch(phase, metric, mode) == self.epoch]
        epoch = self.epoch

        def apply() -> None:
            for phase, metric in updates:
                ckpt.update_best_symlink(self.ckpt_dir, phase, metric, epoch)
        self._ckpt_writer.submit(apply) if self._ckpt_writer else apply()

    def _prune_checkpoints(self) -> None:
        if not self.is_main or self.keep_nbest <= 0 or self.keep_all:
            return
        keep = {self.epoch}
        for phase, metric, mode in self.best_model_criterion:
            hist = self.metric_history.get((phase, metric), {})
            top = sorted(hist, key=lambda e: hist[e],
                         reverse=(mode == "max"))[:self.keep_nbest]
            keep.update(top)

        def apply() -> None:
            for p in self.ckpt_dir.glob("epoch*.ckpt"):
                if int(p.stem[5:]) not in keep:
                    ckpt.remove_checkpoint(p)
        self._ckpt_writer.submit(apply) if self._ckpt_writer else apply()

    def _last_significant_best(self, phase, metric, mode, min_delta):
        """Last epoch that beat the running best by MORE than min_delta —
        sub-noise improvements must neither reset patience nor move the
        reference (distinct from _best_epoch, which checkpoint selection uses
        unthresholded)."""
        hist = self.metric_history.get((phase, metric))
        if not hist:
            return None
        best_ep = best_val = None
        for e in sorted(hist):
            v = hist[e]
            better = (best_val is None
                      or (v < best_val - min_delta if mode == "min"
                          else v > best_val + min_delta))
            if better:
                best_ep, best_val = e, v
        return best_ep

    def _should_early_stop(self) -> bool:
        es = self.early_stopping
        if not es.get("enable", False):
            return False
        results = []
        for c in es.get("criteria", []):
            be = self._last_significant_best(c["phase"], c["metric"],
                                             c.get("mode", "min"),
                                             float(c.get("min_delta", 0.0)))
            results.append(be is not None and (self.epoch - be) > int(c["patience"]))
        if not results:
            return False
        stop = all(results) if es.get("require_all", True) else any(results)
        if stop:
            logger.info("early stop at epoch %d (criteria stalled: %s)",
                        self.epoch, results)
        return stop

    def _average_nbest(self) -> None:
        if not self.is_main or self.keep_nbest <= 0:
            return
        self.flush_checkpoints()          # averaging reads the epoch files
        for phase, metric, mode in self.best_model_criterion:
            hist = self.metric_history.get((phase, metric), {})
            top = sorted(hist, key=lambda e: hist[e],
                         reverse=(mode == "max"))[:self.keep_nbest]
            paths = [self.ckpt_dir / f"epoch{e:04d}.ckpt" for e in top]
            paths = [p for p in paths if p.exists()]
            if not paths:
                continue
            avg = ckpt.average_checkpoints(paths)
            ckpt.save_checkpoint(self.ckpt_dir / f"{phase}.{metric}.ave.ckpt", avg,
                                 backend=self.ckpt_backend)
            logger.info("averaged %d ckpts -> %s.%s.ave.ckpt",
                        len(paths), phase, metric)

    # ---- checkpoints ---------------------------------------------------------------
    def _gather_to_host(self, tree, budget_bytes: int = 512 * 1024 ** 2):
        """fsdp shard -> host-numpy gather in bounded groups.

        Each group is one jitted identity with replicated out_shardings — a
        COLLECTIVE every process must dispatch symmetrically — followed by an
        immediate host fetch, so the per-chip memory spike is one group
        (<= budget), never the full params+moments the fsdp plane exists to
        shard away. Returns the host tree on the main process, None on
        others (their fetch is skipped; only the collective is shared).
        Grouping is leaf-order stable, so the per-group programs compile once
        and are reused every save."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        groups, cur, cur_bytes = [], [], 0
        for i, leaf in enumerate(leaves):
            nbytes = int(leaf.size) * leaf.dtype.itemsize
            if cur and cur_bytes + nbytes > budget_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(i)
            cur_bytes += nbytes
        if cur:
            groups.append(cur)
        out: list = [None] * len(leaves)
        for idx in groups:
            gathered = self._gather_group([leaves[i] for i in idx])
            # EVERY process fetches: device_get is what forces the dispatched
            # collective to execute, and deleting an unforced result on a
            # non-writer would strand the writers inside the collective
            # (observed as a 2-process hang). The fetch itself is local
            # (each process copies its own replica).
            for j, g in zip(idx, gathered):
                host = np.asarray(jax.device_get(g))
                if self.is_main:
                    out[j] = host
            del gathered
        if not self.is_main:
            return None
        return jax.tree_util.tree_unflatten(treedef, out)

    def save_checkpoint(self) -> None:
        gathered = None
        if self.fsdp:
            # host-side state snapshot; the main thread pays the device->host
            # fetch here (the async writer still hides the file IO) — the
            # price of never materializing the full state on any one chip
            gathered = self._gather_to_host((self.params, self.opt_state))
        if not self.is_main:
            return
        # metadata is snapshotted NOW (metric_history keeps mutating); arrays
        # are snapshotted on device and fetched by the writer thread
        meta = {"opt_state_format": "path_dict",
                "epoch": self.epoch, "global_step": self.global_step,
                "metric_history": copy.deepcopy(self.metric_history),
                "config": self.cfg, "seed": self.seed}
        paths = [self.ckpt_dir / f"epoch{self.epoch:04d}.ckpt",
                 self.ckpt_dir / "latest.ckpt"]
        if self._ckpt_writer is None:
            state = gathered if gathered is not None else \
                (self.params, self.opt_state)
            self._write_checkpoint(*state, meta, paths)
            return
        params, opt_state = gathered if gathered is not None else \
            self._snapshot_state((self.params, self.opt_state))
        self._ckpt_writer.submit(
            lambda: self._write_checkpoint(params, opt_state, meta, paths))

    def _write_checkpoint(self, params, opt_state, meta, paths) -> None:
        state = dict(meta)
        state["params"] = jax.tree_util.tree_map(np.asarray,
                                                 jax.device_get(params))
        state["opt_state"] = ckpt.tree_to_path_dict(opt_state)
        for p in paths:                   # one device fetch for all writes
            ckpt.save_checkpoint(p, state, backend=self.ckpt_backend)

    def flush_checkpoints(self) -> None:
        """Wait for pending async saves; re-raise any writer failure."""
        if self._ckpt_writer is not None:
            self._ckpt_writer.flush()

    def load_checkpoint(self, path) -> None:
        self.flush_checkpoints()
        state = ckpt.load_checkpoint(path)
        self.params = place_params(
            jax.tree_util.tree_map(jnp.asarray, state["params"]), self.mesh,
            fsdp=self.fsdp, fsdp_min_elems=self.fsdp_min_elems)
        if state.get("opt_state_format") == "path_dict":
            restored = ckpt.path_dict_to_tree(self.opt_state, state["opt_state"])
        else:                                    # legacy raw-pytree checkpoint
            restored = _restore_opt_state(self.opt_state, state["opt_state"])
        # each moment leaf takes the sharding its freshly-initialized
        # counterpart already has (params-derived; scalars replicated)
        self.opt_state = jax.tree_util.tree_map(
            lambda tmpl, leaf: jax.device_put(leaf, tmpl.sharding),
            self.opt_state, restored)
        self.global_step = state["global_step"]
        self.metric_history = state.get("metric_history", {})
        self.epoch = state["epoch"] + 1          # saved epoch completed
        logger.info("resumed %s -> continue at epoch %d (step %d)",
                    path, self.epoch, self.global_step)

    # ---- driver ----------------------------------------------------------------------
    def train(self, resume=None) -> None:
        if self.is_main and self.metrics is not None and self.provenance is not None:
            self.metrics.append_summary("provenance", self.provenance)
        path = ckpt.resolve_resume(self.ckpt_dir, resume)
        if path is not None and Path(path).exists():
            self.load_checkpoint(path)
        for epoch in range(self.epoch, self.max_epoch):
            if self.max_steps and self.global_step >= self.max_steps:
                break                            # resumed run already at budget
            self.epoch = epoch
            self._train_epoch()
            final = (epoch + 1) == self.max_epoch
            save_now = (epoch + 1) % self.valid_interval == 0 or final
            if save_now and self.dev_loaders:
                per_split = self.validate()
                if self.is_main:
                    logger.info("epoch %d valid: %s", epoch,
                                {k: {m: round(x, 3) for m, x in v.items()}
                                 for k, v in per_split.items()})
            if save_now:
                self.save_checkpoint()
                if self.dev_loaders:
                    self._update_best_symlinks()
                self._prune_checkpoints()
                if self.dev_loaders and self._should_early_stop():
                    break
            if self.max_steps and self.global_step >= self.max_steps:
                if not save_now:
                    self.save_checkpoint()
                break
        self._average_nbest()
        if self._ckpt_writer is not None:
            self._ckpt_writer.close()
            self._ckpt_writer = None      # later saves (if any) run sync
        if self.is_main and self.metrics is not None:
            summary = {"final_step": self.global_step, "epochs": self.epoch + 1,
                       "n_devices": int(self.mesh.devices.size), "config": self.cfg}
            for phase, metric, mode in self.best_model_criterion:
                be = self._best_epoch(phase, metric, mode)
                if be is not None:
                    summary[f"best_{phase}_{metric}"] = \
                        self.metric_history[(phase, metric)][be]
                    summary[f"best_{phase}_{metric}_epoch"] = be
            self.metrics.update_summary(**summary)


def _restore_opt_state(template, saved):
    """Legacy (pre-path-dict) restore: rebuild the optax state pytree from the
    saved leaves IN ORDER, with loud leaf-count/shape validation. New
    checkpoints carry a path-keyed dict (checkpoint.tree_to_path_dict) which
    is immune to chain reordering; this path only handles old files."""
    leaves = jax.tree_util.tree_leaves(saved)
    tmpl_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(tmpl_leaves):
        raise ValueError(
            f"legacy optimizer checkpoint has {len(leaves)} leaves but the "
            f"configured optimizer expects {len(tmpl_leaves)} — the optax "
            "chain changed since the save; start fresh or rebuild the chain")
    for i, (s, t) in enumerate(zip(leaves, tmpl_leaves)):
        if tuple(np.shape(s)) != tuple(np.shape(t)):
            raise ValueError(
                f"legacy optimizer checkpoint leaf {i} has shape "
                f"{tuple(np.shape(s))}, expected {tuple(np.shape(t))}")
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves])
