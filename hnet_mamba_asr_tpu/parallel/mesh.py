"""Device mesh + sharding helpers: the data-parallel plane over ICI.

The reference's only device-parallelism strategy is DDP over NCCL (reference:
SURVEY.md §2.10); the TPU-native equivalent is a 1-axis ``jax.sharding.Mesh``
over all local/global devices with batches sharded on the leading axis and
parameters replicated. Gradient averaging is implicit in SPMD (the loss is a
global mean, XLA inserts the reduce); there is no backend management, no
collective-matching choreography, and scaling to N chips is config-only.

A second (currently trivial) "tp" axis is laid out so tensor sharding can be
annotated later without restructuring call sites.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize ``jax.distributed`` for a multi-host (pod) launch.

    Called by the train/decode entry points BEFORE any backend use. A launch
    is multi-host when a coordinator is configured (JAX_COORDINATOR_ADDRESS /
    the Cloud-TPU pod env) — then ``jax.distributed.initialize()`` joins this
    process to the job and ``jax.devices()`` becomes the GLOBAL device list,
    so every mesh below spans the pod with no further changes. Single-host
    runs (and this CI environment) take the no-op path. Idempotent; never
    raises on the single-host path.

    When JAX_NUM_PROCESSES / JAX_PROCESS_ID are also set (a manual launch —
    e.g. the two-real-process CPU smoke, scripts/smoke_2proc.py — rather than
    a cluster whose environment jax auto-detects), they are passed explicitly.
    """
    import os
    if any(os.environ.get(k) for k in
           ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")) or \
            os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
        if jax.distributed.is_initialized():
            # idempotent re-entry (e.g. a resume run in the same process);
            # initialize() would raise a misleading backend-order error here
            return True
        kwargs = {}
        addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS")
        if addr and os.environ.get("JAX_NUM_PROCESSES"):
            kwargs = {"coordinator_address": addr,
                      "num_processes": int(os.environ["JAX_NUM_PROCESSES"]),
                      "process_id": int(os.environ["JAX_PROCESS_ID"])}
        try:
            jax.distributed.initialize(**kwargs)
            return True
        except RuntimeError as e:
            # Only the idempotent re-init is benign. A coordinator
            # connection/config failure must NOT be swallowed: every process
            # would silently proceed single-host with process_index()==0 and
            # recreate the multi-writer scenario the e2e script guards against.
            if "already initialized" in str(e).lower():
                return True
            raise
    return False


def validate_planes(flat: dict) -> tuple[int, int, int, int, bool]:
    """Parse + validate the parallelism planes from a flattened train config.

    Returns ``(tp, sp, pp, ep, fsdp)``. The composition matrix (every pair in
    {tp, sp, pp, ep, fsdp}² is either composed-and-tested or excluded HERE
    with a pinned error — PARITY.md §2.10 records the full argument):

    - GSPMD planes (tp, ep, fsdp) compose freely with each other: they are
      sharding ANNOTATIONS on one jit program over disjoint parameter sets
      (projections / stacked [E,...] experts / every other large leaf), so
      their spec trees merge leaf-wise (see place_params).
    - fsdp also composes with sp and pp: both enter their shard_map with
      params pinned replicated (sp) or pp-stacked (pp) by in_specs, so
      GSPMD's reshard at that boundary IS the ZeRO gather-on-use.
    - sp and pp exclude tp, ep, and each other: a shard_map body is a
      PER-DEVICE program — GSPMD cannot shard a parameter INSIDE it, so
      composing tp/ep into sp/pp would mean hand-writing the tensor/expert
      collectives into every layer of the shard_map body (a second,
      divergent implementation of each layer), and sp+pp would need nested
      shard_maps over different axes of the same trunk. Excluded on
      cost/benefit: fsdp already covers "params too big" for sp (and pp IS
      the params-too-big plane); sp covers "sequence too long".
    """
    tp = int(flat.get("tp", 1))
    sp = int(flat.get("sp", 1))
    pp = int(flat.get("pp", 1))
    ep = int(flat.get("ep", 1))
    fsdp = bool(flat.get("fsdp", False))
    planes = sum(p > 1 for p in (tp, sp, pp, ep))
    if planes > 1 and not (planes == 2 and tp > 1 and ep > 1):
        raise ValueError("train.sp / train.pp are mutually exclusive with "
                         "every other model-parallel plane; train.tp and "
                         "train.ep may compose into a (dp, tp, ep) mesh "
                         "(their sharded parameter sets are disjoint)")
    if (sp > 1 or pp > 1) and int(flat.get("scan_steps", 1)) > 1:
        raise ValueError("train.sp/pp with train.scan_steps is not "
                         "supported (shard_map inside the fused scan is "
                         "untested); use accum_grad instead")
    return tp, sp, pp, ep, fsdp


def make_mesh(n_devices: int | None = None, dp_axis: str = "dp",
              tp: int = 1, tp_axis: str = "tp",
              ep: int = 1, ep_axis: str = "ep") -> Mesh:
    """Device mesh: 1-axis data-parallel by default; ``tp > 1`` builds a
    2-axis (dp, tp) mesh for tensor-sharded parameters (see tp_specs);
    ``tp > 1 and ep > 1`` composes both model-parallel planes into a 3-axis
    (dp, tp, ep) mesh — the parameter sets the two planes shard are disjoint
    (projections vs stacked MoE experts), so both spec trees apply at once
    (see place_params)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    model = tp * ep
    if model <= 1:
        return Mesh(np.asarray(devs), (dp_axis,))
    if len(devs) % model:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"tp*ep={tp}*{ep}")
    if tp > 1 and ep > 1:
        grid = np.asarray(devs).reshape(len(devs) // model, tp, ep)
        return Mesh(grid, (dp_axis, tp_axis, ep_axis))
    axis, size = (tp_axis, tp) if tp > 1 else (ep_axis, ep)
    grid = np.asarray(devs).reshape(len(devs) // size, size)
    return Mesh(grid, (dp_axis, axis))


def batch_sharding(mesh: Mesh, dp_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(dp_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ── tensor-parallel parameter rules ───────────────────────────────────────────
# Megatron-style column/row split of the big projections. Mamba-2 is cleanly
# TP-able because the SSD scan is per-head independent: sharding d_inner over
# tp splits heads across chips, the depthwise conv is per-channel local, and
# the only cross-chip reductions are the out_proj row-sum and the gated
# RMSNorm mean — both inserted automatically by GSPMD from these annotations.
_TP_COLUMN = ("in_proj", "linear1", "q_proj", "k_proj", "v_proj", "proj_in")
_TP_ROW = ("out_proj", "linear2", "proj_out")


def _tp_spec_for(path_keys: tuple[str, ...], leaf, tp_axis: str):
    if getattr(leaf, "ndim", 0) != 2:
        return P()
    owner = path_keys[-2] if len(path_keys) >= 2 else ""
    if owner in _TP_COLUMN:
        return P(None, tp_axis)                  # split output features
    if owner in _TP_ROW:
        return P(tp_axis, None)                  # split input features
    return P()


def tp_specs(params, tp_axis: str = "tp"):
    """PartitionSpec pytree for tensor-parallel parameter placement."""
    def spec(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                     for k in path)
        return _tp_spec_for(keys, leaf, tp_axis)

    return jax.tree_util.tree_map_with_path(spec, params)


# ── expert-parallel parameter rules ──────────────────────────────────────────
# MoE FFNs (models/moe.py) stack per-expert weights on a leading E axis:
# {w1 [E,D,F], b1 [E,F], w2 [E,F,D], b2 [E,D]} under a module named "moe".
# Sharding that axis over 'ep' makes each expert's matmuls fully local to its
# shard; GSPMD inserts the dispatch/combine all-to-alls around them. The
# router (and everything non-MoE) stays replicated.
_EP_LEAVES = ("w1", "b1", "w2", "b2")


def ep_specs(params, ep_axis: str = "ep"):
    """PartitionSpec pytree for expert-parallel parameter placement."""
    def spec(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                     for k in path)
        if keys[-1] in _EP_LEAVES and ("moe" in keys or len(keys) == 1):
            # "moe" module in a model tree, or a bare MoEFFN param dict
            return P(ep_axis, *([None] * (getattr(leaf, "ndim", 1) - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


# ── fully-sharded parameter rules (FSDP / ZeRO over the dp axis) ─────────────
# The dp axis does double duty: batches shard over it AND every large weight
# leaf shards its largest divisible dim over it. GSPMD then inserts the
# all-gather before each use and turns the gradient all-reduce into a
# reduce-scatter — the ZeRO-3 communication pattern — with zero step-function
# changes. Optimizer moments are created FROM the placed params (trainer), so
# they inherit the shards: ZeRO-1/2 state sharding comes for free. Per-chip
# param+moment memory drops ~|dp|x for everything above the size floor.
# Reference has no counterpart (SURVEY.md §2.10: FSDP/ZeRO "No") — beyond-
# parity plane for models that outgrow replication (Large ~185M and up).
_FSDP_MIN_ELEMS = 8192          # below this, all-gather latency > bytes saved


def fsdp_specs(params, n_shards: int, dp_axis: str = "dp",
               min_elems: int = _FSDP_MIN_ELEMS):
    """PartitionSpec pytree sharding each large leaf's largest divisible dim
    over the dp axis; small or indivisible leaves stay replicated."""
    def spec(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if not shape or int(np.prod(shape)) < min_elems:
            return P()
        cands = [i for i, d in enumerate(shape) if d % n_shards == 0]
        if not cands:
            return P()
        ax = max(cands, key=lambda i: shape[i])
        parts = [None] * len(shape)
        parts[ax] = dp_axis
        return P(*parts)

    return jax.tree_util.tree_map(spec, params)


def place_params(params, mesh: Mesh, tp_axis: str = "tp",
                 ep_axis: str = "ep", fsdp: bool = False,
                 dp_axis: str = "dp", fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """Replicate params on a 1-axis mesh; tensor-shard the big projections on
    a (dp, tp) mesh; expert-shard stacked MoE weights on a (dp, ep) mesh. On
    a 3-axis (dp, tp, ep) mesh both rule sets apply — they target disjoint
    parameters (2-D projections vs [E, ...] expert stacks), asserted here.

    ``fsdp=True`` additionally shards every large leaf still replicated
    after the tp/ep rules over the DP axis (see fsdp_specs) — ZeRO for
    whatever the model-parallel planes don't already shard. Composes with
    EVERY mesh: on the shard_map planes' meshes ((dp, sp) and (dp, pp)) the
    params enter the shard_map pinned by in_specs (replicated for sp;
    pp-stacked for pp, built from the ZeRO-sharded leaves inside the jit) —
    GSPMD's reshard at that boundary IS the ZeRO-3 gather-on-use."""
    has_tp = tp_axis in mesh.axis_names
    has_ep = ep_axis in mesh.axis_names
    if not (fsdp or has_tp or has_ep):
        return jax.device_put(params, replicate(mesh))
    if has_tp and has_ep:
        t = tp_specs(params, tp_axis)
        e = ep_specs(params, ep_axis)

        def merge(ts, es):
            assert ts == P() or es == P(), (ts, es)
            return ts if ts != P() else es

        specs = jax.tree_util.tree_map(merge, t, e)
    elif has_tp or has_ep:
        specs = tp_specs(params, tp_axis) if has_tp \
            else ep_specs(params, ep_axis)
    else:
        specs = jax.tree_util.tree_map(lambda _: P(), params)
    if fsdp:
        fs = fsdp_specs(params, mesh.shape[dp_axis], dp_axis,
                        min_elems=fsdp_min_elems)
        specs = jax.tree_util.tree_map(
            lambda base, f: base if base != P() else f, specs, fs)
    return jax.tree_util.tree_map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        params, specs)


# Batch-dict entries that are process-identical metadata, never batch-major
# (collate_batch ships [seed, epoch] as "aug_ref"). Shape-based inference
# alone is a trap: a 2-element aug_ref on a 2-local-device mesh *looks*
# divisible and would silently shard metadata across rows.
REPLICATED_BATCH_KEYS = frozenset({"aug_ref"})


def shard_batch(batch: dict, mesh: Mesh, dp_axis: str = "dp",
                batch_axis: int = 0, replicate_batch: bool = False) -> dict:
    """Place every array leaf of a host batch with its batch axis sharded.

    ``batch_axis=1`` handles step-stacked batches [K, B, ...] (the Trainer's
    scan_steps path): the scan axis stays replicated, B shards over the mesh.
    Non-array entries (utterance id lists) pass through on host.

    ``replicate_batch=True`` places EVERY entry replicated — the multi-host
    dev-evaluation mode: dev splits are never process-sharded (reference:
    src/dcasr/tasks/build.py:121-129), so every process holds the identical
    full batch and every device scores the full split.

    Multi-HOST (jax.process_count() > 1): each process holds only ITS
    sampler shard, so the global array is assembled from process-local data
    (``jax.make_array_from_process_local_data``). All processes must produce
    the same padded batch shape per step — guaranteed when the length grid
    snaps T and the bucketed sampler emits equal batch counts. A batch-axis
    array whose local B is not divisible by the dp rows this process owns RAISES
    (assembling it replicated would silently disagree across hosts — each
    process only holds its own rows); only sub-batch-rank arrays (scalars,
    genuinely process-identical entries) take the replicated path.
    """
    spec = P(*([None] * batch_axis + [dp_axis]))
    sh = NamedSharding(mesh, spec)
    rep = replicate(mesh)
    n_dev = mesh.devices.size
    multi_host = jax.process_count() > 1
    # The batch shards over the DP axis only, so divisibility is against the
    # dp-axis extent — NOT the total device count (on a (dp, sp) mesh with
    # dp=2, sp=2 a batch of 2 rows is perfectly shardable). Multi-host: each
    # process contributes its local rows for the dp rows it owns (the default
    # make_mesh layout keeps model axes intra-process, so a process owns
    # dp_size/process_count whole dp rows).
    dp_size = mesh.shape[dp_axis]
    local_dev = max(1, dp_size // jax.process_count())

    def place(k, v):
        if isinstance(v, (np.ndarray, jax.Array)):
            is_batch_arr = (getattr(v, "ndim", 0) > batch_axis
                            and k not in REPLICATED_BATCH_KEYS
                            and not replicate_batch)
            divisor = local_dev if multi_host else dp_size
            divisible = is_batch_arr and v.shape[batch_axis] % divisor == 0
            if multi_host:
                if is_batch_arr and not divisible:
                    raise ValueError(
                        f"shard_batch['{k}']: local batch size "
                        f"{v.shape[batch_axis]} (axis {batch_axis}) is not "
                        f"divisible by the {local_dev} dp rows this process "
                        f"owns ({jax.process_count()} processes, "
                        f"{n_dev} global devices, dp={dp_size}). On a "
                        f"multi-host run every "
                        f"process contributes only its own sampler shard, so "
                        f"this array cannot be assembled into a consistent "
                        f"global batch. Pin batch_bins so B is constant and "
                        f"divisible by local device count (or pad the batch "
                        f"to divisibility before shard_batch)."
                    )
                return jax.make_array_from_process_local_data(
                    sh if divisible else rep, np.asarray(v))
            return jax.device_put(v, sh if divisible else rep)
        return v

    return {k: place(k, v) for k, v in batch.items()}
