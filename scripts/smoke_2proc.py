#!/usr/bin/env python
"""Two-REAL-process distributed smoke: the multi-host path with actual OS
processes, not monkeypatches.

The TPU rendition of the reference's 2-GPU torchrun smoke (reference:
scripts/slurm/smoke_2gpu.sh + src/dcasr/data/librispeech.py:205-219): two
processes join one jax.distributed job on the CPU backend (2 virtual devices
each -> a 4-device global mesh), and drive the REAL entry points — train a
tiny synthetic-corpus model (fresh + `--resume auto`), then decode — through
`scripts/train.py` / `scripts/decode.py`.

Programmatic asserts (parent, after both children exit 0):
  - every process saw process_count==2 and a 4-device global mesh (child-side
    asserts; a silent single-host fallback fails the child);
  - consumed-utterance audit: per epoch, both processes consumed the same
    number of global batches, with DISJOINT utterance row-slices whose union
    is exactly the corpus (the row-sharded sampler contract);
  - params are BIT-IDENTICAL across processes after training and after
    resume (replicated state never diverged);
  - process-0-only artifacts: summary.json provenance has exactly one record
    per run (rank 1 never wrote), provenance.process_count == 2;
  - resume appended to metrics.jsonl behind an explicit resume marker;
  - both processes' decodes produced identical transcripts.

Usage:
    python scripts/smoke_2proc.py             # parent: prep + spawn + assert
    (children are spawned internally with --child)

The parent does NOT import jax (the session may pin a TPU platform); all jax
work happens in subprocesses pinned to JAX_PLATFORMS=cpu.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts"))

N_PROC = 2
DEV_PER_PROC = 2


# ──────────────────────────────── child ──────────────────────────────────────
def child_main(rank: int, root: Path, fsdp: bool = False,
               sp: bool = False) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import decode as decode_script
    import train as train_script

    def digest(tree, mesh=None) -> str:
        import hashlib
        if mesh is not None:
            # fsdp leaves span BOTH processes (not addressable from one);
            # gather to replicated first — a collective every child dispatches
            # symmetrically, same as the Trainer's own save path
            from hnet_mamba_asr_tpu.parallel.mesh import replicate
            tree = jax.jit(lambda t: t, out_shardings=replicate(mesh))(tree)
        h = hashlib.sha256()
        leaves = sorted(
            jax.tree_util.tree_flatten_with_path(tree)[0],
            key=lambda kv: jax.tree_util.keystr(kv[0]))
        for path, leaf in leaves:
            h.update(jax.tree_util.keystr(path).encode())
            h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
        return h.hexdigest()

    cfg = str(root / "cfg.yaml")
    exp = str(root / "exp")
    # floor 512 (not 64): every sharded leaf costs a Gloo collective-clique
    # rendezvous per step on the CPU backend, and clique init has a hard ~30 s
    # window — under CI load, halving the clique count keeps the smoke well
    # inside it while shards still span both processes (asserted below)
    overrides = (["train.fsdp=true", "train.fsdp_min_elems=512"] if fsdp
                 else [])
    if sp:
        # sequence parallelism under a REAL multi-process job: mesh
        # (dp=2, sp=2) with one whole dp row per process (the production
        # layout — sp halos/state-relays ride the fast intra-host links,
        # dp gradient psums cross the process boundary via Gloo). Exercises
        # shard_map + make_array_from_process_local_data on a 2-axis mesh,
        # neither of which the plain/fsdp modes touch.
        overrides += ["train.sp=2"]

    # stage A: fresh 2-epoch train through the real CLI (maybe_init_distributed
    # inside run() joins the jax.distributed job from the env this process
    # was spawned with)
    trainer = train_script.run(train_script.parse_args(
        ["--config", cfg, "--exp-dir", exp] + overrides))
    assert jax.process_count() == N_PROC, \
        f"rank {rank}: process_count={jax.process_count()} (distributed init " \
        f"silently failed?)"
    assert jax.device_count() == N_PROC * DEV_PER_PROC, jax.device_count()
    assert trainer.mesh.devices.size == N_PROC * DEV_PER_PROC, \
        f"mesh does not span the job: {trainer.mesh.devices.size} devices"
    if sp:
        assert type(trainer.model).__name__ == "SPModel", type(trainer.model)
        assert "sp" in trainer.mesh.axis_names, trainer.mesh.axis_names
    gmesh = trainer.mesh if fsdp else None
    if fsdp:
        from jax.sharding import PartitionSpec as P
        n_sharded = sum(1 for l in jax.tree_util.tree_leaves(trainer.params)
                        if l.sharding.spec != P())
        assert n_sharded > 0, "fsdp left all params replicated"
        assert any(not l.is_fully_addressable
                   for l in jax.tree_util.tree_leaves(trainer.params)), \
            "fsdp shards never spanned the two processes"
    d_fresh = digest(trainer.params, gmesh)

    # stage B: resume for one more epoch (exercises multi-host checkpoint
    # load — for fsdp: the gathered save + re-shard-on-load round trip —
    # + a second idempotent maybe_init_distributed)
    trainer = train_script.run(train_script.parse_args(
        ["--config", cfg, "--exp-dir", exp, "--resume", "auto",
         "train.max_epoch=3"] + overrides))
    d_resumed = digest(trainer.params, trainer.mesh if fsdp else None)
    (root / f"digest_rank{rank}.json").write_text(json.dumps(
        {"fresh": d_fresh, "resumed": d_resumed}))

    # stage C: decode a split through the real CLI (local-device compute
    # under a live distributed runtime; replicated params must give identical
    # transcripts on every process)
    decode_script.run(decode_script.parse_args(
        ["--config", cfg, "--checkpoint", f"{exp}/checkpoints/latest.ckpt",
         "--splits", "dev-clean", "--out-dir", str(root / f"decode_rank{rank}")]))
    print(f"[child {rank}] all stages OK", flush=True)


# ──────────────────────────────── prep ───────────────────────────────────────
def prep_main(root: Path) -> None:
    """Corpus + tokenizer + CMVN + config (run in a CPU-pinned subprocess)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import build_tokenizer
    import compute_cmvn
    from hnet_mamba_asr_tpu.data.synthetic import build_tone_corpus, overfit_config

    build_tone_corpus(root)
    (root / "cfg.yaml").write_text(overfit_config(
        root, max_epoch=2, valid_interval=1, batch_bins=2000))
    build_tokenizer.run(["--manifests", str(root / "manifests" / "train-960.jsonl"),
                         "--out", str(root / "tok" / "bpe"),
                         "--vocab-size", "12", "--no-hard-limit"])
    compute_cmvn.run(["--manifest", str(root / "manifests" / "train-960.jsonl"),
                      "--out", str(root / "cmvn.npz"), "--n-mels", "20"])
    print("[prep] corpus ready", flush=True)


# ─────────────────────────────── parent ──────────────────────────────────────
def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(args: list[str], env_extra: dict, log: Path) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({"JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": f"--xla_force_host_platform_device_count={DEV_PER_PROC}",
                "JAX_COMPILATION_CACHE_DIR": str(
                    Path.home() / ".cache" / "jax_test_cache_cpu")},
               **env_extra)
    return subprocess.Popen([sys.executable, __file__, *args],
                            env=env, stdout=open(log, "w"),
                            stderr=subprocess.STDOUT)


def parent_main(root: Path, timeout: int, fsdp: bool = False,
                sp: bool = False) -> None:
    root.mkdir(parents=True, exist_ok=True)
    prep = _spawn(["--prep", "--root", str(root)], {}, root / "prep.log")
    if prep.wait(timeout) != 0:
        sys.exit(f"prep failed:\n{(root / 'prep.log').read_text()[-3000:]}")

    def launch_children() -> list[int]:
        port = _free_port()
        children = []
        for r in range(N_PROC):
            children.append(_spawn(
                ["--child", "--rank", str(r), "--root", str(root)]
                + (["--fsdp"] if fsdp else []) + (["--sp"] if sp else []),
                {"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                 "JAX_NUM_PROCESSES": str(N_PROC),
                 "JAX_PROCESS_ID": str(r),
                 "HMASR_CONSUMED_IDS": str(root / f"consumed_rank{r}.jsonl")},
                root / f"child{r}.log"))
        return [c.wait(timeout) for c in children]

    codes = launch_children()
    if any(codes):
        logs = "".join((root / f"child{r}.log").read_text()
                       for r in range(N_PROC))
        # Known CPU-backend flake, NOT an application bug: Gloo gives each
        # collective-clique rendezvous a hard ~30 s window, and under heavy
        # CI load the two children's execution starts can skew past it
        # ("Gloo context initialization failed ... GetKeyValue() timed out").
        # Retry ONCE from a clean slate; a deterministic failure fails again.
        if "Gloo context initialization failed" in logs:
            print("[smoke_2proc] Gloo clique-init timeout (load-induced "
                  "flake) — retrying once from a clean slate")
            import shutil
            shutil.rmtree(root / "exp", ignore_errors=True)
            for r in range(N_PROC):
                for f in (root / f"consumed_rank{r}.jsonl",
                          root / f"digest_rank{r}.json"):
                    f.unlink(missing_ok=True)
                shutil.rmtree(root / f"decode_rank{r}", ignore_errors=True)
            codes = launch_children()
    if any(codes):
        for r in range(N_PROC):
            print(f"----- child {r} log tail -----")
            print((root / f"child{r}.log").read_text()[-4000:])
        sys.exit(f"children exited {codes}")

    # ── asserts (pure file reading — no jax in the parent) ──
    # 1) consumed shards: equal batch counts, disjoint ids, union == corpus
    consumed = []
    for r in range(N_PROC):
        rows = [json.loads(l) for l in
                (root / f"consumed_rank{r}.jsonl").read_text().splitlines()]
        consumed.append(rows)
    by_epoch: dict[int, list[list[list[str]]]] = {}
    for r, rows in enumerate(consumed):
        for rec in rows:
            by_epoch.setdefault(rec["epoch"], [[] for _ in range(N_PROC)])[r] \
                .append(rec["ids"])
    manifest_ids = {json.loads(l)["id"] for l in
                    (root / "manifests" / "train-960.jsonl").read_text().splitlines()}
    for epoch, per_rank in sorted(by_epoch.items()):
        counts = [len(x) for x in per_rank]
        assert len(set(counts)) == 1, \
            f"epoch {epoch}: unequal batch counts per process {counts}"
        flat = [set(i for b in x for i in b) for x in per_rank]
        for a in range(N_PROC):
            for b in range(a + 1, N_PROC):
                assert not (flat[a] & flat[b]), \
                    f"epoch {epoch}: processes {a},{b} consumed overlapping " \
                    f"utterances {sorted(flat[a] & flat[b])[:5]}"
        union = set().union(*flat)
        assert union == manifest_ids, \
            f"epoch {epoch}: union of consumed ids != corpus " \
            f"(missing {sorted(manifest_ids - union)[:5]}, " \
            f"extra {sorted(union - manifest_ids)[:5]})"
    assert by_epoch, "no consumed-ids records written"

    # 2) params bit-identical across processes (fresh AND resumed)
    digests = [json.loads((root / f"digest_rank{r}.json").read_text())
               for r in range(N_PROC)]
    assert digests[0] == digests[1], f"params diverged across processes: {digests}"

    # 3) process-0-only artifacts + provenance process_count
    summary = json.loads((root / "exp" / "summary.json").read_text())
    prov = summary["provenance"]
    assert len(prov) == 2, \
        f"expected exactly 2 provenance records (fresh + resume, written by " \
        f"process 0 only); got {len(prov)} — a second writer appended?"
    for p in prov:
        assert p["env"]["process_count"] == N_PROC, p["env"]
        assert p["env"]["devices"]["count"] == N_PROC * DEV_PER_PROC, p["env"]

    # 4) resume marker segments the metrics stream
    events = [json.loads(l).get("event")
              for l in (root / "exp" / "metrics.jsonl").read_text().splitlines()]
    assert "resume" in events, "no resume marker in metrics.jsonl"

    # 5) decodes identical across processes
    hyps = []
    for r in range(N_PROC):
        recs = sorted((json.loads(l) for l in
                       (root / f"decode_rank{r}" / "ctc_greedy" /
                        "dev-clean.jsonl").read_text().splitlines()),
                      key=lambda x: x["id"])
        hyps.append([(x["id"], x["hyp"]) for x in recs])
    assert hyps[0] == hyps[1], "decode transcripts differ across processes"
    assert len(hyps[0]) > 0

    print(f"[smoke_2proc] ALL ASSERTS PASSED ({len(by_epoch)} epochs, "
          f"{len(hyps[0])} decoded utts) — root={root}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--prep", action="store_true")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--root", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--fsdp", action="store_true",
                    help="run the whole smoke with train.fsdp=true (weights "
                         "sharded ACROSS the two processes; checkpoint saves "
                         "gather over the pod)")
    ap.add_argument("--sp", action="store_true",
                    help="run the whole smoke with train.sp=2 (sequence-"
                         "parallel encoder on a (dp=2, sp=2) mesh spanning "
                         "the two processes; shard_map + 2-axis "
                         "make_array_from_process_local_data)")
    args = ap.parse_args(argv)
    if args.child:
        child_main(args.rank, Path(args.root), fsdp=args.fsdp, sp=args.sp)
    elif args.prep:
        prep_main(Path(args.root))
    else:
        import tempfile
        root = Path(args.root) if args.root else \
            Path(tempfile.mkdtemp(prefix="smoke2p_"))
        parent_main(root, args.timeout, fsdp=args.fsdp, sp=args.sp)


if __name__ == "__main__":
    main()
