"""Micro-bench: serial per-utterance joint beam vs the lockstep batched beam.

Runs a realistic AED head (Small config dims) on the live device with B
utterances and compares wall-clock for the serial driver (one device call per
utt per step) against the lockstep driver (one device call per global step
covering all B x beam rows). Both produce identical hypotheses (equivalence
is unit-tested in tests/test_decoders.py); this script measures the win.

Usage: python scripts/analysis/bench_batched_beams.py [B] [S] [V]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from hnet_mamba_asr_tpu.decoders.joint import (
    joint_beam_search_nbest, joint_beam_search_nbest_lockstep,
)
from hnet_mamba_asr_tpu.models.aed import AEDHead
from hnet_mamba_asr_tpu.tasks.decode_task import (
    BatchedCachedAEDStepper, CachedAEDStepper, _UttStepper,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    DM, BEAM = 384, 10
    print(f"device={jax.devices()[0].platform} B={B} S={S} V={V} "
          f"d_model={DM} beam={BEAM}")
    head = AEDHead(vocab_size=V, d_model=DM, n_layers=6, n_heads=4, d_ff=2048,
                   dropout=0.0, max_decode_len=64)
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.normal(size=(B, S, DM)).astype(np.float32))
    mlens = np.full(B, S)
    params = head.init(jax.random.PRNGKey(0), mem, jnp.asarray(mlens),
                       jnp.zeros((B, 4), jnp.int32))["params"]
    kw = dict(vocab_size=V, beam_size=BEAM, ctc_weight=0.0, nbest=1,
              max_decode_len=64)

    def run_serial():
        stepper = CachedAEDStepper(head, params, mem, mlens, beam_rows=BEAM)
        return [joint_beam_search_nbest(
            None, mlens[b:b + 1], ctc_log_probs=None,
            aed_next_logprobs=_UttStepper(stepper, b), **kw)[0]
            for b in range(B)]

    def run_lockstep():
        stepper = BatchedCachedAEDStepper(head, params, mem, mlens,
                                          beam_rows=BEAM)
        return joint_beam_search_nbest_lockstep(
            mlens, batch_stepper=stepper, ctc_log_probs=None, **kw)

    for name, fn in (("serial", run_serial), ("lockstep", run_lockstep)):
        fn()                                             # compile warmup
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        toks = sum(len(nb[0].tokens) for nb in out)
        print(f"{name:9s} {dt:7.3f}s  ({dt / B * 1000:7.1f} ms/utt, "
              f"{toks} tokens total)")


if __name__ == "__main__":
    main()
