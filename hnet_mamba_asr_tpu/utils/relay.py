"""Relay-health stamp for on-chip measurement artifacts.

The one real TPU here sits behind an HTTP relay whose per-dispatch latency
drifts between ~0.03 s (fast) and ~1.5 s (normal), with wedged/down episodes
on top (CLAUDE.md relay lessons). Cross-run throughput comparisons are
uninterpretable without knowing which relay you got — judge r3 Weak #3 asked
for every benchmark JSON to carry this stamp so BENCH_rN.json files are
self-interpreting across rounds.

``ping()`` measures it in-process: n tiny dispatches, each fenced by a value
fetch (the only reliable fence through the relay — ``block_until_ready`` is
not). The first dispatch (compile + transfer) is timed separately as
``first_s``; the steady-state list is what classifies the relay.

For a *safe* probe that cannot hang your shell when the relay is wedged, use
``scripts/analysis/relay_probe.py`` (subprocess + hard timeout). This helper
is for stamping artifacts from inside a benchmark that is about to talk to
the device anyway.
"""
from __future__ import annotations

import time


def ping(n: int = 3) -> dict:
    """{'relay_state', 'dispatch_s', 'first_s', 'platform'} — n fenced
    dispatches of a trivial program after one warmup dispatch."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())          # compile + first round trip
    first_s = time.perf_counter() - t0
    lat = []
    for _ in range(max(1, n)):
        t0 = time.perf_counter()
        float(jnp.ones((8, 8)).sum())
        lat.append(time.perf_counter() - t0)
    med = sorted(lat)[len(lat) // 2]
    # thresholds from measured regimes: ~0.03 s fast relay, ~1.5 s normal,
    # multi-second+ = degraded (and wedged never returns — see relay_probe)
    state = "fast" if med < 0.2 else ("normal" if med < 3.0 else "slow")
    platform = jax.devices()[0].platform
    if platform == "cpu":
        state = "local-cpu"                # no relay in the path at all
    return {"relay_state": state, "dispatch_s": [round(x, 3) for x in lat],
            "first_s": round(first_s, 3), "platform": platform}
