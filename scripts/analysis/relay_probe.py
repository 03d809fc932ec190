#!/usr/bin/env python
"""Relay/TPU health probe — run this BEFORE diagnosing 'slow' or 'hung' code.

The remote-attached TPU (axon relay) has two known failure modes that look
exactly like application bugs (CLAUDE.md relay lessons):
  - WEDGED: backend init or the first dispatch hangs for up to ~25 min
    (e.g. a killed client left a stuck server session);
  - DOWN: init fails with 'Unable to initialize backend ... UNAVAILABLE'.

This script answers "is the chip usable right now, and how slow is a
dispatch?" without hanging your shell: the actual device touch runs in a
SUBPROCESS with a hard timeout.

Usage:  python scripts/analysis/relay_probe.py [timeout_s] [n_pings]
Exit codes: 0 healthy, 2 down (init error), 3 wedged (timeout).
"""
import json
import subprocess
import sys
import time

CHILD = r"""
import json, time
import jax, jax.numpy as jnp
t0 = time.perf_counter()
dev = jax.devices()
init_s = time.perf_counter() - t0
lat = []
for i in range(int({n_pings})):
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())          # value fetch = the only real fence
    lat.append(time.perf_counter() - t0)
print("PROBE_JSON " + json.dumps({{
    "device": str(dev[0]), "init_s": round(init_s, 2),
    "dispatch_s": [round(x, 3) for x in lat]}}))
"""


def main() -> int:
    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    n_pings = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c",
                            CHILD.format(n_pings=n_pings)],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"WEDGED: no response from the backend within {timeout_s:.0f}s "
              "— the relay is hung (known mode, can last ~25 min); retry "
              "later, do NOT start debugging application code")
        return 3
    out = [l for l in r.stdout.splitlines() if l.startswith("PROBE_JSON ")]
    if r.returncode != 0 or not out:
        tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        print("DOWN: backend init/dispatch failed:")
        print("\n".join("  " + l for l in tail))
        return 2
    info = json.loads(out[0][len("PROBE_JSON "):])
    info["total_s"] = round(time.perf_counter() - t0, 2)
    print(f"HEALTHY: {info['device']} — init {info['init_s']}s, per-dispatch "
          f"{info['dispatch_s']} s (relay-normal is ~1-2 s; direct-attached "
          "hardware is ms)")
    print(json.dumps(info))
    return 0


if __name__ == "__main__":
    sys.exit(main())
