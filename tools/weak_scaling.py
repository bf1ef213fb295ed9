#!/usr/bin/env python
"""Weak-scaling measurement for the channel-sharded RX pipeline.

Runs the full batched receiver at 1, 2, 4, ... devices with channels
proportional to the device count, and reports throughput + weak-scaling
efficiency (BASELINE target: >= 85% to N >= 2 hosts).  Without multi-chip
hardware this uses the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N); each device count
runs in its own subprocess because the device count is fixed at backend
init.  On a real multi-chip slice, run a single invocation with
M17_WS_DEVICES=<n> per slice size instead.

Usage:  python tools/weak_scaling.py [channels_per_device] [n_blocks]
Prints one JSON line: {"points": [{devices, channels, samples_per_s,
efficiency}, ...]}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_one(n_dev: int, ch_per_dev: int, n_blocks: int) -> float:
    """Measure samples/s in a subprocess pinned to an n_dev virtual mesh."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    env["JAX_PLATFORMS"] = "cpu"
    env["M17_WS_DEVICES"] = str(n_dev)
    env["M17_WS_CHANNELS"] = str(ch_per_dev * n_dev)
    env["M17_WS_BLOCKS"] = str(n_blocks)
    out = subprocess.run(
        [sys.executable, __file__, "--worker"],
        env=env, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return float(json.loads(out.stdout.strip().splitlines()[-1])["samples_per_s"])


def worker() -> None:
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from m17_sdr_tpu.mesh import sharding
    from m17_sdr_tpu.pipeline.rx import RxSessionState

    n_dev = int(os.environ["M17_WS_DEVICES"])
    batch = int(os.environ["M17_WS_CHANNELS"])
    n_blocks = int(os.environ["M17_WS_BLOCKS"])
    block = 1920

    mesh = sharding.make_mesh(n_dev)
    run = sharding.sharded_rx_stream(mesh)

    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.normal(
        size=(batch, n_blocks, 2, block)).astype(np.float32))
    state = RxSessionState.init(batch)
    iq = sharding.shard_channels(iq, mesh)
    state = sharding.shard_channels(state, mesh)

    out, st2, _ = run(iq, state)       # compile + warm up
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out, st2, _ = run(iq, st2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"samples_per_s": batch * n_blocks * block / dt}))


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    ch_per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    counts = [1, 2, 4, 8]
    points = []
    base = None
    for n in counts:
        sps = run_one(n, ch_per_dev, n_blocks)
        if base is None:
            base = sps
        points.append({
            "devices": n,
            "channels": ch_per_dev * n,
            "samples_per_s": round(sps),
            "efficiency": round(sps / (base * n), 4),
        })
    print(json.dumps({"points": points}))


if __name__ == "__main__":
    main()
