#!/usr/bin/env python
"""Streaming-session throughput on the current backend.

Measures the StreamingRx engine end to end (host blocks -> chunked
device dispatch -> on-device state carry), i.e. the CLI's actual RX
path, as a real-time factor (1.0 = keeps up with one live 48 kHz
radio).  Timed region excludes compile (one warm chunk first) and the
final device->host transfer is excluded from the rate (it happens once
per session regardless of length).

Usage: python tools/streaming_bench.py [batch=1] [blocks=500]
Prints one JSON line.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import numpy as np

    from m17_sdr_tpu.app.streaming import StreamingRx
    from m17_sdr_tpu.spec.constants import BLOCK_SAMPLES

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    platform = jax.devices()[0].platform

    rng = np.random.default_rng(0)
    blocks = [rng.integers(-8000, 8000, (batch, BLOCK_SAMPLES, 2),
                           dtype=np.int16) for _ in range(50)]

    # warm: compile the chunk fn (flush: uploads are double-buffered,
    # so one chunk alone would only stage, not compute)
    warm = StreamingRx(batch=batch)
    for i in range(warm.chunk_blocks):
        warm.feed_block(blocks[i % 50])
    warm.flush_pending()
    jax.block_until_ready(warm._state.rx.receiver.flock)

    srx = StreamingRx(batch=batch)
    t0 = time.perf_counter()
    for i in range(n_blocks):
        srx.feed_block(blocks[i % 50])
    srx.flush_pending()                  # drain the staged chunk too
    jax.block_until_ready(srx._state.rx.receiver.flock)
    dt = time.perf_counter() - t0

    signal_seconds = n_blocks * BLOCK_SAMPLES / 48_000.0
    print(json.dumps({
        "platform": platform,
        "batch": batch,
        "blocks": n_blocks,
        "wall_s": round(dt, 3),
        "channel_samples_per_s": round(batch * n_blocks * BLOCK_SAMPLES / dt),
        "realtime_factor_per_channel": round(signal_seconds / dt, 1),
        "realtime_channels": round(batch * signal_seconds / dt),
    }))


if __name__ == "__main__":
    main()
