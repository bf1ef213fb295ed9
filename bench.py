#!/usr/bin/env python
"""Headline benchmark: aggregate RX-pipeline throughput per chip.

Runs the FULL batched receiver (front end -> fused timing+framer scan ->
frame extraction -> demap -> Viterbi/Golay/CRC for all frame types) on
B channels of real modulated M17 signal and reports channel-samples/s
per chip.  `vs_baseline` compares against the reference C++ RX chain
measured on the dev machine (69.6 M samples/s single channel; see
BASELINE.md) -- target >= 10x.

IMPORTANT (axon tunnel quirk): any device->host transfer -- even a
scalar -- permanently switches this process's TPU tunnel into a slow
synchronous mode (~300x).  Everything before the timed region therefore
stays on device: the TX signal is built with jnp ops only, blocks are
sliced on device, and no np.asarray()/float()/print of a device array
happens until after the clock stops.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

REFERENCE_RX_SAMPLES_PER_S = 69_644_203.0  # BASELINE.md, bench_ref.cpp


def main() -> None:
    import jax
    import jax.numpy as jnp

    from m17_sdr_tpu.pipeline import tx as txp
    from m17_sdr_tpu.pipeline.rx import RxSessionState, rx_block
    from m17_sdr_tpu.spec import bits as bitpack
    from m17_sdr_tpu.spec import callsign
    from m17_sdr_tpu.frame import tx_frames
    from m17_sdr_tpu.spec.typefield import M17Type

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = 1920

    # --- build one session of real signal, tiled to the channel count.
    # All on device; no host round trips (see module docstring).
    b0 = 64
    dst = jnp.asarray(np.tile(
        bitpack.word_to_bytes(callsign.encode_callsign("AB1CDE"), 6), (b0, 1)))
    src = jnp.asarray(np.tile(
        bitpack.word_to_bytes(callsign.encode_callsign("G4GUO"), 6), (b0, 1)))
    lsf = tx_frames.build_lsf_bytes(
        dst, src, jnp.full((b0,), M17Type().pack(), dtype=jnp.uint32),
        jnp.zeros((b0, 14), jnp.uint8))
    rng = np.random.default_rng(0)
    payloads = jnp.asarray(rng.integers(0, 256, (b0, 8, 16), dtype=np.uint8))
    dibits = txp.build_voice_session_dibits(lsf, payloads)
    iq, _ = txp.dibits_to_iq(dibits)                       # [b0, 2, T] planar

    nblk = iq.shape[-1] // block

    @jax.jit
    def make_blocks(iq):
        blk = jnp.moveaxis(
            iq[:, :, : nblk * block].reshape(b0, 2, nblk, block), 1, 2)
        return jnp.tile(blk, (batch // b0, 1, 1, 1))       # [batch,nblk,2,T]

    blocks = make_blocks(iq)
    dev_blocks = [blocks[:, i] for i in range(nblk)]       # on-device slices
    state = RxSessionState.init(batch)

    # M17_BENCH_PALLAS=1 dispatches the fused Pallas receiver kernel
    # (frame/receiver_pallas.py).  Measured regimes (BASELINE.md): the
    # kernel is ~1.4x faster on locked steady-state streams but slower
    # on acquisition-heavy content (per-step taps refresh + sync
    # correlation storms while hunting), and this bench's signal replays
    # whole sessions including acquisition -- so the XLA scan remains
    # the default here.
    import os

    use_pallas = (jax.default_backend() != "cpu" and batch % 1024 == 0
                  and os.environ.get("M17_BENCH_PALLAS", "0") == "1")

    # warmup / compile
    out, st = rx_block(dev_blocks[0], state, use_pallas=use_pallas)
    jax.block_until_ready(out)
    jax.block_until_ready(dev_blocks)

    # timed: loop the session's blocks.  The timed region must be long
    # enough to swamp tunnel dispatch jitter (a 3-iter run is ~5 ms and
    # varies 2x run to run); 30 iters x 11 blocks ~ 150 ms is stable.
    iters = 30
    t0 = time.perf_counter()
    st = state
    total_blocks = 0
    for _ in range(iters):
        for i in range(nblk):
            out, st = rx_block(dev_blocks[i], st, use_pallas=use_pallas)
            total_blocks += 1
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_s = batch * block * total_blocks / dt
    print(json.dumps({
        "metric": f"rx_pipeline_channel_samples_per_s_per_chip_b{batch}",
        "value": round(samples_per_s),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / REFERENCE_RX_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
