#!/usr/bin/env python
"""Per-stage TPU timing of the RX pipeline, to find the bottleneck."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from m17_sdr_tpu.dsp.discriminator import RxFrontEndState, rx_front_end
from m17_sdr_tpu.fec.viterbi import viterbi_decode
from m17_sdr_tpu.frame import rx_frames
from m17_sdr_tpu.frame.receiver import ReceiverState, receive_block
from m17_sdr_tpu.pipeline.rx import RxSessionState, rx_block


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    iq = jax.device_put(jnp.asarray(rng.normal(size=(b, 2, 1920)).astype(np.float32)))
    soft2x = jax.device_put(jnp.asarray(rng.normal(size=(b, 384)).astype(np.float32)))
    softbits = jax.device_put(
        jnp.asarray(rng.normal(size=(b * 3, 488)).astype(np.float32)))
    frames = jax.device_put(
        jnp.asarray(rng.normal(size=(b * 3, 192)).astype(np.float32)))

    fe_state = RxFrontEndState.init(b)
    rx_state = ReceiverState.init(b)
    sess = RxSessionState.init(b)
    inf = jnp.zeros(b, bool)

    print(f"batch={b}")
    bench("front_end", lambda: rx_front_end(iq, fe_state, inf))
    bench("receive_block(scan)", lambda: receive_block(soft2x, rx_state))
    bench("viterbi_488", lambda: viterbi_decode(softbits))
    bench("demap", lambda: rx_frames.demap_frame(frames))
    dec = jax.jit(lambda s: rx_frames.decode_stream(s))
    soft368 = jax.device_put(
        jnp.asarray(rng.normal(size=(b * 3, 368)).astype(np.float32)))
    bench("decode_stream_full", lambda: dec(soft368))
    bench("rx_block_total", lambda: rx_block(iq, sess))

    # optional jax.profiler trace capture (SURVEY.md section 5.1): view
    # with TensorBoard or Perfetto.  --trace[=dir]
    trace_arg = next((a for a in sys.argv if a.startswith("--trace")), None)
    if trace_arg:
        trace_dir = (trace_arg.split("=", 1)[1]
                     if "=" in trace_arg else "/tmp/m17_trace")
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out, _ = rx_block(iq, sess)
            jax.block_until_ready(out)
        print(f"profiler trace written to {trace_dir}")


if __name__ == "__main__":
    main()
