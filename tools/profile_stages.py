#!/usr/bin/env python
"""Per-stage device-time attribution for the RX pipeline (PROFILE_r4).

Methodology (the ONLY instrument validated against driver-recorded
BENCH results on the axon tunnel -- see BASELINE.md round-3 notes):
every stage is timed as a per-block *state-chained* loop (each call
consumes the previous call's carry, forcing real sequential execution)
with one block_until_ready after the whole rep; and the stages' reps
are INTERLEAVED round-robin in one process so tunnel-phase drift
cancels instead of booking to whichever leg ran last.  Timing a jitted
stage in isolation with a sync per call measures dispatch issue, not
device time (round-3 lesson), so nothing here does that.

Stages:
  rx_session           full rx_block, ONE WHOLE SESSION (13 HAL blocks
                       = 24960 samples) per call, per-call synced --
                       the round-5 bench headline config; reported per
                       1920-sample HAL-block equivalent
  rx_pallas / rx_xla   full rx_block at the HAL-block size (the
                       per-dispatch latency config)
  front_end            discriminator front end only
  recv_pallas/recv_xla receive_block (receiver + frame extraction)
  kernel_only          the fused Pallas scan WITHOUT frame extraction
  viterbi4096          stream-sized Viterbi, B=4096 trellises
  decode_typed         demap + all four typed frame decoders

The rx_session vs rx_xla delta in the SAME process is the dispatch/
per-call overhead the whole-session config amortizes 13x.

Derived attribution (printed in the JSON):
  extraction  = recv_pallas - kernel_only   (argsort/gather machinery)
  typed_decode = rx_pallas - recv_pallas - front_end

Usage: python tools/profile_stages.py [batch] [--json=PROFILE_r4.json]
       [--trace[=dir]]   (adds a jax.profiler trace of rx_block)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 40          # passes over the session per rep
REPS = 4


def main():
    import jax
    import jax.numpy as jnp

    from m17_sdr_tpu.fec.viterbi_pallas import viterbi_decode_pallas
    from m17_sdr_tpu.frame import rx_frames
    from m17_sdr_tpu.frame.receiver import (
        ReceiverState, TIMING_FILTER_TAPS, receive_block)
    from m17_sdr_tpu.frame.receiver_pallas import receiver_scan_pallas
    from m17_sdr_tpu.dsp.discriminator import RxFrontEndState, rx_front_end
    from m17_sdr_tpu.pipeline.benchdata import make_bench_blocks
    from m17_sdr_tpu.pipeline.rx import RxSessionState, rx_block

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = 1920
    dev_blocks, nblk = make_bench_blocks(batch, block)

    # soft-sample blocks for the receiver-only stages: run the front
    # end once (chained) over the session
    fe = RxFrontEndState.init(batch)
    inf = jnp.zeros(batch, bool)
    soft_blocks = []
    for i in range(nblk):
        dec, _, fe = rx_front_end(dev_blocks[i], fe, inf)
        soft_blocks.append(dec)

    # fixed inputs for the stateless stages
    rng = np.random.default_rng(1)
    vit_soft = jnp.asarray(rng.normal(size=(batch, 296)).astype(np.float32))
    frames = jnp.asarray(
        rng.normal(size=(batch * 3, 192)).astype(np.float32))

    # kernel-only wrapper: concat ext + kernel + window roll, but no
    # frame extraction (the argsort/gather path receive_block adds)
    import functools

    @jax.jit
    def kernel_only_block(soft, state):
        ext = jnp.concatenate([state.window[:, 1:], soft], axis=-1)
        slot, flags, st2 = receiver_scan_pallas(ext, state)
        st2 = st2._replace(window=ext[:, -TIMING_FILTER_TAPS:])
        return slot, flags, st2

    @jax.jit
    def viterbi_chained(soft, prev_metric):
        s = soft + jnp.where(prev_metric[:1] > 1e30, 1.0, 0.0)
        bits, metric = viterbi_decode_pallas(s, return_metric=True)
        return bits, metric

    @jax.jit
    def decode_typed(fr, prev):
        fr = fr + jnp.where(prev[:1, :1] > 1e30, 1.0, 0.0)
        soft = rx_frames.demap_frame(fr)
        lsf = rx_frames.decode_lsf(soft)
        stream = rx_frames.decode_stream(soft)
        packet = rx_frames.decode_packet(soft)
        bert = rx_frames.decode_bert(soft)
        return (lsf.metric + stream.metric + packet.metric + bert.metric)[
            :, None]

    # --- stage definitions: (name, rep_fn, work_items_per_rep) where a
    # rep runs ITERS chained passes and returns wall seconds.
    def rep_rx(use_pallas):
        def rep():
            st = RxSessionState.init(batch)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                for i in range(nblk):
                    out, st = rx_block(dev_blocks[i], st,
                                       use_pallas=use_pallas)
            jax.block_until_ready(out)
            return time.perf_counter() - t0
        return rep

    import jax.numpy as jnp2

    session_blk = jnp2.concatenate(list(dev_blocks), axis=-1)

    SESSION_REPEAT = 125   # lengthen the timed region: short per-call-
    # synced regions overshoot the HBM roofline (the tunnel's readiness
    # signal runs ahead of execution; see bench.py's roofline guard) --
    # multi-second regions converge to physical rates

    def rep_rx_session():
        # one whole session per call, per-call synced (the bench
        # headline instrument; see bench.py's roofline discussion)
        st = RxSessionState.init(batch)
        t0 = time.perf_counter()
        for _ in range(ITERS * SESSION_REPEAT):
            out, st = rx_block(session_blk, st)
            jax.block_until_ready(out)
        return time.perf_counter() - t0

    def rep_front_end():
        st = RxFrontEndState.init(batch)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            for i in range(nblk):
                dec, _, st = rx_front_end(dev_blocks[i], st, inf)
        jax.block_until_ready(dec)
        return time.perf_counter() - t0

    def rep_recv(use_pallas):
        def rep():
            st = ReceiverState.init(batch)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                for i in range(nblk):
                    ev, st = receive_block(soft_blocks[i], st,
                                           use_pallas=use_pallas)
            jax.block_until_ready(ev)
            return time.perf_counter() - t0
        return rep

    def rep_kernel_only():
        st = ReceiverState.init(batch)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            for i in range(nblk):
                slot, flags, st = kernel_only_block(soft_blocks[i], st)
        jax.block_until_ready(slot)
        return time.perf_counter() - t0

    def rep_viterbi():
        m = jnp.zeros((batch,), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(ITERS * nblk):
            bits, m = viterbi_chained(vit_soft, m)
        jax.block_until_ready(bits)
        return time.perf_counter() - t0

    def rep_decode_typed():
        prev = jnp.zeros((batch * 3, 1), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(ITERS * nblk):
            prev = decode_typed(frames, prev)
        jax.block_until_ready(prev)
        return time.perf_counter() - t0

    on_tpu = jax.default_backend() != "cpu"
    stages = [
        ("rx_session", rep_rx_session),
        ("rx_xla", rep_rx(False)),
        ("front_end", rep_front_end),
        ("recv_xla", rep_recv(False)),
        ("viterbi4096", rep_viterbi),
        ("decode_typed", rep_decode_typed),
    ]
    if on_tpu and batch % 1024 == 0:
        stages[0:0] = [("rx_pallas", rep_rx(True))]
        stages[3:3] = [("recv_pallas", rep_recv(True)),
                       ("kernel_only", rep_kernel_only)]

    # compile everything first (one throwaway rep per stage)
    names = [n for n, _ in stages]
    print(f"batch={batch} nblk={nblk} iters={ITERS} reps={REPS}",
          file=sys.stderr)
    saved_iters = globals()["ITERS"]
    globals()["ITERS"] = 1
    for n, rep in stages:
        rep()
        print(f"compiled {n}", file=sys.stderr)
    globals()["ITERS"] = saved_iters

    # interleaved timed reps
    times = {n: [] for n in names}
    for r in range(REPS):
        for n, rep in stages:
            times[n].append(rep())
        print(f"rep {r + 1}/{REPS} done", file=sys.stderr)

    nb = ITERS * nblk  # blocks per rep
    result = {"batch": batch, "nblk": nblk, "iters": ITERS, "reps": REPS,
              "backend": jax.default_backend(), "stages": {}}
    for n in names:
        ts = sorted(times[n])
        stage_nb = nb * (SESSION_REPEAT if n == "rx_session" else 1)
        per_block_ms = [t / stage_nb * 1e3 for t in ts]
        result["stages"][n] = {
            "ms_per_block_min": round(per_block_ms[0], 4),
            "ms_per_block_med": round(
                per_block_ms[len(per_block_ms) // 2], 4),
            "samples_per_s": round(batch * block / (per_block_ms[0] / 1e3)),
        }

    s = result["stages"]
    result["derived"] = {
        # per-HAL-block dispatch/launch overhead the session config
        # amortizes: same pipeline, same process, 13 blocks per call
        # vs 1 block per call
        "dispatch_overhead_ms_per_block": round(
            s["rx_xla"]["ms_per_block_min"]
            - s["rx_session"]["ms_per_block_min"], 4),
    }
    if "recv_pallas" in s and "kernel_only" in s:
        result["derived"].update({
            "extraction_ms": round(
                s["recv_pallas"]["ms_per_block_min"]
                - s["kernel_only"]["ms_per_block_min"], 4),
            "typed_decode_ms": round(
                s["rx_pallas"]["ms_per_block_min"]
                - s["recv_pallas"]["ms_per_block_min"]
                - s["front_end"]["ms_per_block_min"], 4),
        })
    print(json.dumps(result, indent=1))

    trace_arg = next((a for a in sys.argv if a.startswith("--trace")), None)
    if trace_arg:
        trace_dir = (trace_arg.split("=", 1)[1]
                     if "=" in trace_arg else "/tmp/m17_trace")
        st = RxSessionState.init(batch)
        with jax.profiler.trace(trace_dir):
            for i in range(nblk):
                out, st = rx_block(dev_blocks[i], st, use_pallas=on_tpu)
            jax.block_until_ready(out)
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)

    jpath = next((a.split("=", 1)[1] for a in sys.argv
                  if a.startswith("--json=")), None)
    if jpath:
        with open(jpath, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
