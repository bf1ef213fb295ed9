#!/usr/bin/env python
"""Headline benchmark: aggregate RX-pipeline throughput per chip.

Runs the FULL batched receiver (front end -> fused timing+framer ->
frame extraction -> demap -> Viterbi/Golay/CRC for all frame types) on
B channels of real modulated M17 signal (int16 planar IQ, the radio HAL
wire format) and reports channel-samples/s per chip.  `vs_baseline`
compares against the reference C++ RX chain measured on the dev machine
(69.6 M samples/s single channel; see BASELINE.md) -- target >= 10x.

Content: the staggered multi-session mix from pipeline/benchdata.py
(channels span all session phases every instant -- the steady-state
regime of a 4096-channel deployment).

THE HEADLINE CONFIG (round 5): one whole staggered session -- 13 HAL
blocks = 24960 samples -- per device call, timed with a
block_until_ready after EVERY call.  Rationale, measured on the axon
v5e (BASELINE.md round-5 settlement):

  * the tunnel charges a per-dispatch round trip that swings
    ~10-300 us with link phase; at the HAL-block size (1920) that
    overhead is 0.2-2.5x the device work and the recorded number
    measures the tunnel, not the chip (rounds 2-4's recurring grief).
    One session per call amortizes it 13x, making the headline
    phase-robust;
  * per-call sync is load-bearing but NOT sufficient: in fast link
    phases the runtime's readiness signal runs ahead of execution and
    every in-process fence lies (measured 230-340 G = up to 1.35 TB/s
    implied input read on an 819 GB/s chip).  The roofline guard
    refuses any reading that implies input-read bandwidth beyond the
    chip's HBM, and WAITS for a measurable (dispatch-paced) phase --
    the instrument self-checks its own physics;
  * decode at session granularity is equivalent-or-better: the same
    per-sample math runs (per-channel control loops tick per call,
    i.e. per session), and every channel locks and streams in steady
    state (9 frames held per 13-block session vs 5.5 chained).

The kernel-vs-XLA receiver question lives at the HAL-block size where
both formulations run: `ab_t1920` carries an interleaved same-process
A/B of both legs (min+med each), the per-dispatch latency config that
live/streaming mode uses.  M17_BENCH_PALLAS=1 makes the Pallas leg the
HEADLINE (it cannot run the 24960 config -- its time-serial VMEM scan
gains nothing from bigger blocks); 0 pins XLA and skips the kernel leg.

Recording policy (VERDICT r4): a tunnel-phase PROBE (the phase-stable
Pallas Viterbi rate) gates recording -- the bench waits up to
M17_BENCH_PROBE_BUDGET seconds (default 300) for a fast window
(M17_BENCH_PROBE_FLOOR, default 2.2e8 frames/s) before timing, and
every probe lands in the JSON so a slow-phase artifact is
self-describing.

IMPORTANT (axon tunnel quirk): any device->host transfer -- even a
scalar -- permanently switches this process's TPU tunnel into a slow
synchronous mode (~300x).  Everything before the timed region therefore
stays on device, and no np.asarray()/float()/print of a device array
happens until after the clock stops.

Prints ONE JSON line (stdout):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "receiver": "xla"|"pallas", "config": {...}, "ab_t1920": {...},
   "viterbi_frames_per_s": N, "viterbi_vs_baseline": N,
   "phase_probes": [...]}
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_RX_SAMPLES_PER_S = 69_644_203.0  # BASELINE.md, bench_ref.cpp
REFERENCE_VITERBI_FRAMES_PER_S = 179_000.0  # BASELINE.md, bench_ref.cpp
REPS = 5            # headline reps (>= 2.5 s each; see headline_session)
AB_REPS = 3         # interleaved T=1920 A/B reps (~0.6 s each leg)
AB_ITERS = 350      # ~0.6 s per A/B rep at 4096 channels
VIT_BATCH = 4096
VIT_CALLS = 2000
HBM_ROOF_GBPS = 860.0   # v5 lite HBM ~819 GB/s + 5% measurement margin


def main() -> None:
    import jax

    # persistent compile cache: the variant compiles dominate cold
    # wall time; cache them across processes like the other tools
    cache = os.environ.get(
        "M17_JAX_CACHE", os.path.expanduser("~/.cache/m17_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from m17_sdr_tpu.fec.viterbi_pallas import viterbi_decode_pallas
    from m17_sdr_tpu.pipeline.benchdata import make_bench_blocks
    from m17_sdr_tpu.pipeline.rx import RxSessionState, rx_block

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    block = 1920
    dev_blocks, nblk = make_bench_blocks(batch, block)
    session = jnp.concatenate(list(dev_blocks), axis=-1)   # [B,2,nblk*1920]
    t_sess = nblk * block

    # --- tunnel-phase probe: the axon link alternates fast/slow phases
    # that change dispatch latency ~30x (the Pallas Viterbi is
    # phase-stable compute, so its rate is a clean phase meter).
    rngp = np.random.default_rng(7)
    probe_soft = jnp.asarray(
        rngp.normal(size=(VIT_BATCH, 296)).astype(np.float32))

    @jax.jit
    def probe_step(soft, prev):
        s = soft + jnp.where(prev[:1] > 1e30, 1.0, 0.0)
        return viterbi_decode_pallas(s, return_metric=True)

    def probe_rate(calls: int = 400) -> float:
        m = jnp.zeros((VIT_BATCH,), jnp.float32)
        bits, m = probe_step(probe_soft, m)
        jax.block_until_ready(bits)
        t0 = time.perf_counter()
        for _ in range(calls):
            bits, m = probe_step(probe_soft, m)
        jax.block_until_ready(bits)
        return VIT_BATCH * calls / (time.perf_counter() - t0)

    on_tpu = jax.default_backend() != "cpu"

    # Recording policy (VERDICT r4 weak #2): a headline recorded in a
    # slow tunnel phase measures the tunnel, not the chip.  The probe
    # GATES recording: wait until it clears PHASE_FAST before timing,
    # up to PROBE_BUDGET_S of wall (phases flip on second-to-minute
    # scales; round-5 saw 458 M and 121 M probes four minutes apart).
    # The whole-session headline config is itself phase-robust (it
    # amortizes the phase-dependent dispatch overhead 13x), so the
    # probe gate mainly protects the T=1920 A/B legs -- the default
    # budget is sized to keep a full bench run under ~10 minutes.
    PHASE_FAST = float(os.environ.get("M17_BENCH_PROBE_FLOOR", 2.2e8))
    PROBE_BUDGET_S = float(os.environ.get("M17_BENCH_PROBE_BUDGET", 300.0))
    probes = []
    if on_tpu:
        probe_t0 = time.perf_counter()
        while True:
            probes.append(round(probe_rate()))
            if probes[-1] >= PHASE_FAST:
                break
            if time.perf_counter() - probe_t0 > PROBE_BUDGET_S:
                break
            time.sleep(12.0)

    kernel_ok = on_tpu and batch % 1024 == 0
    pin = os.environ.get("M17_BENCH_PALLAS")
    if pin == "1" and not kernel_ok:
        print("error: M17_BENCH_PALLAS=1 cannot be honored "
              f"(backend={jax.default_backend()}, batch={batch}; the "
              "kernel needs a TPU and batch % 1024 == 0)", file=sys.stderr)
        sys.exit(2)

    def rate_1920(dt: float) -> float:
        return batch * block * AB_ITERS * nblk / dt

    def one_rep_1920(use_pallas: bool) -> float:
        st = RxSessionState.init(batch)
        t0 = time.perf_counter()
        for it in range(AB_ITERS):
            for i in range(nblk):
                out, st = rx_block(dev_blocks[i], st,
                                   use_pallas=use_pallas)
            # drain the dispatch queue periodically (an unbounded
            # multi-thousand-dispatch queue can wedge the tunnel)
            if it % 25 == 24:
                jax.block_until_ready(out)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    def stats_1920(ts):
        ts = sorted(ts)
        return {"min": round(rate_1920(ts[0])),
                "med": round(rate_1920(ts[len(ts) // 2]))}

    # ---- headline: one whole session per call, per-call synced ----
    # Region length is load-bearing TWICE over: (a) per-call
    # block_until_ready can still run AHEAD of true execution in fast
    # link phases (observed: short regions read 263 G = 1054 GB/s
    # implied input, impossible), and the backlog only throttles the
    # measurement back to truth over multi-second regions -- 400+
    # calls converged to the HBM roof (~205 G) where 100-call regions
    # overshot; (b) a host-read completion fence is not an option on
    # this tunnel (a single device->host scalar read measured 429 s
    # and poisons the process into ~300x mode).  So: long regions,
    # and the wait-for-measurable-phase retry loop below when even
    # those read super-physical.
    def headline_session(rep_s: float) -> tuple[list, list]:
        """Returns (sorted rep rates, per-rep call counts in rep order)."""
        st = RxSessionState.init(batch)
        out, st = rx_block(session, st)
        jax.block_until_ready(out)
        rates = []
        calls = []
        for _ in range(REPS):
            st = RxSessionState.init(batch)
            ncalls = 0
            t0 = time.perf_counter()
            while True:
                out, st = rx_block(session, st)
                jax.block_until_ready(out)      # load-bearing, see doc
                ncalls += 1
                dt = time.perf_counter() - t0
                if dt > rep_s:
                    break
            rates.append(batch * t_sess * ncalls / dt)
            calls.append(ncalls)
        # keep (rate, calls) pairs aligned under the sort: the artifact
        # lists rep_rates and calls_per_rep side by side and a reader
        # must be able to recompute rate = batch*t_sess*calls/rep_s
        # from matching positions
        order = sorted(range(len(rates)), key=lambda i: rates[i])
        return [rates[i] for i in order], [calls[i] for i in order]

    # ---- T=1920 interleaved A/B (per-dispatch latency config) ----
    ab = None
    if kernel_ok and pin != "0":
        out, _ = rx_block(dev_blocks[0], RxSessionState.init(batch),
                          use_pallas=True)
        jax.block_until_ready(out)
    out, _ = rx_block(dev_blocks[0], RxSessionState.init(batch))
    jax.block_until_ready(out)

    if kernel_ok and pin != "0":
        t_x, t_p = [], []
        for _ in range(AB_REPS):
            t_x.append(one_rep_1920(False))
            t_p.append(one_rep_1920(True))
        ab = {"xla": stats_1920(t_x), "pallas": stats_1920(t_p),
              "pallas_speedup": round(min(t_x) / min(t_p), 3)}
    else:
        t_x = [one_rep_1920(False) for _ in range(AB_REPS)]
        ab = {"xla": stats_1920(t_x)}
    print(json.dumps({"ab_t1920": ab}), file=sys.stderr)

    if pin == "1":
        # the kernel cannot run the whole-session config; its headline
        # is the per-dispatch latency config it is built for (min of
        # the interleaved reps, like the ab_t1920 record)
        variant = "pallas"
        samples_per_s = rate_1920(min(t_p))
        config = {"block_samples": block, "sync": "chained+drain",
                  "hal_blocks_per_call": 1}
    else:
        # roofline guard: never record a physically impossible number.
        # In FAST link phases the tunnel's readiness signal runs ahead
        # of execution and NO in-process fence is honest (per-call
        # syncs, scalar fences, 60 s regions all measured 230-340 G =
        # 930-1350 GB/s implied input read on an 819 GB/s chip; a
        # device->host read poisons the process instead of fencing).
        # In SLOW/MID phases -- the common case -- dispatch paces at
        # or above device time and the wall is a valid (if anything
        # conservative) throughput measure, reading 160-205 G, i.e.
        # at the HBM roof.  Policy: the instrument WAITS for a
        # measurable phase -- if the median of 5 regions is
        # super-physical, sleep and retry (phases flip on minute
        # scales) up to M17_BENCH_HEADLINE_BUDGET seconds; only if
        # every attempt in the budget is unmeasurable does it fall
        # back to the round-4 chained T=1920 instrument, recording the
        # rejected super-physical readings so the artifact shows the
        # machine was NOT slow that day.
        variant = "xla"
        HEADLINE_BUDGET_S = float(
            os.environ.get("M17_BENCH_HEADLINE_BUDGET", 720.0))
        head_t0 = time.perf_counter()
        rejected = []
        fell_back = False
        while True:
            rates, calls = headline_session(2.5)
            med_rate = rates[len(rates) // 2]
            implied_gbps = med_rate * 4.0 / 1e9
            if not on_tpu or implied_gbps <= HBM_ROOF_GBPS:
                break
            rejected.extend(round(r) for r in rates)
            if time.perf_counter() - head_t0 > HEADLINE_BUDGET_S:
                print("roofline guard: super-physical for the whole "
                      "headline budget; falling back to the chained "
                      "T=1920 instrument", file=sys.stderr)
                fell_back = True
                break
            print(f"roofline guard: {implied_gbps:.0f} GB/s implied "
                  "(readiness running ahead in a fast link phase); "
                  "waiting for a measurable phase", file=sys.stderr)
            time.sleep(20.0)
        if fell_back:
            # fresh chained reps NOW: the chained instrument reads its
            # best in exactly the fast phases that defeat the session
            # instrument, and the earlier ab_t1920 legs may have run
            # in a different phase
            t_fb = [one_rep_1920(False) for _ in range(2)]
            samples_per_s = rate_1920(min(t_fb + t_x))
            config = {"block_samples": block, "sync": "chained+drain",
                      "hal_blocks_per_call": 1,
                      "roofline_fallback": True,
                      "session_rates_rejected": rejected}
        else:
            samples_per_s = med_rate
            config = {"block_samples": t_sess, "sync": "per_call",
                      "hal_blocks_per_call": nblk,
                      "calls_per_rep": calls, "rep_s": 2.5,
                      "rejected_attempt_rates": rejected or None,
                      "equalize": "off (throughput config; sessions "
                                  "default to auto, which lax.cond-"
                                  "skips the stage until a channel "
                                  "arms)",
                      "implied_input_read_gbps": round(implied_gbps, 1),
                      "rep_rates": [round(r) for r in rates]}

    # --- secondary metric: Pallas Viterbi frames/s at 4096 channels on
    # stream-sized trellises (296 depunctured soft bits -> 148 steps;
    # m17_conv.cpp:148-168 / m17_rx_parse.cpp:138-140).  Chained through
    # a data dependency so the loop cannot overlap into a lie.
    rng = np.random.default_rng(1)
    vit_soft = jnp.asarray(
        rng.normal(size=(VIT_BATCH, 296)).astype(np.float32))

    @jax.jit
    def vit_step(soft, prev_metric):
        s = soft + jnp.where(prev_metric[:1] > 1e30, 1.0, 0.0)
        return viterbi_decode_pallas(s, return_metric=True)

    m = jnp.zeros((VIT_BATCH,), jnp.float32)
    bits, m = vit_step(vit_soft, m)
    jax.block_until_ready(bits)
    vit_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(VIT_CALLS):
            bits, m = vit_step(vit_soft, m)
        jax.block_until_ready(bits)
        vit_ts.append(time.perf_counter() - t0)
    vit_frames_per_s = VIT_BATCH * VIT_CALLS / min(vit_ts)

    print(json.dumps({
        "metric": f"rx_pipeline_channel_samples_per_s_per_chip_b{batch}",
        "value": round(samples_per_s),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / REFERENCE_RX_SAMPLES_PER_S, 2),
        "receiver": variant,
        "config": config,
        "ab_t1920": ab,
        "viterbi_frames_per_s": round(vit_frames_per_s),
        "viterbi_vs_baseline": round(
            vit_frames_per_s / REFERENCE_VITERBI_FRAMES_PER_S, 1),
        "phase_probes": probes,
    }))


if __name__ == "__main__":
    main()
