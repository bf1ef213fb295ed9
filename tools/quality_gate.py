#!/usr/bin/env python
"""Stress the voice-quality gate beyond its calibration corpus
(VERDICT r3 weak #7).

STREAM_QUALITY_MIN = 0.9 (pipeline/rx.py) was calibrated on the parity
harness's 16-channel clean-AWGN waveforms.  This tool measures the
gate's false-accept / false-reject rates in regimes the calibration
never saw:

  awgn            clean AWGN at 7/10/14 dB soft-domain (baseline)
  offset+drift    300 Hz carrier offset + 120 ppm clock drift + noise
                  through the FULL FM chain
  pluto-rate      384 kS/s TX -> x8 decimating FIR front end -> chain
  isi / isi+eq    two-ray fading ISI under the auto-armed equalizer
                  (the eye-closure detector arms the stage per channel,
                  pipeline/rx.py EYE_ARM) vs the stage forced on

Per regime, every delivered (pre-gate) stream frame is matched against
the transmitted payload: actually-clean = 0 payload bit errors,
actually-garbled = > 5% wrong bits.  false-accept = garbled frame with
quality > threshold; false-reject = clean frame with quality <=
threshold.  The artifact also records each population's extreme
quality (clean floor vs garbled ceiling) so the margin is visible.

Writes QUALITY_GATE_r5.json (with per-regime reject attribution and
re-anchor latency, VERDICT r4 weak #3).
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="QUALITY_GATE_r5.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from m17_sdr_tpu.dsp import channel, resample
    from m17_sdr_tpu.frame import tx_frames
    from m17_sdr_tpu.pipeline import ber_parity as bp
    from m17_sdr_tpu.pipeline import tx as txp
    from m17_sdr_tpu.pipeline.loopback import _blockify
    from m17_sdr_tpu.pipeline.rx import (
        STREAM_QUALITY_MIN, RxSessionState, rx_stream, rx_stream_soft)
    from m17_sdr_tpu.spec import bits as bitpack
    from m17_sdr_tpu.spec import callsign as cs
    from m17_sdr_tpu.spec.typefield import M17Type

    nch, nf = args.channels, args.frames
    rng = np.random.default_rng(args.seed)

    def mk_session(seed):
        r = np.random.default_rng(seed)
        dst = jnp.asarray(np.tile(bitpack.word_to_bytes(
            cs.encode_callsign("AB1CDE"), 6), (nch, 1)))
        src = jnp.asarray(np.tile(bitpack.word_to_bytes(
            cs.encode_callsign("G4GUO"), 6), (nch, 1)))
        lsf = tx_frames.build_lsf_bytes(
            dst, src, jnp.full((nch,), M17Type().pack(), jnp.uint32),
            jnp.zeros((nch, 14), jnp.uint8))
        pl = r.integers(0, 256, (nch, nf, 16), dtype=np.uint8)
        dibits = txp.build_voice_session_dibits(lsf, jnp.asarray(pl))
        return dibits, pl

    def score(out, payloads):
        """Classify every delivered (pre-gate) frame.

        Rows carry (quality, shipped-gate decision, payload bit
        errors, lich_ok, fn_ok) with errors=999 for frames whose
        decoded FN matches no transmitted frame (misframes).  The
        tally buckets them:
          clean     0 errors
          degraded  1..25% wrong bits -- scratchy but usable voice;
                    the reference delivers these (with more errors),
                    and near-threshold FM links produce them
                    inherently, so they are NOT false-accept material
          garbage   > 25% wrong bits or a misframe -- what the gate
                    exists to block
        lich_ok/fn_ok are the gate's own exported terms
        (RxBlockOutput.stream_lich_ok / stream_fn_ok), so rejects
        decompose exactly as the shipped fold computed them.
        """
        sv = np.asarray(out.stream_valid).reshape(nch, -1)
        gate = np.asarray(out.stream_gate).reshape(nch, -1)
        fn = np.asarray(out.stream_fn).reshape(nch, -1)
        plx = np.asarray(out.stream_payload).reshape(nch, -1, 16)
        q = np.asarray(out.stream_quality).reshape(nch, -1)
        lok = np.asarray(out.stream_lich_ok).reshape(nch, -1)
        fok = np.asarray(out.stream_fn_ok).reshape(nch, -1)
        rows = []    # (quality, gate, bit_errors, lich_ok, fn_ok, chan)
        for c in range(nch):
            for j in np.nonzero(sv[c])[0]:
                f = int(fn[c, j])
                g = bool(gate[c, j])
                e = (999 if f >= nf else
                     int(np.unpackbits(plx[c, j] ^ payloads[c, f]).sum()))
                rows.append((float(q[c, j]), g, e,
                             bool(lok[c, j]), bool(fok[c, j]), c))
        return rows

    def tally(rows, thresh=STREAM_QUALITY_MIN):
        qs = np.array([r[0] for r in rows]) if rows else np.zeros(0)
        accg = np.array([r[1] for r in rows], bool) if rows else np.zeros(0, bool)
        errs = np.array([r[2] for r in rows]) if rows else np.zeros(0)
        lok = np.array([r[3] for r in rows], bool) if rows else np.zeros(0, bool)
        fok = np.array([r[4] for r in rows], bool) if rows else np.zeros(0, bool)
        clean = errs == 0
        garbage = errs > 0.25 * 128
        degraded = ~clean & ~garbage
        accq = qs > thresh
        n_g, n_c = int(garbage.sum()), int(clean.sum())

        # reject attribution (VERDICT r4 weak #3): decompose the full
        # gate's CLEAN-frame rejects into which term(s) blocked them.
        # "fn_window_only" is the FN-continuity gate's OWN cost -- a
        # clean frame that passed LICH routing and the quality
        # threshold and was dropped purely for discontinuity.
        rej_c = clean & ~accg
        attribution = {
            "clean_rejected": int(rej_c.sum()),
            "lich_unknown": int((rej_c & ~lok).sum()),
            "fn_window_only": int((rej_c & lok & accq & ~fok).sum()),
            "quality_only": int((rej_c & lok & fok & ~accq).sum()),
            "quality_and_fn": int((rej_c & lok & ~fok & ~accq).sum()),
        }

        # re-anchor latency after a FALSE anchor (a quality-passing
        # garbage frame re-aims the FN window): count the run of clean
        # frames lost to ~fn_ok immediately after each one.  Design
        # bound: every quality-passing frame re-anchors, so a lone
        # misframe costs at most the one clean frame behind it.
        chans = np.array([r[5] for r in rows]) if rows else np.zeros(0, int)
        runs = []
        for c in np.unique(chans):
            m = chans == c
            cg, cc, cf = garbage[m] & accq[m], clean[m], fok[m]
            for i in np.nonzero(cg)[0]:
                run = 0
                for j in range(i + 1, len(cf)):
                    if not cc[j]:
                        continue
                    if cf[j]:
                        break
                    run += 1
                runs.append(run)
        attribution["false_anchors"] = len(runs)
        if runs:
            attribution["reanchor_frames_lost_mean"] = round(
                float(np.mean(runs)), 3)
            attribution["reanchor_frames_lost_max"] = int(max(runs))

        def rates(acc):
            fa = int((acc & garbage).sum())
            fr = int((~acc & clean).sum())
            n_adm = int(acc.sum())
            return {"false_accept": fa,
                    "false_accept_rate": round(fa / n_g, 4) if n_g else None,
                    "admitted": n_adm,
                    "garbage_frac_of_admitted": round(fa / n_adm, 4)
                    if n_adm else None,
                    "false_reject": fr,
                    "false_reject_rate": round(fr / n_c, 4) if n_c else None}

        return {
            "delivered": len(rows), "clean": n_c,
            "degraded": int(degraded.sum()), "garbage": n_g,
            "degraded_admitted": int((accg & degraded).sum()),
            "quality_threshold_only": rates(accq),
            "full_gate": rates(accg),
            "reject_attribution": attribution,
            "clean_quality_floor": round(float(qs[clean].min()), 4)
            if n_c else None,
            "garbage_quality_ceiling": round(float(qs[garbage].max()), 4)
            if n_g else None,
        }

    regimes = {}

    # --- soft-domain AWGN baselines (the calibration-like regime) ---
    for snr in (7.0, 10.0, 14.0):
        p_sig = bp.signal_power(2, 16)
        sigma = float(np.sqrt(p_sig / 10 ** (snr / 10)))
        wave, pl = bp.make_waveforms(nch, nf, sigma, seed=args.seed + 17)
        blocks = jnp.asarray(wave.reshape(nch, -1, bp.CHUNK_2X))
        out, _ = rx_stream_soft(blocks, RxSessionState.init(nch))
        regimes[f"awgn_{snr:g}dB"] = tally(score(out, pl))

    # --- combined carrier offset + clock drift through the FM chain ---
    dibits, pl = mk_session(args.seed + 1)
    iq, _ = txp.dibits_to_iq(dibits)
    iq = channel.timing_drift(iq, 120.0)
    iq = channel.carrier_offset(iq, 300.0)
    iq = channel.awgn(jax.random.PRNGKey(args.seed), iq, 17.0)
    out, _ = rx_stream(_blockify(iq), RxSessionState.init(nch))
    regimes["offset300Hz_drift120ppm_17dB"] = tally(score(out, pl))

    # --- Pluto-rate input: 384 kS/s TX -> x8 decimating FIR -> chain ---
    dibits, pl = mk_session(args.seed + 2)
    iq384, _ = txp.dibits_to_iq(dibits, oversample=80)
    iq384 = channel.awgn(jax.random.PRNGKey(args.seed + 9), iq384, 20.0)
    iq48, _ = resample.fir_decimate(
        iq384, jnp.asarray(resample.pluto_dec_taps()),
        resample.decimate_init(nch), factor=8)
    out, _ = rx_stream(_blockify(iq48), RxSessionState.init(nch))
    regimes["pluto_384k_20dB"] = tally(score(out, pl))

    # --- fading-in multipath ISI, equalizer off vs on (soft domain):
    # echoes grow mid-capture (mobile channel) so the receiver
    # acquires clean and the ISI hits established sessions -- the same
    # model the equalizer acceptance tests use ---
    wave, pl = bp.make_waveforms(nch, nf, sigma=0.0, seed=args.seed + 21)
    w = np.asarray(wave)
    t = np.arange(w.shape[1]) / w.shape[1]
    g = np.clip((t - 0.35) / 0.15, 0.0, 1.0)
    for k, a in enumerate((1.0, 0.6, 0.3)):
        if k == 0:
            continue
        w[:, k:] += (a * g[k:]) * w[:, :-k]
    w = (w + rng.normal(0, 0.02, w.shape)).astype(np.float32)
    blocks = jnp.asarray(w.reshape(nch, -1, bp.CHUNK_2X))
    for eq in ("auto", True):
        out, st = rx_stream_soft(blocks, RxSessionState.init(nch),
                                 equalize=eq)
        name = "isi_2ray" if eq == "auto" else "isi_2ray_eq"
        regimes[name] = tally(score(out, pl))
        if eq == "auto":
            regimes[name]["auto_eq_armed_channels"] = int(
                np.asarray(st.eq_armed).sum())
            regimes[name]["eye_est_med"] = round(float(
                np.median(np.asarray(st.eye_est))), 4)

    # ok = in EVERY regime (round 5: no exemptions -- the isi_2ray
    # regime now runs under the shipping auto-armed equalizer, which
    # detects the closed eye and corrects the compression that used to
    # defeat the confidence gate), garbage makes up <= 1% of what the
    # SHIPPED gate admits (a confidence gate bounds, not eliminates:
    # under sustained drift a rare partially-garbled frame lands just
    # above the threshold with a plausible FN -- the reference for
    # comparison admits 100% of garbage), and the quality threshold
    # itself rejects <= 2% of clean frames (the full gate's reject
    # count additionally contains protocol-level unroutability --
    # frames before the LICH is known, quantified per regime in
    # reject_attribution -- which is not the threshold's doing; the
    # reference cannot route those either).
    ok = all(
        (r["full_gate"]["garbage_frac_of_admitted"] or 0.0) <= 0.01
        and (r["quality_threshold_only"]["false_reject_rate"] is None
             or r["quality_threshold_only"]["false_reject_rate"] <= 0.02)
        for name, r in regimes.items())
    doc = {"threshold": STREAM_QUALITY_MIN, "channels": nch,
           "frames_per_session": nf, "regimes": regimes, "ok": bool(ok)}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    for name, r in regimes.items():
        print(f"{name:28s} delivered={r['delivered']:4d} "
              f"clean={r['clean']:4d} degr={r['degraded']:3d} "
              f"garbage={r['garbage']:3d} "
              f"gateFA={r['full_gate']['false_accept']} "
              f"gateFR={r['full_gate']['false_reject']} "
              f"qFA={r['quality_threshold_only']['false_accept']} "
              f"fnOnly={r['reject_attribution']['fn_window_only']} "
              f"floor={r['clean_quality_floor']} "
              f"ceil={r['garbage_quality_ceiling']}")
    print("ok:", ok, "->", args.out)


if __name__ == "__main__":
    main()
