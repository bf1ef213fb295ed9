#!/usr/bin/env python
"""Run the shared-waveform BER parity sweep vs the reference RX chain
and write BER_PARITY.json (VERDICT round-1 item 2; BASELINE correctness
bound: "BER sweep 0-12 dB").

Usage: python tools/ber_parity.py [--channels 16] [--frames 16]
"""

import argparse
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="BER_PARITY.json")
    ap.add_argument("--snr", type=float, nargs="*",
                    default=[0.0, 2.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0,
                             10.0, 11.0, 12.0])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from m17_sdr_tpu.pipeline import ber_parity as bp

    with tempfile.TemporaryDirectory() as td:
        points = bp.run_parity(args.snr, nch=args.channels,
                               nf=args.frames, workdir=td, seed=args.seed)
    doc = bp.parity_to_json(points)
    doc["channels"] = args.channels
    doc["frames_per_session"] = args.frames
    doc["agreement"] = {
        f"{p.snr_db:g}dB": {
            "ber_ok": bool(bp.ber_agreement_ok(p)),
            "frames_ok": bool(bp.frame_agreement_ok(p)),
        }
        for p in points
    }
    doc["all_ok"] = bool(all(
        bp.ber_agreement_ok(p) and bp.frame_agreement_ok(p) for p in points))
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    for p in points:
        rb, jb = p.bers()
        print(f"snr={p.snr_db:5.1f}  ref {p.ref[0]:3d}/{p.ref[1]} "
              f"ber={rb:.5f} | jax {p.jax[0]:3d}/{p.jax[1]} ber={jb:.5f}")
    print("all_ok:", doc["all_ok"], "->", args.out)


if __name__ == "__main__":
    main()
