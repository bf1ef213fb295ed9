"""IQ-domain BER parity vs the reference chain (VERDICT r4 weak #6).

The soft-domain harness (pipeline/ber_parity.py) enters both chains at
the post-discriminator seam the reference gates behind __TEST__
(m17_test.cpp:42-52) -- it compares everything EXCEPT the analog front
end.  This harness closes that last seam: both chains consume
IDENTICAL 48 kHz int16 interleaved IQ (the radio HAL wire format,
radio.cpp:157-170):

  (a) the reference's COMPLETE chain compiled in place
      (tests/golden_gen/ber_ref_iq.cpp: m17_dsp_rx's short->float
      scale, hard limiter, quadrature discriminator with /5 decimation
      and block-mean DC removal, m17_dsp.cpp:461-476, 194-222 -- then
      timing recovery, framer, stream decode), and
  (b) this framework's full rx pipeline (pipeline.rx.rx_stream, whose
      front end is dsp/discriminator.py),

so per-SNR agreement of frame recovery and payload BER compares the
FM front ends too -- with AWGN alone and with a carrier offset that
exercises both discriminators' DC paths.

Known intentional deviation (documented in dsp/discriminator.py):
while LOCKED, this chain subtracts a carried slow DC estimate where
the reference always subtracts the instantaneous block mean -- which
lets the EOT pattern's nonzero symbol mean shift its own block.  This
affects only the session's final frames' margins and is invisible at
the frame/BER agreement level the predicates test.
"""

from __future__ import annotations

import pathlib
import struct
import subprocess

import numpy as np

from .ber_parity import (
    GOLDEN_DIR,
    Decodes,
    ParityPoint,
    _lsf_for,
    ber_agreement_ok,
    frame_agreement_ok,
    parity_to_json,
    score,
)

BLOCK = 1920                  # N_SAMPLES: 40 ms at 48 kHz
GUARD_BLOCKS = 3              # leading/trailing silence blocks
# Wire amplitude: HALF the level of a default framework capture
# (tx_gain 0.5 * 2.0 = 1.0 x 0x3FFF, session.py _transmit_dibits).
# The 6 dB headroom keeps signal+noise inside int16 at the low-SNR
# sweep points (at full scale the 8 dB-SNR noise peaks clip, and the
# clipping would be a third impairment neither chain models).  Level
# is immaterial to the parity question itself: both front ends
# hard-limit to unit magnitude before the discriminator
# (m17_dsp.cpp:412-419 / dsp/discriminator.py) and both demaps
# normalize by the sync-word magnitude.
WIRE_AMP = 0.5 * 0x3FFF


def make_iq_wire(nch: int, nf: int, snr_db: float, seed: int,
                 freq_offset_hz: float = 0.0):
    """Build nch noisy int16-IQ voice sessions at one RF SNR.

    Returns (wire [nch, nsamp, 2] int16, payloads [nch, nf, 16]).
    SNR is defined against the unit-magnitude FM carrier
    (dsp/channel.awgn); the wire scales signal+noise by WIRE_AMP (half
    a default framework capture's level -- see the constant's comment
    for why the headroom, and why level cannot affect parity).
    """
    import jax
    import jax.numpy as jnp

    from ..dsp import channel
    from . import tx as txp

    rng = np.random.default_rng(seed)
    payloads = rng.integers(0, 256, (nch, nf, 16), dtype=np.uint8)
    dibits = txp.build_voice_session_dibits(
        _lsf_for(nch), jnp.asarray(payloads))
    iq, _ = txp.dibits_to_iq(dibits)                 # [nch, 2, T] unit
    guard = jnp.zeros((nch, 2, GUARD_BLOCKS * BLOCK), jnp.float32)
    iq = jnp.concatenate([guard, iq, guard], axis=-1)
    pad = (-iq.shape[-1]) % BLOCK
    if pad:
        iq = jnp.pad(iq, ((0, 0), (0, 0), (0, pad)))
    if freq_offset_hz:
        iq = channel.carrier_offset(iq, freq_offset_hz)
    iq = channel.awgn(jax.random.PRNGKey(seed), iq, snr_db)
    wire = np.asarray(jnp.moveaxis(iq, 1, 2) * WIRE_AMP)
    wire = np.clip(np.round(wire), -32767, 32767).astype("<i2")
    return wire, payloads


def run_reference_iq(wire: np.ndarray, workdir: str,
                     jobs: int = 8) -> Decodes:
    """Decode the int16 IQ with the reference's complete chain.

    One ber_ref_iq PROCESS PER CHANNEL (framer lock and LICH/LSF good-
    copies live in file statics with no reset API; see
    ber_parity.run_reference)."""
    import concurrent.futures

    exe = GOLDEN_DIR / "ber_ref_iq"
    if not exe.exists():
        subprocess.run(["make", "-C", str(GOLDEN_DIR), "-s", "ber_ref_iq"],
                       check=True)

    def one(ch: int) -> tuple[int, str]:
        path = pathlib.Path(workdir) / f"iq{ch}.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<ii", 1, wire.shape[1]))
            wire[ch].astype("<i2").tofile(f)
        out = subprocess.run([str(exe), str(path)], check=True,
                             capture_output=True, text=True).stdout
        path.unlink()
        return ch, out

    dec = Decodes({}, {}, {}, {})
    with concurrent.futures.ThreadPoolExecutor(jobs) as ex:
        for ch, out in ex.map(one, range(wire.shape[0])):
            for line in out.splitlines():
                toks = line.split()
                if len(toks) == 4 and toks[0] == "P":
                    dec.stream.setdefault(
                        (ch, int(toks[2])), bytes.fromhex(toks[3]))
    return dec


def run_jax_iq(wire: np.ndarray) -> Decodes:
    """Decode the SAME int16 IQ with this framework's full pipeline."""
    import jax.numpy as jnp

    from .rx import RxSessionState, rx_stream

    nch, nsamp, _ = wire.shape
    blocks = jnp.asarray(
        np.moveaxis(wire.reshape(nch, nsamp // BLOCK, BLOCK, 2), 3, 2))
    out, _ = rx_stream(blocks, RxSessionState.init(nch))
    sv = np.asarray(out.stream_gate).reshape(nch, -1)
    fn = np.asarray(out.stream_fn).reshape(nch, -1)
    pl = np.asarray(out.stream_payload).reshape(nch, -1, 16)
    dec = Decodes({}, {}, {}, {})
    for ch in range(nch):
        for j in np.nonzero(sv[ch])[0]:
            dec.stream.setdefault((ch, int(fn[ch, j])), bytes(pl[ch, j]))
    return dec


def run_parity_iq(snr_points_db, nch: int, nf: int, workdir: str,
                  seed: int = 0, min_fn: int = 8,
                  freq_offset_hz: float = 0.0,
                  jobs: int = 8) -> list[ParityPoint]:
    """Shared-IQ parity sweep: identical int16 IQ through both chains'
    complete RX paths (front end included)."""
    points = []
    for i, snr in enumerate(snr_points_db):
        wire, payloads = make_iq_wire(
            nch, nf, float(snr), seed=seed + 1000 * i,
            freq_offset_hz=freq_offset_hz)
        ref = run_reference_iq(wire, workdir, jobs=jobs)
        jx = run_jax_iq(wire)
        points.append(ParityPoint(
            snr_db=float(snr), sigma=float(
                np.sqrt(1.0 / (2.0 * 10.0 ** (snr / 10.0)))),
            ref=score(ref.stream, payloads, min_fn),
            jax=score(jx.stream, payloads, min_fn)))
    return points


__all__ = ["make_iq_wire", "run_reference_iq", "run_jax_iq",
           "run_parity_iq", "ber_agreement_ok", "frame_agreement_ok",
           "parity_to_json"]
