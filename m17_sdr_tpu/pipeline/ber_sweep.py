"""BER-vs-SNR sweep harness (BASELINE config 5).

The reference intended BER measurement over the air (PRBS9 TX frames,
m17_tx_routines.cpp:226-238, with an RX checker at m17_prbs9.cpp:40-64
that was never wired up).  Here the sweep is a first-class batched run:
every SNR point gets a block of independent channels, the whole sweep is
ONE batched TX -> AWGN -> RX pass on the device (per-channel noise sigma
-- `channel.awgn` accepts an [B] SNR vector), and the curve comes back
as per-point BER + frame-recovery rate.  This is the parity instrument
against the reference RX chain's SNR bound (BASELINE.md targets).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import loopback


class SweepPoint(NamedTuple):
    snr_db: float
    channels: int
    bits: int                 # PRBS9 bits counted over recovered frames
    bit_errors: int
    ber: float
    frames_sent: int
    frames_recovered: int
    frame_recovery: float


def ber_sweep(
    key: jax.Array,
    snr_points_db: Sequence[float],
    channels_per_point: int = 16,
    n_frames: int = 20,
    freq_offset_hz: float = 0.0,
    drift_ppm: float = 0.0,
) -> list[SweepPoint]:
    """Run the PRBS9 BERT loopback at every SNR point in one batch.

    Channel c belongs to SNR point c // channels_per_point; all points
    share one device pass, so a 13-point 0..12 dB sweep at 64 channels
    per point is a single 832-channel run.
    """
    points = np.asarray(list(snr_points_db), dtype=np.float32)
    cpp = int(channels_per_point)
    batch = len(points) * cpp
    snr_vec = jnp.asarray(np.repeat(points, cpp))

    errors, counted = loopback.bert_loopback(
        key, batch, n_frames, snr_db=snr_vec,
        freq_offset_hz=freq_offset_hz, drift_ppm=drift_ppm)
    errors = np.asarray(errors).reshape(len(points), cpp)
    counted = np.asarray(counted).reshape(len(points), cpp)

    # bits per recovered BERT frame = payload bits after Viterbi
    from ..spec.constants import BERT_BITS
    out: list[SweepPoint] = []
    for i, snr in enumerate(points):
        bits = int(counted[i].sum())
        errs = int(errors[i].sum())
        frames_rec = bits // BERT_BITS
        frames_sent = n_frames * cpp
        out.append(SweepPoint(
            snr_db=float(snr), channels=cpp,
            bits=bits, bit_errors=errs,
            ber=(errs / bits) if bits else 1.0,
            frames_sent=frames_sent, frames_recovered=frames_rec,
            frame_recovery=frames_rec / frames_sent,
        ))
    return out


def sweep_to_json(points: list[SweepPoint]) -> list[dict]:
    return [p._asdict() for p in points]
