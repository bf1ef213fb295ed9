"""PRBS9 (x^9 + x^5 + 1) for BERT frames.

Reference: m17_prbs9.cpp.  The 511-bit sequence is generated once
(lines 16-26); TX loads consecutive windows (27-32); RX hunts for
alignment with an 18-bit match/mismatch hysteresis (40-64).

TPU-first: the sequence is a static table, so TX windows are gathers and
the BER check over a whole batch of received bit streams reduces to
correlation against all 511 cyclic shifts at once (one matmul) instead
of a serial hysteresis FSM -- same decision, no scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PRBS9_LEN = 511
BERT_FRAME_BITS = 197  # PRBS bits per BERT frame (m17_tx_routines.cpp:228)


def _generate() -> np.ndarray:
    seq = np.zeros(PRBS9_LEN, dtype=np.uint8)
    sr = 0x01
    for i in range(PRBS9_LEN):
        bit = ((sr >> 8) ^ (sr >> 4)) & 1
        sr = ((sr << 1) | bit) & 0x1FF
        seq[i] = bit
    return seq


PRBS9_SEQUENCE = _generate()


def tx_window(start: int | jnp.ndarray, length: int) -> jnp.ndarray:
    """PRBS9 bits [start, start+length) with wraparound.

    Reference: m17_prbs9_tx_load (m17_prbs9.cpp:27-32).  `start` may be a
    batched array of per-channel positions.
    """
    idx = (jnp.arange(length) + jnp.asarray(start)[..., None]) % PRBS9_LEN
    return jnp.take(jnp.asarray(PRBS9_SEQUENCE), idx, axis=-1)


def align_and_count_errors(rx_bits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best-alignment BER count for [..., N] received hard bits.

    Correlates against all 511 cyclic shifts simultaneously: the shift
    with the fewest mismatches wins.  Returns (errors [...], shift [...]).
    This replaces the serial sync-hunting checker (m17_prbs9.cpp:40-64)
    with a branchless batched form; for a correctly received stream both
    report the same error count.
    """
    n = rx_bits.shape[-1]
    idx = (np.arange(PRBS9_LEN)[:, None] + np.arange(n)[None, :]) % PRBS9_LEN
    shifted = PRBS9_SEQUENCE[idx].astype(np.float32)          # [511, N]
    rx = (rx_bits.astype(jnp.float32) * 2.0 - 1.0)            # +-1
    ref = jnp.asarray(shifted * 2.0 - 1.0)
    # matches - mismatches = rx . ref ; errors = (N - dot) / 2
    dot = rx @ ref.T                                          # [..., 511]
    errors = (n - dot) / 2.0
    best = jnp.argmin(errors, axis=-1)
    return jnp.take_along_axis(errors, best[..., None], axis=-1)[..., 0].astype(
        jnp.int32
    ), best.astype(jnp.int32)


# Stream-checker thresholds (fractions of BERT_FRAME_BITS).  While
# synced, a frame is counted at the PREDICTED alignment unless its
# error count implies the alignment was lost (a quarter of the bits
# wrong -- far beyond any usable link); re-acquisition demands a
# clearly-good match, below the ~77-error floor that the minimum over
# 510 WRONG shifts of a random 197-bit frame reaches (which is why
# per-frame best-shift alignment alone under-reports a dead link).
RESYNC_FRAC = 0.25
ACCEPT_FRAC = 0.20


def check_stream(rx_frames: np.ndarray) -> tuple[int, int, int]:
    """BER count for a SEQUENCE of received BERT frames [NF, 197].

    The serial equivalent of the reference's sync-hunting checker
    (m17_prbs9.cpp:40-64): acquire alignment once on a clearly-good
    frame, then count each following frame's errors at the PREDICTED
    shift (TX advances 197 bits/frame through the 511-bit sequence),
    re-acquiring only when the prediction fails -- a dropped frame
    breaks the prediction and costs one resync, like the reference's
    hysteresis.  Frames received while no alignment holds count at the
    50% a dead link truly delivers; aligning each frame independently
    to its best of 511 shifts (align_and_count_errors) would cap them
    near the min-over-wrong-shifts floor (~39% of bits) and
    under-report exactly the failing links a BERT exists to measure.

    Returns (bit_errors, bits_counted, unsynced_frames).  Frames
    received while no alignment holds are booked at the estimated 50%
    a dead link delivers, not a measured mismatch; `unsynced_frames`
    counts them so callers can flag how much of `bit_errors` is
    estimated rather than measured error mass.
    """
    rx = np.asarray(rx_frames, dtype=np.uint8)
    nf, n = rx.shape
    idx = (np.arange(PRBS9_LEN)[:, None] + np.arange(n)[None, :]) % PRBS9_LEN
    shifted = PRBS9_SEQUENCE[idx]                            # [511, N]
    # per-frame error count at every shift: [NF, 511]
    errs = (rx[:, None, :] != shifted[None, :, :]).sum(axis=-1)

    resync = int(RESYNC_FRAC * n)
    accept = int(ACCEPT_FRAC * n)
    synced = False
    shift = 0
    errors = 0
    unsynced = 0
    for f in range(nf):
        e_best = int(errs[f].min())
        s_best = int(errs[f].argmin())
        if synced and int(errs[f, shift]) <= resync:
            errors += int(errs[f, shift])
            shift = (shift + n) % PRBS9_LEN
        elif e_best <= accept:
            errors += e_best
            shift = (s_best + n) % PRBS9_LEN
            synced = True
        else:
            errors += (n + 1) // 2
            unsynced += 1
            synced = False
    return errors, nf * n, unsynced
