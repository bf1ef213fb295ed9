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


# ---------------------------------------------------------------------------
# Pod-scale sharded sweep (BASELINE config 5 as ONE program; VERDICT r3
# weak #4).  The whole BERT sweep -- TX synthesis, AWGN, the full RX
# pipeline, and the PRBS error ACCOUNTING -- runs inside one shard_map
# over the mesh's channel axis, with the per-point counters reduced by
# a single psum (the all_reduce SURVEY.md section 5.8 maps to config
# 5).  Noise is keyed PER CHANNEL so a sharded run is bit-identical to
# the unsharded one (asserted by tools/sweep_pod.py and test_mesh).
# ---------------------------------------------------------------------------


def bert_sweep_counts(keys: jnp.ndarray, snr_vec: jnp.ndarray,
                      n_frames: int):
    """Device-pure BERT sweep over one channel block.

    keys [B, 2] uint32 per-channel PRNG keys, snr_vec [B] dB.
    Returns (errors [B], bits [B], unsynced [B], frames [B]) int32 --
    all computed on device (spec.prbs.check_stream_device), so the
    caller may psum them across a mesh without host round trips.
    """
    from ..spec import prbs
    from .loopback import _blockify
    from .rx import RxSessionState, rx_stream
    from . import tx as txp

    batch = snr_vec.shape[0]
    dibits = txp.build_bert_session_dibits(batch, n_frames)
    iq, _ = txp.dibits_to_iq(dibits)
    snr = 10.0 ** (snr_vec.astype(jnp.float32) / 10.0)
    sigma = jnp.sqrt(1.0 / (2.0 * snr))
    noise = jax.vmap(
        lambda k: jax.random.normal(k, iq.shape[1:]))(keys)
    iq = iq + noise * sigma[:, None, None]
    out, _ = rx_stream(_blockify(iq), RxSessionState.init(batch))
    bv = out.bert_valid.reshape(batch, -1)
    bb = out.bert_bits.reshape(batch, bv.shape[1], -1)
    err, bits, uns = prbs.check_stream_device(bv, bb)
    return err, bits, uns, jnp.sum(bv.astype(jnp.int32), axis=-1)


def pod_bert_sweep(mesh, keys: jnp.ndarray, snr_vec: jnp.ndarray,
                   n_frames: int):
    """The sweep sharded over `mesh`'s first axis with psum'd totals.

    Returns (errors [B], bits [B], unsynced [B], frames [B],
    totals [4]) where totals = psum of the four counters over the mesh
    -- the pod-wide reduced error counters, computed ON the mesh.
    """
    import functools

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    def run(keys, snr):
        err, bits, uns, frames = bert_sweep_counts(keys, snr, n_frames)
        totals = jax.lax.psum(
            jnp.stack([jnp.sum(err), jnp.sum(bits),
                       jnp.sum(uns), jnp.sum(frames)]), axis)
        return err, bits, uns, frames, totals

    return run(keys, snr_vec)
