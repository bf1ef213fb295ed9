"""End-to-end loopback harnesses (BASELINE configs 1-3).

TX dibits -> RRC 4FSK IQ -> channel impairments (AWGN, carrier offset,
clock drift) -> limiter/discriminator -> timing recovery -> framer ->
FEC -> payload/BER comparison, for B channels at once.

This generalizes the reference's compile-time __TEST__ hook
(m17_test.cpp) into the measurement harness the reference never
finished (its BERT RX was a stub, m17_rx_parse.cpp:178-180).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp import channel
from ..pipeline import tx as txp
from ..pipeline.rx import RxSessionState, rx_stream
from ..spec import prbs
from ..spec.constants import BLOCK_SAMPLES, SAMPLES_PER_SYMBOL


class LoopbackResult(NamedTuple):
    # voice mode
    frames_sent: int
    frames_recovered: jnp.ndarray   # [B]
    payload_byte_errors: jnp.ndarray  # [B]
    # bert mode
    bert_bits: jnp.ndarray          # [B]
    bert_errors: jnp.ndarray        # [B]
    locked_any: jnp.ndarray         # [B]


def _blockify(iq2: jnp.ndarray, block: int = BLOCK_SAMPLES) -> jnp.ndarray:
    """[B, 2, T] planar IQ -> [B, NBLK, 2, block]."""
    b, _, t = iq2.shape
    nblk = t // block
    x = iq2[:, :, : nblk * block].reshape(b, 2, nblk, block)
    return jnp.moveaxis(x, 1, 2)


def voice_loopback(
    key: jax.Array,
    lsf_bytes: jnp.ndarray,
    payloads: jnp.ndarray,
    snr_db=60.0,
    freq_offset_hz=0.0,
    drift_ppm=0.0,
    afc: bool = False,
):
    """Voice session TX -> channel -> RX.  Returns (RxBlockOutput stacked
    over blocks, sent payloads) for comparison by the caller."""
    dibits = txp.build_voice_session_dibits(lsf_bytes, payloads)
    iq, _ = txp.dibits_to_iq(dibits)
    if float(np.max(np.abs(np.asarray(drift_ppm)))) != 0.0:
        iq = channel.timing_drift(iq, drift_ppm)
    if float(np.max(np.abs(np.asarray(freq_offset_hz)))) != 0.0:
        iq = channel.carrier_offset(iq, freq_offset_hz)
    iq = channel.awgn(key, iq, snr_db)
    state = RxSessionState.init(iq.shape[0])
    out, state = rx_stream(_blockify(iq), state, afc_enabled=afc)
    return out, state


def recover_stream_payloads(out, nf: int) -> tuple[np.ndarray, np.ndarray]:
    """Collect decoded stream payloads ordered by FN -> [B, NF, 16]
    plus a recovered mask [B, NF]."""
    sv = np.asarray(out.stream_valid)          # [B, NBLK, F]
    fn = np.asarray(out.stream_fn)
    pl = np.asarray(out.stream_payload)
    b = sv.shape[0]
    got = np.zeros((b, nf, 16), dtype=np.uint8)
    mask = np.zeros((b, nf), dtype=bool)
    flat_v = sv.reshape(b, -1)
    flat_fn = fn.reshape(b, -1)
    flat_pl = pl.reshape(b, -1, 16)
    for ch in range(b):
        for j in np.nonzero(flat_v[ch])[0]:
            f = int(flat_fn[ch, j])
            if f < nf:
                got[ch, f] = flat_pl[ch, j]
                mask[ch, f] = True
    return got, mask


def packet_loopback(
    key: jax.Array,
    lsf_bytes: jnp.ndarray,
    data: jnp.ndarray,
    snr_db=60.0,
    freq_offset_hz=0.0,
    drift_ppm=0.0,
):
    """Packet-mode TX -> channel -> RX.  Returns the stacked RX output."""
    dibits = txp.build_packet_session_dibits(lsf_bytes, data)
    iq, _ = txp.dibits_to_iq(dibits)
    if float(np.max(np.abs(np.asarray(drift_ppm)))) != 0.0:
        iq = channel.timing_drift(iq, drift_ppm)
    if float(np.max(np.abs(np.asarray(freq_offset_hz)))) != 0.0:
        iq = channel.carrier_offset(iq, freq_offset_hz)
    iq = channel.awgn(key, iq, snr_db)
    state = RxSessionState.init(iq.shape[0])
    out, state = rx_stream(_blockify(iq), state)
    return out, state


def reassemble_packets(out) -> list[bytes | None]:
    """Rebuild each channel's packet from decoded packet frames.

    Chunks concatenate in arrival order; the EOF frame contributes only
    its first `fn` bytes (the final-length field).  The trailing CRC-16
    is verified over the whole packet and stripped; a channel with no
    EOF or a bad CRC yields None (decode_packet_frame,
    m17_rx_parse.cpp:34-51).
    """
    from ..spec.crc import _crc_numpy

    pv = np.asarray(out.packet_valid)            # [B, NBLK, F]
    pd = np.asarray(out.packet_data)
    pe = np.asarray(out.packet_eof)
    pf = np.asarray(out.packet_fn)
    b = pv.shape[0]
    flat_v = pv.reshape(b, -1)
    flat_d = pd.reshape(b, flat_v.shape[1], -1)
    flat_e = pe.reshape(b, -1)
    flat_f = pf.reshape(b, -1)
    results: list[bytes | None] = []
    for ch in range(b):
        buf = bytearray()
        done = False
        for j in np.nonzero(flat_v[ch])[0]:
            if flat_e[ch, j]:
                buf += bytes(flat_d[ch, j][: int(flat_f[ch, j])])
                done = True
                break
            buf += bytes(flat_d[ch, j])
        if not done or len(buf) < 3:
            results.append(None)
            continue
        if _crc_numpy(np.frombuffer(bytes(buf), dtype=np.uint8)) != 0:
            results.append(None)
            continue
        results.append(bytes(buf[:-2]))
    return results


def bert_loopback(
    key: jax.Array,
    batch: int,
    n_frames: int,
    snr_db=60.0,
    freq_offset_hz=0.0,
    drift_ppm=0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PRBS9 BER loopback (BASELINE config 1).

    Returns (bit_errors [B], bits_counted [B]) over all recovered BERT
    frames; unrecovered frames are excluded (frame recovery rate is a
    separate metric).
    """
    dibits = txp.build_bert_session_dibits(batch, n_frames)
    iq, _ = txp.dibits_to_iq(dibits)
    if float(np.max(np.abs(np.asarray(drift_ppm)))) != 0.0:
        iq = channel.timing_drift(iq, drift_ppm)
    if float(np.max(np.abs(np.asarray(freq_offset_hz)))) != 0.0:
        iq = channel.carrier_offset(iq, freq_offset_hz)
    iq = channel.awgn(key, iq, snr_db)
    state = RxSessionState.init(batch)
    out, _ = rx_stream(_blockify(iq), state)

    bv = np.asarray(out.bert_valid).reshape(batch, -1)
    bb = np.asarray(out.bert_bits).reshape(batch, bv.shape[1], -1)
    errors = np.zeros(batch, np.int64)
    counted = np.zeros(batch, np.int64)
    for ch in range(batch):
        idx = np.nonzero(bv[ch])[0]
        if len(idx) == 0:
            continue
        # stream checker with predicted-shift accounting: independent
        # per-frame best-shift alignment under-reports failing links
        # (see prbs.check_stream)
        e, n, _ = prbs.check_stream(bb[ch, idx])
        errors[ch] = e
        counted[ch] = n
    return jnp.asarray(errors), jnp.asarray(counted)
