"""Full TX pipeline: session frames -> dibits -> complex IQ.

Mirrors the TX side of m17_txrx_thread (m17_tx_rx.cpp:88-119): carrier,
2x preamble, link setup, N stream frames, EOT -- but builds the whole
transmission for B channels as one batched, fixed-shape computation.
The per-frame LICH counter and frame number are pure functions of the
frame index, so all stream frames encode in a single batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dsp.modulate import ModState, modulate_dibits
from ..frame import tx_frames
from ..spec.constants import FRAME_SYMBOLS, LICH_CHUNKS, SAMPLES_PER_SYMBOL


class TxSessionConfig(NamedTuple):
    """Static per-channel link parameters."""

    lsf_bytes: jnp.ndarray      # [B, 30] link setup frame incl. CRC


@functools.partial(jax.jit, static_argnames=("n_preambles",))
def build_voice_session_dibits(
    lsf_bytes: jnp.ndarray,
    payloads: jnp.ndarray,
    fn0: jnp.ndarray | None = None,
    n_preambles: int = 2,
) -> jnp.ndarray:
    """[B,30] LSF + [B,NF,16] voice payloads -> [B, nsym] session dibits.

    Sequence (m17_tx_rx.cpp:95-115): n_preambles x preamble, LSF,
    NF stream frames (LICH counter = frame index mod 6, FN counting
    from fn0), EOT.
    """
    b, nf, _ = payloads.shape
    fn0 = jnp.zeros((b,), jnp.uint32) if fn0 is None else fn0

    parts = [tx_frames.preamble_frame(b) for _ in range(n_preambles)]
    parts.append(tx_frames.build_link_setup_frame(lsf_bytes))

    # batch all stream frames at once: fold NF into the batch dim
    idx = jnp.arange(nf, dtype=jnp.uint32)
    lich_count = jnp.broadcast_to(idx % LICH_CHUNKS, (b, nf)).reshape(b * nf)
    # 15-bit FN wrap: the MSB is the M17 end-of-stream marker and must
    # not be reached by the counter (cf. the reference's 16-bit wrap at
    # m17_tx_routines.cpp:170, which leaks the EOS bit after 32768
    # frames; rx masks FN deltas to 15 bits to match either way)
    fn = ((fn0[:, None] + idx[None, :]) & 0x7FFF).reshape(b * nf)
    lsf_rep = jnp.repeat(lsf_bytes, nf, axis=0)
    stream = tx_frames.build_stream_frame(
        lsf_rep, lich_count.astype(jnp.int32), fn,
        payloads.reshape(b * nf, 16),
    ).reshape(b, nf * FRAME_SYMBOLS)
    parts.append(stream)
    parts.append(tx_frames.eot_frame(b))
    # idle frame so receivers complete the EOT (m17_tx_rx.cpp:114-115
    # waits 40 ms keyed after the EOT)
    parts.append(tx_frames.preamble_frame(b))
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.jit, static_argnames=("oversample",))
def dibits_to_iq(
    dibits: jnp.ndarray,
    mod_state: ModState | None = None,
    oversample: int = SAMPLES_PER_SYMBOL,
) -> tuple[jnp.ndarray, ModState]:
    """[B, N] dibits -> [B, N*oversample] complex baseband."""
    if mod_state is None:
        mod_state = ModState.init(dibits.shape[0])
    return modulate_dibits(dibits, mod_state, oversample=oversample)


@functools.partial(jax.jit, static_argnames=("n_preambles",))
def build_packet_session_dibits(
    lsf_bytes: jnp.ndarray,
    data: jnp.ndarray,
    n_preambles: int = 2,
) -> jnp.ndarray:
    """Packet-mode transmission: preambles + LSF + packet frames + EOT.

    `data` [B, L] raw packet bytes (same L per channel).  The M17 packet
    superframe appends CRC-16 over the data, then chunks into 25-byte
    frames: non-final frames carry a 5-bit frame counter, the final
    frame carries EOF=1 with the count of bytes used in it
    (m17_fmt_add_packet / m17_send_packet, m17_tx_routines.cpp:201-222,
    323-353 -- dormant in the reference, live here).
    """
    from ..spec import crc
    from ..spec.constants import PACKET_CHUNK_BYTES

    b, length = data.shape
    payload = crc.crc16_append(data)                       # [B, L+2]
    total = length + 2
    nf = -(-total // PACKET_CHUNK_BYTES)
    last_len = total - (nf - 1) * PACKET_CHUNK_BYTES
    pad = nf * PACKET_CHUNK_BYTES - total
    payload = jnp.pad(payload, ((0, 0), (0, pad)))
    chunks = payload.reshape(b * nf, PACKET_CHUNK_BYTES)

    idx = jnp.arange(nf, dtype=jnp.int32)
    eof = jnp.broadcast_to(idx == nf - 1, (b, nf)).reshape(b * nf)
    # non-final: frame counter; final: bytes used in the last chunk
    meta = jnp.where(idx == nf - 1, last_len, idx)
    meta = jnp.broadcast_to(meta, (b, nf)).reshape(b * nf)

    pkt = tx_frames.build_packet_frame(chunks, eof, meta).reshape(
        b, nf * FRAME_SYMBOLS)
    parts = [tx_frames.preamble_frame(b) for _ in range(n_preambles)]
    parts.append(tx_frames.build_link_setup_frame(lsf_bytes))
    parts.append(pkt)
    parts.append(tx_frames.eot_frame(b))
    parts.append(tx_frames.preamble_frame(b))
    return jnp.concatenate(parts, axis=-1)


def build_bert_session_dibits(
    batch: int, n_frames: int, n_preambles: int = 2
) -> jnp.ndarray:
    """BERT transmission: preambles + NF BERT frames + EOT.

    PRBS9 position advances 197 bits per frame, continuous across the
    session (m17_prbs9_tx_load keeps a running index,
    m17_prbs9.cpp:27-32).
    """
    from ..spec.prbs import BERT_FRAME_BITS

    idx = jnp.arange(n_frames, dtype=jnp.int32)
    starts = jnp.broadcast_to(
        (idx * BERT_FRAME_BITS) % 511, (batch, n_frames)
    ).reshape(batch * n_frames)
    bert = tx_frames.build_bert_frame(starts).reshape(
        batch, n_frames * FRAME_SYMBOLS)
    parts = [tx_frames.preamble_frame(batch) for _ in range(n_preambles)]
    parts.append(bert)
    parts.append(tx_frames.eot_frame(batch))
    parts.append(tx_frames.preamble_frame(batch))
    return jnp.concatenate(parts, axis=-1)
