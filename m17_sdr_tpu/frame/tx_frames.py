"""TX frame formatting: LSF, stream, packet, BERT, preamble, EOT.

Reference: m17_tx_routines.cpp.  Every builder here is batched over a
leading channel axis and returns 192 dibits per frame (8 sync + 184
payload).  The bit pipelines are the reference's exact sequences
(conv -> puncture -> interleave -> whiten -> sync + dibits) realized as
static gathers and GF(2) matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fec import conv
from ..spec import bits, crc, golay, interleave, puncture, whiten
from ..spec.constants import (
    EOT_DIBITS,
    FRAME_SYMBOLS,
    LICH_CHUNKS,
    LSF_BYTES,
    PREAMBLE_DIBITS,
    SYNC_WORD_BERT,
    SYNC_WORD_LINK,
    SYNC_WORD_PACKET,
    SYNC_WORD_STREAM,
)
from ..spec.prbs import BERT_FRAME_BITS, tx_window


def _sync_dibits(word: int) -> np.ndarray:
    return np.array(
        [(word >> (14 - 2 * i)) & 0x3 for i in range(8)], dtype=np.uint8
    )


def _finish_frame(payload_bits: jnp.ndarray, sync_word: int) -> jnp.ndarray:
    """interleave -> whiten -> dibits, prepend sync -> [B, 192] dibits.

    Reference: tail of m17_fmt_add_* (m17_tx_routines.cpp:107-116,
    178-186, 215-218).
    """
    out = whiten.whiten_bits(interleave.interleave(payload_bits))
    dib = bits.bits_to_dibits(out)
    sync = jnp.broadcast_to(
        jnp.asarray(_sync_dibits(sync_word)), (*dib.shape[:-1], 8)
    )
    return jnp.concatenate([sync, dib], axis=-1)


def build_lsf_bytes(
    dst: jnp.ndarray, src: jnp.ndarray, type_word: jnp.ndarray, meta: jnp.ndarray
) -> jnp.ndarray:
    """Assemble the 30-byte link setup frame incl. CRC.

    [B,6] dst + [B,6] src + [B] type + [B,14] meta -> [B,30].
    Reference: build_lich (m17_tx_routines.cpp:37-53).
    """
    tw = jnp.stack(
        [(type_word >> 8).astype(jnp.uint8), (type_word & 0xFF).astype(jnp.uint8)],
        axis=-1,
    )
    body = jnp.concatenate([dst, src, tw, meta], axis=-1)
    return crc.crc16_append(body)


def build_link_setup_frame(lsf_bytes30: jnp.ndarray) -> jnp.ndarray:
    """[B, 30] LSF bytes -> [B, 192] frame dibits.

    Reference: m17_fmt_add_link_setup_frame (m17_tx_routines.cpp:92-117).
    """
    coded = conv.conv_encode_bytes(lsf_bytes30)            # [B, 488]
    kept = puncture.puncture(coded, "p1")                  # [B, 368]
    return _finish_frame(kept, SYNC_WORD_LINK)


def build_stream_frame(
    lsf_bytes30: jnp.ndarray,
    lich_count: jnp.ndarray,
    fn: jnp.ndarray,
    payload16: jnp.ndarray,
) -> jnp.ndarray:
    """One voice/stream frame -> [B, 192] dibits.

    lich_count [B] selects which 5-byte LSF chunk rides in this frame's
    LICH (mod-6 counter); fn [B] is the 16-bit frame number.
    Reference: m17_fmt_add_stream_frame (m17_tx_routines.cpp:143-187).
    """
    b = lsf_bytes30.shape[0]
    # 5-byte chunk at lich_count*5 + counter byte (count in top 3 bits)
    start = (lich_count.astype(jnp.int32) % LICH_CHUNKS) * 5
    idx = start[:, None] + jnp.arange(5)[None, :]
    chunk = jnp.take_along_axis(lsf_bytes30, idx, axis=-1)
    cnt_byte = ((lich_count.astype(jnp.int32) & 0x7) << 5).astype(jnp.uint8)
    lich6 = jnp.concatenate([chunk, cnt_byte[:, None]], axis=-1)   # [B, 6]

    words = bits.bytes_to_u12x4(lich6)                     # [B, 4]
    gw = golay.golay_encode(words)                         # [B, 4] u24
    golay_bits = bits.bytes_to_bits(
        bits.word_to_bytes_device(gw, 3).reshape(b, 12)
    )                                                      # [B, 96]

    fn_bytes = jnp.stack(
        [(fn >> 8).astype(jnp.uint8), (fn & 0xFF).astype(jnp.uint8)], axis=-1
    )
    conv_in = jnp.concatenate([fn_bytes, payload16], axis=-1)      # [B, 18]
    coded = conv.conv_encode_bytes(conv_in)                # [B, 296]
    kept = puncture.puncture(coded, "p2")                  # [B, 272]

    payload_bits = jnp.concatenate([golay_bits, kept], axis=-1)    # [B, 368]
    return _finish_frame(payload_bits, SYNC_WORD_STREAM)


def build_packet_frame(
    payload25: jnp.ndarray, eof: jnp.ndarray, nf: jnp.ndarray
) -> jnp.ndarray:
    """One packet frame -> [B, 192] dibits.

    payload25 [B,25] (callers zero-pad short finals), eof [B] bool,
    nf [B] 5-bit frame number / final-length field.
    Reference: m17_fmt_add_packet (m17_tx_routines.cpp:201-222).
    """
    meta_byte = (
        (eof.astype(jnp.int32) << 7) | ((nf.astype(jnp.int32) & 0x1F) << 2)
    ).astype(jnp.uint8)
    conv_in = jnp.concatenate([payload25, meta_byte[:, None]], axis=-1)  # [B,26]
    coded = conv.conv_encode_bytes(conv_in)                # [B, 420]
    kept = puncture.puncture(coded, "p3")                  # [B, 368]
    return _finish_frame(kept, SYNC_WORD_PACKET)


def build_bert_frame(prbs_start: jnp.ndarray) -> jnp.ndarray:
    """One BERT frame -> [B, 192] dibits; prbs_start [B] is the
    per-channel PRBS9 position (advance by 197 per frame).

    Reference: m17_fmt_add_bert_frame (m17_tx_routines.cpp:226-238),
    including its truncations: 201 input bits encode to 410 coded bits
    of which 402 are punctured (-> 369) and the first 368 transmitted.
    """
    prbs_bits = tx_window(prbs_start, BERT_FRAME_BITS)     # [B, 197]
    tail = jnp.zeros((*prbs_bits.shape[:-1], 4), dtype=jnp.uint8)
    coded = conv.conv_encode_bits(jnp.concatenate([prbs_bits, tail], axis=-1))
    kept = puncture.puncture(coded[..., :402], "p2")       # [B, 369]
    return _finish_frame(kept[..., :368], SYNC_WORD_BERT)


def preamble_frame(batch: int) -> jnp.ndarray:
    """[B, 192] preamble dibits (m17_fmt_add_tx_preamble,
    m17_tx_routines.cpp:24-31)."""
    return jnp.broadcast_to(jnp.asarray(PREAMBLE_DIBITS), (batch, FRAME_SYMBOLS))


def eot_frame(batch: int) -> jnp.ndarray:
    """[B, 192] end-of-transmission dibits (m17_fmt_add_eot,
    m17_tx_routines.cpp:242-255)."""
    return jnp.broadcast_to(jnp.asarray(EOT_DIBITS), (batch, FRAME_SYMBOLS))
