"""Full RX pipeline: planar IQ blocks -> decoded frames + session state.

Ties together the front end (dsp/discriminator), the fused
timing+framer scan (frame/receiver) and the frame decoders
(frame/rx_frames), and keeps the per-channel *session* state the
reference scatters across m17_rx_parse.cpp statics and the shared
database (m17_dbase.cpp): LICH reassembly, the last CRC-valid LSF,
error counters.

Frame-type dispatch is branchless: every extracted frame is decoded by
all type-specific paths and results are selected by mask
(cf. the switch in m17_rx_parse.cpp:185-226) -- on TPU, decoding
3 x B x F short trellises in one batch beats per-type branching.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.discriminator import RxFrontEndState, rx_front_end
from ..dsp.equalize import EqState, equalize_frames
from ..frame import rx_frames
from ..frame.receiver import BlockEvents, ReceiverState, receive_block
from ..spec import crc
from ..spec.constants import (
    FT_BERT,
    FT_LINK,
    FT_PACKET,
    FT_STREAM,
    LICH_CHUNKS,
    LSF_BYTES,
)

# Minimum normalized Viterbi path confidence for voice routing.
# Measured on the parity-harness waveforms (16 ch x 16 frames/SNR):
# correctly decoded frames never fall below 0.912 (5 dB; >= 0.933 from
# 7 dB up), while frames garbled by a mid-frame timing slip -- the
# source of the round-2 high-SNR corruption, BER_PARITY.json 10/12 dB
# -- decode at <= 0.885.  0.9 separates the populations with margin.
# Small-magnitude ML decode errors at <= 8 dB sit INSIDE the clean
# band (0.93-0.97) and are not gated; the reference chain makes the
# same errors at the same SNRs, so parity is unaffected.
STREAM_QUALITY_MIN = 0.9

# FN-continuity window for voice routing (round-4 gate hardening): a
# routed stream frame's FN must lie within this many counts AFTER the
# last routed FN (mod 2^15 -- bit 15 is the M17 EOS convention, masked
# out).  Stress-testing the quality gate beyond its calibration corpus
# (tools/quality_gate.py) found confidently-decoded MISFRAMES under
# combined carrier offset + clock drift: quality 0.90-0.93 with wildly
# discontinuous FNs (e.g. 19340 after 11) or replayed FNs (8 after 13)
# -- every observed false-accept violated continuity while clean
# traffic is strictly sequential modulo drops.  The window allows
# short drop runs; a fresh session (nothing routed since AOS) accepts
# any FN, preserving mid-stream join via LICH reassembly.
STREAM_FN_WINDOW = 16
# sentinel: no routed frame yet.  A PLAIN INT, not jnp.uint32(...): a
# module-level device scalar gets np.asarray()'d by eager consumers
# (RxSessionState.init's jnp.full), and that single device->host
# transfer permanently drops the axon TPU tunnel into its ~300x
# synchronous mode for the whole process (observed round 4: bench
# reps that take 0.6 s ran >10 minutes).
_FN_NONE = np.uint32(0xFFFFFFFF)

# ---- ISI detection for the auto-armed equalizer (VERDICT r4 weak #4:
# uncorrected compressive multipath inflates garbage confidence above
# clean confidence, so no per-frame threshold can gate it -- the fix
# is to DETECT the closed eye and arm the equalizer stage).  The eye
# statistic is the mean distance of each payload symbol's normalized
# magnitude to its nearest nominal 4FSK level {1/3, 1} (demap units,
# m17_dsp.cpp:35-42).  Measured distributions (tools/quality_gate.py
# corpus): clean AWGN 14 dB ~0.05, 7 dB ~0.11-0.13; two-ray ISI that
# defeats the confidence gate >= 0.17.  Hysteresis keeps clean noisy
# channels from flapping: arm above EYE_ARM, disarm below EYE_DISARM,
# one-pole smoothing over blocks with valid frames.
EYE_ARM = 0.155
EYE_DISARM = 0.135
EYE_SMOOTH = 0.5


class RxSessionState(NamedTuple):
    """All per-channel receiver state, checkpointable as one pytree."""

    frontend: RxFrontEndState
    receiver: ReceiverState
    eq: EqState              # adaptive equalizer stage (optional use)
    lich_asm: jnp.ndarray        # [B, 30] LSF being reassembled (m_lsf[0])
    lich_good: jnp.ndarray       # [B, 30] last CRC-valid LSF (m_lsf[1])
    lich_good_valid: jnp.ndarray  # [B] bool
    golay_errors: jnp.ndarray    # [B] i32 running count (m17_dbase.cpp:79)
    n_frames: jnp.ndarray        # [B] i32 frames received
    last_fn: jnp.ndarray         # [B] u32 last stream frame number
    eye_est: jnp.ndarray         # [B] smoothed eye-closure statistic
    eq_armed: jnp.ndarray        # [B] bool: auto equalizer armed

    @staticmethod
    def init(batch: int) -> "RxSessionState":
        return RxSessionState(
            frontend=RxFrontEndState.init(batch),
            receiver=ReceiverState.init(batch),
            eq=EqState.init_identity(batch),
            lich_asm=jnp.zeros((batch, LSF_BYTES), jnp.uint8),
            lich_good=jnp.zeros((batch, LSF_BYTES), jnp.uint8),
            lich_good_valid=jnp.zeros((batch,), bool),
            golay_errors=jnp.zeros((batch,), jnp.int32),
            n_frames=jnp.zeros((batch,), jnp.int32),
            last_fn=jnp.full((batch,), _FN_NONE, jnp.uint32),
            eye_est=jnp.zeros((batch,), jnp.float32),
            eq_armed=jnp.zeros((batch,), bool),
        )


class RxBlockOutput(NamedTuple):
    """Decoded results for one block (F = frame slots per block).

    The masks select which slots carry real data: e.g. voice payloads
    are valid where `stream_valid`, and should only be *routed* where
    `lsf_valid` also holds (the reference's LICH CRC gate,
    m17_rx_parse.cpp:148).
    """

    stream_valid: jnp.ndarray    # [B, F]
    stream_fn: jnp.ndarray       # [B, F]
    stream_payload: jnp.ndarray  # [B, F, 16]
    stream_gate: jnp.ndarray     # [B, F] payload routed (LSF known)
    lsf_valid: jnp.ndarray       # [B, F] an LSF frame decoded w/ good CRC
    lsf_bytes: jnp.ndarray       # [B, F, 30]
    packet_valid: jnp.ndarray    # [B, F]
    packet_data: jnp.ndarray     # [B, F, 25]
    packet_eof: jnp.ndarray      # [B, F]
    packet_fn: jnp.ndarray       # [B, F]
    bert_valid: jnp.ndarray      # [B, F]
    bert_bits: jnp.ndarray       # [B, F, 197]
    # observability (SURVEY.md section 5.5): per-channel metrics tensor
    locked: jnp.ndarray          # [B]
    aos: jnp.ndarray             # [B]
    los: jnp.ndarray             # [B]
    n_slips: jnp.ndarray         # [B]
    golay_errors_blk: jnp.ndarray  # [B] errors in this block
    dc_offset: jnp.ndarray       # [B]
    rssi: jnp.ndarray            # [B] smoothed input level (AGC meter)
    viterbi_metric: jnp.ndarray  # [B, F] decode confidence of used path
    frame_slipped: jnp.ndarray   # [B, F] a timing slip hit this frame
    stream_quality: jnp.ndarray  # [B, F] normalized Viterbi confidence
    # routing-gate attribution (VERDICT r4 weak #3): the gate's three
    # terms exported per slot so rejects decompose into
    # {LICH-unknown, FN-window, quality-threshold} without re-deriving
    # the fold.  stream_gate == stream_valid & lich & fn & quality.
    stream_lich_ok: jnp.ndarray  # [B, F] an LSF was known for routing
    stream_fn_ok: jnp.ndarray    # [B, F] FN-continuity window passed


@functools.partial(
    jax.jit, static_argnames=("afc_enabled", "equalize", "use_pallas"))
def rx_block(
    iq: jnp.ndarray,
    state: RxSessionState,
    afc_enabled: bool = False,
    equalize: bool = False,
    use_pallas: bool = False,
) -> tuple[RxBlockOutput, RxSessionState]:
    """Process one [B, 2, T] planar IQ block (T % 5 == 0).

    Mirrors the chain radio_receive_samples -> m17_dsp_rx -> ... ->
    m17_rx_parse (SURVEY.md section 3.2) for B channels at once.
    `equalize` inserts the adaptive Kalman equalizer stage on the
    2-samples/symbol stream (the reference's dormant m17_equalize.cpp
    made live), adapting decision-directed while locked.
    """
    # front end: AFC gated by framer lock, like m17_db_in_frame()
    soft2x, dc_offset, fe_state = rx_front_end(
        iq, state.frontend, in_frame=state.receiver.flock,
        afc_enabled=afc_enabled,
    )
    return _decode_soft(soft2x, dc_offset, fe_state, state,
                        equalize=equalize, use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("equalize",))
def rx_block_soft(
    soft2x: jnp.ndarray,
    state: RxSessionState,
    equalize: bool = False,
) -> tuple[RxBlockOutput, RxSessionState]:
    """Process one [B, S2] block of 2-samples/symbol soft samples,
    bypassing the analog front end -- the radio-free entry the
    reference gates behind __TEST__ (m17_test.cpp:42-52 feeds
    m17_rx_sync_samples directly).  Used by the BER-parity harness so
    both chains decode IDENTICAL waveforms."""
    dc = jnp.zeros(soft2x.shape[0], jnp.float32)
    return _decode_soft(soft2x, dc, state.frontend, state,
                        equalize=equalize)


def _decode_soft(
    soft2x: jnp.ndarray,
    dc_offset: jnp.ndarray,
    fe_state: RxFrontEndState,
    state: RxSessionState,
    equalize: bool = False,
    use_pallas: bool = False,
) -> tuple[RxBlockOutput, RxSessionState]:
    """Timing/framer scan + typed frame decode + session-state update
    (everything in m17_dsp_rx after the discriminator)."""
    b = soft2x.shape[0]

    events, rx_state = receive_block(soft2x, state.receiver,
                                     use_pallas=use_pallas)
    f = events.frames.shape[1]

    # ---- optional adaptive equalizer on the timing-recovered frame
    # symbols (the reference's dormant m17_equalize.cpp made live as a
    # per-frame block-least-squares stage; see dsp/equalize.py).
    # equalize: False/"off", True/"on", or "auto" -- auto DETECTS a
    # closed eye per channel (see EYE_ARM) and applies/adapts the
    # stage only on armed channels, so clean channels keep the exact
    # unequalized decode path while compressive ISI (which defeats the
    # confidence gate, VERDICT r4 weak #4) gets corrected instead of
    # confidently misdecoded. ----
    eq_c = state.eq.c
    frames_sym = events.frames
    valid_f = events.frame_valid & events.frame_parse            # [B, F]
    eye_est = state.eye_est
    eq_armed = state.eq_armed
    if equalize in (True, "on"):
        frames_sym, eq_c = equalize_frames(
            frames_sym, eq_c, update=valid_f)
    elif equalize == "auto":
        # eye-closure statistic from the RAW (pre-eq) symbols, in
        # demap-normalized units (sync -> +-1, payload -> +-1/3, +-1)
        sync_mag = jnp.mean(jnp.abs(frames_sym[..., :8]), axis=-1)
        cor = 1.0 / jnp.maximum(sync_mag, 1e-9)
        mag = jnp.abs(frames_sym[..., 8:]) * cor[..., None]
        disp = jnp.minimum(jnp.abs(mag - 1.0 / 3.0), jnp.abs(mag - 1.0))
        d_frame = jnp.mean(disp, axis=-1)                        # [B, F]
        # SIGNAL-GATED frames only: the framer's 5-error parse budget
        # lets it ride several junk "frames" after a session ends, and
        # those noise-locked frames look exactly like heavy ISI at the
        # symbol level (closed eye, smeared sync) -- but they carry no
        # signal.  Raw symbol level separates them cleanly (measured:
        # silence junk ~0.03, real frames >= 0.31, ISI >= 0.43), the
        # same squelch physics as the RSSI gate.  Without this, one
        # junk frame arms a clean channel and the equalizer adapting
        # on junk can corrupt it into STAYING armed (observed).
        lvl = jnp.mean(jnp.abs(frames_sym), axis=-1)             # [B, F]
        sig_f = valid_f & (lvl > 0.15)
        nsig = jnp.sum(sig_f, axis=-1)
        d_mean = jnp.sum(jnp.where(sig_f, d_frame, 0.0), axis=-1) \
            / jnp.maximum(nsig, 1)
        eye_est = jnp.where(
            nsig > 0,
            jnp.where(state.eye_est > 0.0,
                      EYE_SMOOTH * state.eye_est
                      + (1.0 - EYE_SMOOTH) * d_mean,
                      d_mean),
            state.eye_est)
        # ARM on the instantaneous worst signal-bearing frame (ISI
        # onset can be a few frames wide -- mobile fade-in -- and
        # every block of detection latency is a block of confidently-
        # garbled voice); DISARM only on the smoothed estimate, so a
        # single good frame doesn't drop a converged equalizer
        # mid-fade.
        d_now = jnp.max(jnp.where(sig_f, d_frame, 0.0), axis=-1)
        eq_armed = jnp.where(jnp.maximum(eye_est, d_now) > EYE_ARM, True,
                             jnp.where(eye_est < EYE_DISARM, False,
                                       state.eq_armed))
        # run the stage only when SOME channel is armed (lax.cond is a
        # real branch under jit): on clean channels auto therefore
        # costs only the eye statistic -- a few reductions -- so the
        # shipping default adds ~nothing to the unimpaired hot path
        def with_eq(ops):
            fr, c = ops
            out, c2 = equalize_frames(
                fr, c, update=valid_f & eq_armed[:, None])
            return jnp.where(eq_armed[:, None, None], out, fr), c2

        frames_sym, eq_c = jax.lax.cond(
            jnp.any(eq_armed), with_eq, lambda ops: ops,
            (frames_sym, eq_c))
    eq_state = state.eq._replace(c=eq_c)

    # ---- decode every frame slot through every typed path ----
    soft = rx_frames.demap_frame(frames_sym.reshape(b * f, -1))

    lsf = rx_frames.decode_lsf(soft)
    stream = rx_frames.decode_stream(soft)
    packet = rx_frames.decode_packet(soft)
    bert = rx_frames.decode_bert(soft)

    use = events.frame_valid & events.frame_parse            # [B, F]
    is_lsf = use & (events.frame_type == FT_LINK)
    is_stream = use & (events.frame_type == FT_STREAM)
    is_packet = use & (events.frame_type == FT_PACKET)
    is_bert = use & (events.frame_type == FT_BERT)

    lsf_ok = is_lsf & lsf.crc_ok.reshape(b, f)

    # ---- LICH reassembly from stream frames (update_lich,
    # m17_rx_parse.cpp:71-85) over the F slots in order.  The slot loop
    # only chains the cheap [B, 30] masked writes; the expensive part
    # -- the CRC of the assembly state after each slot -- is ONE
    # batched [B, F, 30] crc16_fixed matmul instead of F sequential
    # ones (the F-chained CRCs were ~20% of the whole rx_block device
    # time; PROFILE_r4.json round-4 attribution).
    lich_good = state.lich_good
    lich_good_valid = state.lich_good_valid
    chunk = stream.lich_chunk.reshape(b, f, 5)
    seq = stream.lich_seq.reshape(b, f)
    lsf_frame_bytes = lsf.lsf_bytes.reshape(b, f, LSF_BYTES)

    upd = is_stream & (seq < LICH_CHUNKS)                       # [B, F]
    pos = (seq * 5)[..., None]                                  # [B, F, 1]
    col = jnp.arange(LSF_BYTES)[None, None, :]                  # [1, 1, 30]
    write = upd[..., None] & (col >= pos) & (col < pos + 5)     # [B, F, 30]
    src = jnp.take_along_axis(chunk, jnp.clip(col - pos, 0, 4), axis=-1)

    asm = state.lich_asm
    asm_states = []
    for i in range(f):
        asm = jnp.where(write[:, i], src[:, i], asm)
        asm_states.append(asm)
    lich_asm = asm
    asm_stack = jnp.stack(asm_states, axis=1)                   # [B, F, 30]
    asm_ok = upd & (crc.crc16_fixed(asm_stack) == 0)            # [B, F]

    # a CRC-valid full LSF frame also refreshes the good copy
    # (parse_lsf from decode_link_frame, m17_rx_parse.cpp:99); fold the
    # slots in order so the last good slot wins, like the scalar loop
    take = asm_ok | lsf_ok                                      # [B, F]
    good_src = jnp.where(lsf_ok[..., None], lsf_frame_bytes, asm_stack)
    for i in range(f):
        lich_good = jnp.where(take[:, i, None], good_src[:, i], lich_good)
    lich_good_valid = lich_good_valid | jnp.any(take, axis=-1)

    # voice routing gate: only pass payload when an LSF is known
    # (m17_rx_parse.cpp:148) AND the frame's symbols are trustworthy.
    # M17 stream payloads carry no CRC, so a frame garbled by a
    # mid-frame timing slip would otherwise be delivered as valid
    # voice (the reference does exactly that and relies on the vocoder
    # shrugging it off).  The gate thresholds the normalized Viterbi
    # confidence (see rx_frames.decode_stream); the raw frame_slipped
    # flag is exported for observability but NOT used here -- most
    # flagged slips are insert/delete pairs that cancel within a few
    # samples and decode clean (measured: 42 of 103 delivered frames
    # at 7 dB carry a benign slip), while every frame a slip actually
    # garbled also fails the quality threshold.
    quality = stream.quality.reshape(b, f)
    quality_ok = quality > STREAM_QUALITY_MIN

    # FN-continuity term (see STREAM_FN_WINDOW): fold the slots in
    # order, routing a frame only if its FN advances 1..WINDOW past
    # the anchor (or nothing was anchored this session).  EVERY
    # quality-passing frame re-anchors -- routed or not -- so a lone
    # misframe costs at most the one clean frame after it and a
    # garbage anchor self-heals instead of derailing the stream.
    fn_all = stream.fn.reshape(b, f)
    last_fn = jnp.where(events.aos, _FN_NONE, state.last_fn)
    fn_ok_cols = []
    for i in range(f):
        delta = (fn_all[:, i] - last_fn) & 0x7FFF
        fresh = last_fn == _FN_NONE
        ok_i = fresh | ((delta >= 1) & (delta <= STREAM_FN_WINDOW))
        fn_ok_cols.append(ok_i)
        anchor_i = is_stream[:, i] & quality_ok[:, i]
        last_fn = jnp.where(anchor_i, fn_all[:, i], last_fn)
    fn_ok = jnp.stack(fn_ok_cols, axis=1)

    stream_gate = (is_stream & lich_good_valid[:, None]
                   & quality_ok & fn_ok)

    golay_blk = jnp.sum(
        jnp.where(is_stream, stream.golay_errors.reshape(b, f), 0), axis=-1
    )

    metric = jnp.where(
        is_lsf, lsf.metric.reshape(b, f),
        jnp.where(is_packet, packet.metric.reshape(b, f),
                  jnp.where(is_bert, bert.metric.reshape(b, f),
                            stream.metric.reshape(b, f))))

    # AOS resets the per-session counters (m17_aos, m17_dbase.cpp:60-75)
    golay_total = jnp.where(events.aos, 0, state.golay_errors) + golay_blk
    n_frames = jnp.where(events.aos, 0, state.n_frames) + jnp.sum(use, axis=-1)

    out = RxBlockOutput(
        stream_valid=is_stream,
        stream_fn=stream.fn.reshape(b, f),
        stream_payload=stream.payload.reshape(b, f, 16),
        stream_gate=stream_gate,
        lsf_valid=lsf_ok,
        lsf_bytes=lsf_frame_bytes,
        packet_valid=is_packet,
        packet_data=packet.data.reshape(b, f, 25),
        packet_eof=packet.eof.reshape(b, f),
        packet_fn=packet.fn.reshape(b, f),
        bert_valid=is_bert,
        bert_bits=bert.bits.reshape(b, f, -1),
        locked=events.locked,
        aos=events.aos,
        los=events.los,
        n_slips=events.n_slips,
        golay_errors_blk=golay_blk,
        dc_offset=dc_offset,
        rssi=fe_state.rssi,
        viterbi_metric=metric,
        frame_slipped=events.frame_slipped,
        stream_quality=quality,
        stream_lich_ok=jnp.broadcast_to(lich_good_valid[:, None], (b, f)),
        stream_fn_ok=fn_ok,
    )
    new_state = RxSessionState(
        frontend=fe_state,
        receiver=rx_state,
        eq=eq_state,
        lich_asm=lich_asm,
        lich_good=lich_good,
        lich_good_valid=lich_good_valid,
        golay_errors=golay_total,
        n_frames=n_frames,
        last_fn=last_fn,
        eye_est=eye_est,
        eq_armed=eq_armed,
    )
    return out, new_state


@functools.partial(
    jax.jit, static_argnames=("afc_enabled", "equalize", "use_pallas"))
def rx_stream(
    iq_blocks: jnp.ndarray,
    state: RxSessionState,
    afc_enabled: bool = False,
    equalize: bool = False,
    use_pallas: bool = False,
) -> tuple[RxBlockOutput, RxSessionState]:
    """Scan rx_block over [B, NBLK, 2, T] -> outputs stacked on axis 1."""

    def step(st, blk):
        out, st = rx_block(blk, st, afc_enabled=afc_enabled,
                           equalize=equalize, use_pallas=use_pallas)
        return st, out

    state, outs = jax.lax.scan(step, state, jnp.moveaxis(iq_blocks, 1, 0))
    outs = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), outs)
    return outs, state


@functools.partial(jax.jit, static_argnames=("equalize",))
def rx_stream_soft(
    soft_blocks: jnp.ndarray,
    state: RxSessionState,
    equalize: bool = False,
) -> tuple[RxBlockOutput, RxSessionState]:
    """Scan rx_block_soft over [B, NBLK, S2] 2-samples/symbol blocks."""

    def step(st, blk):
        out, st = rx_block_soft(blk, st, equalize=equalize)
        return st, out

    state, outs = jax.lax.scan(step, state, jnp.moveaxis(soft_blocks, 1, 0))
    outs = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), outs)
    return outs, state
