"""Fused timing-recovery + framer scan as a Pallas TPU kernel.

The XLA formulation (frame/receiver.py) hoists the 40-phase matched
filter out of the scan as one big conv, then streams the [B, 80, S2]
per-phase outputs back through the scan body -- ~125 MB of HBM traffic
per 4096-channel block, which is the measured wall (~134 us/block =
the HBM roof for that traffic; BASELINE.md round-2 settlement).

This kernel keeps everything in VMEM and computes ONLY the selected
phase per step:

  * the per-channel taps row (mf + derivative bank at the channel's
    current polyphase index) lives in VMEM scratch and is refreshed
    ONLY on steps where some channel's index moved, via per-sublane-row
    one-hot MATMULS on the MXU (see refresh_taps) -- cheap enough that
    acquisition-heavy content no longer pays a taps-refresh storm, so
    the steady-state per-step work is the 62-MAC dot product the
    algorithm actually requires instead of the 40x-redundant bank;
  * the sync-window correlation runs only on steps where some channel
    can consume it (hunting, or within the resync window around the
    frame boundary) -- a few % of steps once locked;
  * per-step outputs are written as one f32 plane (symbol slot) plus
    one bit-packed int32 plane (valid/done/parse/aos/los/slip + type),
    cutting output traffic ~4x vs the scan's 8 stacked ys.

Channel batch is tiled by 1024 (8 sublanes x 128 lanes) over the grid;
B must be a multiple of 1024 (the XLA path remains the general
fallback and the reference semantics; bit-for-bit step parity with it
is asserted in tests/test_receiver_pallas.py).

Reference behavior: m17_rx_sync.cpp:77-99 (timing loop) +
m17_rx_frame.cpp:126-172 (framer), with the round-2 in-lock resync on
top (see frame/receiver.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.constants import (
    FRAME_SYMBOLS,
    FT_EOT,
    MAX_FRAME_ERRORS,
    SYNC_PATTERNS,
    SYNC_SYMBOLS,
    TIMING_FILTER_TAPS,
    TIMING_NUM_PHASES,
    TIMING_THRESH_LOCKED,
    TIMING_THRESH_UNLOCKED,
)
from .sync import (
    LOCKED_MAX_VARIANCE,
    LOCKED_MAX_VOTES,
    UNLOCKED_MAX_VARIANCE,
    UNLOCKED_MAX_VOTES,
)

TILE_CH = 1024                  # channels per grid step (8 x 128)
NR = TILE_CH // 128             # sublane rows per plane

# flags plane bit layout
F_VALID, F_DONE, F_PARSE, F_AOS, F_LOS, F_SLIP = 1, 2, 4, 8, 16, 32
F_SLIPFRAME = 64            # in-progress frame was hit by a timing slip
F_TYPE_SHIFT = 8


def _kernel(ext_ref, comb_ref, pats_ref,
            clk_ref, thr_ref, index_ref, fclk_ref, ferr_ref, stype_ref,
            msum_ref, mdif_ref, pend_ref, pvalid_ref, flock_ref,
            spass_ref, slipf_ref, swin_ref,
            # outputs
            slot_ref, flags_ref,
            oclk_ref, othr_ref, oindex_ref, ofclk_ref, oferr_ref,
            ostype_ref, omsum_ref, omdif_ref, opend_ref, opvalid_ref,
            oflock_ref, ospass_ref, oslipf_ref, oswin_ref,
            # scratch
            tsel_ref, dtsel_ref, sc_type_ref, sc_lok_ref, sc_uok_ref,
            evt_ref, dirty_ref):
    n_pairs = slot_ref.shape[0]      # outputs are pair-packed

    def refresh_taps(index, flip):
        """Per-channel taps rows gathered from the 40-phase bank, with
        the lane's clk PARITY baked in as a one-tap shift.

        Gather-by-matmul (round-3 design): per 128-lane sublane row, a
        (40, 128) one-hot built by an iota compare selects both banks'
        taps at once as ONE (62, 40) @ (40, 128) MXU matmul (a gather
        in disguise -- each output column sums one tap value).

        New in round 4: the pair body evaluates the matched filter
        once per step-PAIR over a 32-sample window ext[t .. t+31], at
        each lane's clk step.  A parity-flipped lane (clk at the
        pair's first step) needs taps aligned at k, a standard lane
        (clk at the second step) at k-1 -- so each refreshed row is
        zero-padded to 32 taps with the lane's shift baked in HERE,
        once per refresh, instead of a per-lane window select every
        pair (31 selects/pair saved).  Parity changes only on bit-slip
        wraps, which change `index` too, so every flip is already a
        refresh trigger.

        Precision: the MXU's default f32 path rounds operands to
        bf16; the selected taps therefore carry ~2^-8 relative
        rounding.  That is the same truncation the XLA formulation
        applies to its hoisted conv (receiver.py casts BOTH operands
        to bf16), and parity with it is asserted at frame level, not
        float level (tests/test_receiver_pallas.py docstring).
        """
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (TIMING_NUM_PHASES, 128), 0)
        nt = TIMING_FILTER_TAPS
        z1 = jnp.zeros((1, 128), jnp.float32)
        for r in range(NR):
            oh = (iota == index[r:r + 1, :]).astype(jnp.float32)
            sel = jnp.dot(comb_ref[...], oh,
                          preferred_element_type=jnp.float32)
            # lax.slice + reshape, NOT sel[:nt, None, :]: jnp's
            # mixed slice/None indexing lowers via gather, which
            # Mosaic rejects here
            top = jax.lax.slice_in_dim(sel, 0, nt, axis=0)
            bot = jax.lax.slice_in_dim(sel, nt, 2 * nt, axis=0)
            fl = flip[r:r + 1, :] != 0
            t32 = jnp.where(fl, jnp.concatenate([top, z1], axis=0),
                            jnp.concatenate([z1, top], axis=0))
            b32 = jnp.where(fl, jnp.concatenate([bot, z1], axis=0),
                            jnp.concatenate([z1, bot], axis=0))
            tsel_ref[:, r:r + 1, :] = t32.reshape(nt + 1, 1, 128)
            dtsel_ref[:, r:r + 1, :] = b32.reshape(nt + 1, 1, 128)

    # initial taps for the carried indices, at the parity of step 0
    # (a lane is "flipped" when its clk step is the pair's FIRST step)
    refresh_taps(index_ref[...], ((clk_ref[...] + 1) & 1))
    dirty_ref[...] = jnp.zeros((NR, 128), jnp.int32)
    # copy carried state into the output refs, which act as the live
    # registers for the loop (in-place update pattern)
    oclk_ref[...] = clk_ref[...]
    othr_ref[...] = thr_ref[...]
    oindex_ref[...] = index_ref[...]
    ofclk_ref[...] = fclk_ref[...]
    oferr_ref[...] = ferr_ref[...]
    ostype_ref[...] = stype_ref[...]
    omsum_ref[...] = msum_ref[...]
    omdif_ref[...] = mdif_ref[...]
    opend_ref[...] = pend_ref[...]
    opvalid_ref[...] = pvalid_ref[...]
    oflock_ref[...] = flock_ref[...]
    ospass_ref[...] = spass_ref[...]
    oslipf_ref[...] = slipf_ref[...]
    oswin_ref[...] = swin_ref[...]

    def timing_substep(mf_sum, mf_dif):
        """One timing-loop control step (vote/index walk/bit-slip) on
        the live refs (sync_update + the walk, m17_rx_sync.cpp:38-72).

        `mf_sum`/`mf_dif` are the MF values the step's vote sees: the
        off-phase vote uses the HELD values from the channel's last
        symbol step, so no new filter work happens here.  Returns
        (is_clk, fwd_wrap, bwd_wrap, moved) masks.
        """
        clk = (oclk_ref[...] + 1) & 1
        is_clk = clk == 1
        dif_signed = jnp.where(mf_sum < 0, -mf_dif, mf_dif)
        vote = jnp.sign(dif_signed).astype(jnp.int32)
        thr = jnp.where(is_clk, othr_ref[...], othr_ref[...] + vote)

        flock = oflock_ref[...] != 0
        thresh = jnp.where(flock, TIMING_THRESH_LOCKED,
                           TIMING_THRESH_UNLOCKED)
        fwd = (~is_clk) & (thr > thresh)
        bwd = (~is_clk) & (thr < -thresh)
        index0 = oindex_ref[...]
        idx_up = jnp.where(index0 + 1 >= TIMING_NUM_PHASES, 0, index0 + 1)
        index = jnp.where(fwd, idx_up, index0)
        idx_dn = jnp.where(index - 1 < 0, TIMING_NUM_PHASES - 1, index - 1)
        index = jnp.where(bwd, idx_dn, index)
        thr = jnp.where(fwd | bwd, 0, thr)
        fwd_wrap = fwd & (index == 0)
        bwd_wrap = bwd & (index == TIMING_NUM_PHASES - 1)
        clk = jnp.where(fwd_wrap | bwd_wrap, 1, clk)
        oclk_ref[...] = clk
        othr_ref[...] = thr
        oindex_ref[...] = index
        return is_clk, fwd_wrap, bwd_wrap, index != index0

    # framer event bits; the GATED pass A reports through evt_ref
    # (pl.when bodies cannot return values), pass B returns directly
    E_DONE, E_PARSE, E_AOS, E_LOS, E_RESYNC = 1, 2, 4, 8, 16

    def framer_pass(v, consumed):
        """Framer consumption of one (value, consumed-mask) slot
        (m17_rx_sym, m17_rx_frame.cpp:126-172 + in-lock resync).

        Mutates the framer refs for consuming lanes and returns the
        pass's event masks (done/parse/aos/los/resync).  Slip-in-frame
        bookkeeping lives OUTSIDE (the pair body), because slips
        happen on non-consuming steps too.
        """
        flock = oflock_ref[...] != 0

        for i in range(SYNC_SYMBOLS - 1):
            oswin_ref[i] = jnp.where(consumed, oswin_ref[i + 1],
                                     oswin_ref[i])
        oswin_ref[SYNC_SYMBOLS - 1] = jnp.where(
            consumed, v, oswin_ref[SYNC_SYMBOLS - 1])

        fclk = jnp.where(consumed & flock, ofclk_ref[...] + 1,
                         ofclk_ref[...])

        # sync correlation only when some channel can consume it
        need_sync = consumed & (
            (~flock) | ((fclk >= SYNC_SYMBOLS - 2)
                        & (fclk <= SYNC_SYMBOLS + 2)))

        @pl.when(jnp.sum(need_sync.astype(jnp.int32)) > 0)
        def _():
            win = [oswin_ref[i] for i in range(SYNC_SYMBOLS)]
            sums = []
            agree = []
            s = [jnp.sign(w) for w in win]
            for p in range(6):
                acc = jnp.zeros((NR, 128), jnp.float32)
                sacc = jnp.zeros((NR, 128), jnp.float32)
                for i in range(SYNC_SYMBOLS):
                    acc = acc + win[i] * pats_ref[p, i]
                    sacc = sacc + s[i] * pats_ref[p, i]
                sums.append(acc)
                agree.append(sacc)
            best = jnp.zeros((NR, 128), jnp.int32)
            bmax = sums[0]
            for p in range(1, 6):
                take = sums[p] > bmax
                bmax = jnp.where(take, sums[p], bmax)
                best = jnp.where(take, p, best)
            ftype = jnp.where(bmax > 0, best, 0)
            nnz = jnp.zeros((NR, 128), jnp.float32)
            for i in range(SYNC_SYMBOLS):
                nnz = nnz + jnp.abs(s[i])
            agree_best = jnp.zeros((NR, 128), jnp.float32)
            for p in range(6):
                agree_best = jnp.where(ftype == p, agree[p], agree_best)
            votes = ((nnz - agree_best) * 0.5).astype(jnp.int32)
            mags = [jnp.abs(w) for w in win]
            mmax = mags[0]
            mmin = mags[0]
            for i in range(1, SYNC_SYMBOLS):
                mmax = jnp.maximum(mmax, mags[i])
                mmin = jnp.minimum(mmin, mags[i])
            variance = jnp.where(
                mmax > 0, (mmax - mmin) / jnp.maximum(mmax, 1e-30), 1.0)
            is_payload = (ftype >= 1) & (ftype <= 4)
            sc_type_ref[...] = ftype
            sc_lok_ref[...] = ((votes <= LOCKED_MAX_VOTES) & is_payload
                               & (variance < LOCKED_MAX_VARIANCE)
                               ).astype(jnp.int32)
            sc_uok_ref[...] = ((votes <= UNLOCKED_MAX_VOTES) & is_payload
                               & (variance < UNLOCKED_MAX_VARIANCE)
                               ).astype(jnp.int32)

        sc_type = sc_type_ref[...]
        sc_lok = sc_lok_ref[...] != 0
        sc_uok = sc_uok_ref[...] != 0

        at8 = consumed & flock & (fclk == SYNC_SYMBOLS)
        sync_type = jnp.where(at8, sc_type, ostype_ref[...])
        spass0 = ospass_ref[...] != 0
        sync_pass = (at8 & sc_lok) | (~at8 & spass0)

        resync = (consumed & flock & sc_uok & ~at8
                  & (fclk >= SYNC_SYMBOLS - 2) & (fclk <= SYNC_SYMBOLS + 2))
        fclk = jnp.where(resync, SYNC_SYMBOLS, fclk)
        sync_type = jnp.where(resync, sc_type, sync_type)
        sync_pass = sync_pass | resync

        frame_done = consumed & flock & (fclk == FRAME_SYMBOLS)
        fclk = jnp.where(frame_done, 0, fclk)

        is_eot = frame_done & (sync_type == FT_EOT)
        good = frame_done & sync_pass & ~is_eot
        bad = frame_done & ~sync_pass & ~is_eot
        ferr = jnp.where(good | resync, 0,
                         jnp.where(bad, oferr_ref[...] + 1, oferr_ref[...]))
        too_many = bad & (ferr > MAX_FRAME_ERRORS)
        los = is_eot | too_many
        parse = good | (bad & ~too_many)

        hunting = consumed & ~flock
        aos = hunting & sc_uok

        flock2 = (flock | aos) & ~los
        fclk = jnp.where(aos, SYNC_SYMBOLS, fclk)
        ferr = jnp.where(aos, 0, ferr)
        sync_type = jnp.where(aos, sc_type, sync_type)
        sync_pass = sync_pass | aos
        for i in range(SYNC_SYMBOLS):
            oswin_ref[i] = jnp.where(los, 0.0, oswin_ref[i])

        ofclk_ref[...] = fclk
        oferr_ref[...] = ferr
        ostype_ref[...] = sync_type
        ospass_ref[...] = sync_pass.astype(jnp.int32)
        oflock_ref[...] = flock2.astype(jnp.int32)
        return frame_done, parse, aos, los, resync

    def pair(i, _):
        """Two input steps (A = 2i, B = 2i+1) fused into one body.

        Key invariants exploited (vs the round-3 one-step body):
          * the off-phase vote uses HELD MF values (m17_rx_sync.cpp:
            38-42 reads the previous symbol's sum/dif), so only each
            lane's CLK step needs the 62-MAC filter dot -- computed
            ONCE per pair with a per-lane window select (a lane's clk
            parity is even/odd depending on its bit-slip history);
          * index walks happen on off-phase steps only, so a standard-
            parity lane (clk at B) cannot invalidate the pair's taps
            between A and B; parity-flipped lanes cannot move at A.
            The A-refresh before the MF keeps both cases exact;
          * framer passes are GATED: pass A fires only when some lane
            consumed a symbol at A (parity-flipped or slip-emitting
            lanes exist), pass B when some lane consumed at B.  In the
            common all-standard-parity regime that is ONE framer pass
            per pair instead of two.
        Step-exact parity with the XLA scan is asserted per block in
        tests/test_receiver_pallas.py.
        """
        t = 2 * i
        held_sum = omsum_ref[...]
        held_dif = omdif_ref[...]

        # --- step A timing control (vote uses held MF)
        is_clk_a, fwdw_a, bwdw_a, moved_a = timing_substep(
            held_sum, held_dif)

        # --- taps refresh: ONE gate per pair covering index moves at
        # this pair's A step plus everything since the last refresh
        # (the dirty plane carries B-step moves forward -- B moves
        # cannot affect this pair's MF, only the next one's)
        need = dirty_ref[...] | moved_a.astype(jnp.int32)

        @pl.when(jnp.sum(need) > 0)
        def _():
            refresh_taps(oindex_ref[...], is_clk_a.astype(jnp.int32))
            # a lane that WRAPPED at A flips parity starting at B: this
            # refresh baked its pre-flip shift (fine -- a wrapped lane
            # has no clk step this pair, its MF is unused), but the
            # NEXT pair must re-bake it with the flipped parity.  (A
            # wrap IS an index move, so wraps at A always land in this
            # branch -- `need` cannot be zero when one exists.)
            dirty_ref[...] = (fwdw_a | bwdw_a).astype(jnp.int32)

        # --- the pair's ONE matched-filter evaluation, at each lane's
        # clk step: the refreshed 32-tap rows carry each lane's parity
        # shift, so the window is simply ext[t .. t+31] for all lanes
        new_sum = jnp.zeros((NR, 128), jnp.float32)
        new_dif = jnp.zeros((NR, 128), jnp.float32)
        for k in range(TIMING_FILTER_TAPS + 1):
            x = ext_ref[t + k]
            new_sum = new_sum + x * tsel_ref[k]
            new_dif = new_dif + x * dtsel_ref[k]
        mfa_sum = jnp.where(is_clk_a, new_sum, held_sum)
        mfa_dif = jnp.where(is_clk_a, new_dif, held_dif)

        # --- step A emission
        pend0 = opend_ref[...]
        pvalid0 = opvalid_ref[...] != 0
        emit_a = is_clk_a | fwdw_a
        slot_a = jnp.where(emit_a, pend0, 0.0)
        valid_a = emit_a & pvalid0
        pend1 = jnp.where(is_clk_a, new_sum, pend0)
        pend1 = jnp.where(fwdw_a, 0.0, pend1)
        pvalid1 = (pvalid0 | is_clk_a | fwdw_a) & ~bwdw_a

        flock0 = oflock_ref[...] != 0
        oslipf0 = oslipf_ref[...] != 0
        evt_ref[...] = jnp.zeros((NR, 128), jnp.int32)

        # --- framer pass A: only when some lane consumed at A
        # (parity-flipped lanes exist, or a slip emitted early)
        @pl.when(jnp.sum(valid_a.astype(jnp.int32)) > 0)
        def _():
            fd, pr, ao, lo, rs = framer_pass(slot_a, valid_a)
            evt_ref[...] = (fd.astype(jnp.int32) * E_DONE
                            + pr.astype(jnp.int32) * E_PARSE
                            + ao.astype(jnp.int32) * E_AOS
                            + lo.astype(jnp.int32) * E_LOS
                            + rs.astype(jnp.int32) * E_RESYNC)

        stype_a = ostype_ref[...]

        # --- step B timing control; B's thresh sees pass A's lock
        # updates, and a flipped lane's off-phase vote sees the MF
        # computed at its clk step A
        is_clk_b, fwdw_b, bwdw_b, moved_b = timing_substep(
            mfa_sum, mfa_dif)
        dirty_ref[...] = dirty_ref[...] | moved_b.astype(jnp.int32)

        omsum_ref[...] = jnp.where(is_clk_b, new_sum, mfa_sum)
        omdif_ref[...] = jnp.where(is_clk_b, new_dif, mfa_dif)

        # --- step B emission
        emit_b = is_clk_b | fwdw_b
        slot_b = jnp.where(emit_b, pend1, 0.0)
        valid_b = emit_b & pvalid1
        pend2 = jnp.where(is_clk_b, new_sum, pend1)
        pend2 = jnp.where(fwdw_b, 0.0, pend2)
        pvalid2 = (pvalid1 | is_clk_b | fwdw_b) & ~bwdw_b
        opend_ref[...] = pend2
        opvalid_ref[...] = pvalid2.astype(jnp.int32)

        flock_mid = oflock_ref[...] != 0    # after pass A

        # --- framer pass B: ungated -- standard-parity lanes consume
        # at B nearly every pair, so the any-reduce would fire anyway
        eb_done, eb_parse, eb_aos, eb_los, eb_rs = framer_pass(
            slot_b, valid_b)

        evt = evt_ref[...]
        ea_done = (evt & E_DONE) != 0
        ea_parse = (evt & E_PARSE) != 0
        ea_aos = (evt & E_AOS) != 0
        ea_los = (evt & E_LOS) != 0
        ea_rs = (evt & E_RESYNC) != 0

        # --- slip-in-frame bookkeeping, sequenced A then B (mirrors
        # receiver.py's per-step `slipped`; runs even on steps where
        # nothing was consumed, which is why it lives outside the
        # gated framer passes)
        slipped_a = (oslipf0 | fwdw_a | bwdw_a) & flock0 & ~ea_rs
        oslipf1 = slipped_a & ~ea_done & ~ea_aos
        slipped_b = (oslipf1 | fwdw_b | bwdw_b) & flock_mid & ~eb_rs
        oslipf_ref[...] = (slipped_b & ~eb_done & ~eb_aos).astype(jnp.int32)

        # --- pair-packed outputs: per pair ONE i32 slot plane (the two
        # steps' soft symbols as x1024 fixed-point int16, |err| <=
        # 2^-11 absolute on +-4-ranged MF outputs) and ONE i32 flags
        # plane (the two steps' 11-bit flag words in the low/high
        # halves) -- halves the kernel's output traffic AND the
        # XLA-side transpose volume vs per-step f32+i32 planes
        i32 = lambda m: m.astype(jnp.int32)  # noqa: E731
        qa = jnp.clip(jnp.round(slot_a * 1024.0), -32767.0,
                      32767.0).astype(jnp.int32)
        qb = jnp.clip(jnp.round(slot_b * 1024.0), -32767.0,
                      32767.0).astype(jnp.int32)
        slot_ref[i] = (qa & 0xFFFF) | (qb << 16)
        fa_word = (
            i32(valid_a) * F_VALID + i32(ea_done) * F_DONE
            + i32(ea_parse) * F_PARSE + i32(ea_aos) * F_AOS
            + i32(ea_los) * F_LOS + i32(fwdw_a | bwdw_a) * F_SLIP
            + i32(slipped_a) * F_SLIPFRAME + stype_a * 256)
        fb_word = (
            i32(valid_b) * F_VALID + i32(eb_done) * F_DONE
            + i32(eb_parse) * F_PARSE + i32(eb_aos) * F_AOS
            + i32(eb_los) * F_LOS + i32(fwdw_b | bwdw_b) * F_SLIP
            + i32(slipped_b) * F_SLIPFRAME + ostype_ref[...] * 256)
        flags_ref[i] = fa_word | (fb_word << 16)
        return 0

    jax.lax.fori_loop(0, n_pairs, pair, 0)


def _plane_spec(i32=False):
    return pl.BlockSpec((NR, 128), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def receiver_scan_pallas(ext, state, interpret: bool = False):
    """Run the fused timing+framer scan over one block.

    ext: [B, S2 + 30] soft samples (the MF window history prepended,
    exactly like receive_block's `ext`).  state: ReceiverState.
    Returns (slot_val [B,S2], flags [B,S2] int32, new ReceiverState
    minus window/sym_hist which the caller maintains).
    """
    from .receiver import _MF_BANK, _DMF_BANK

    b, ext_len = ext.shape
    s2 = ext_len - (TIMING_FILTER_TAPS - 1)
    assert b % TILE_CH == 0, "pallas receiver needs B % 1024 == 0"
    assert s2 % 2 == 0, "pallas receiver processes step pairs (even S2)"
    grid = b // TILE_CH

    def tb(x):      # [B] -> [B/128, 128] planes
        return x.reshape(b // 128, 128)

    def tw(x):      # [B, 8] sync window -> [8, B/128, 128]
        return jnp.moveaxis(x, 1, 0).reshape(SYNC_SYMBOLS, b // 128, 128)

    # time-major ext: [S2+30, B/128, 128] f32 (bf16 would need 16-row
    # tiles; the f32 slice is ~1.7 MB per channel tile, well in VMEM)
    extt = jnp.moveaxis(ext, 1, 0).reshape(ext_len, b // 128, 128)

    # combined taps bank, tap-major: comb[k, p] = mf[p, k] for k < 31,
    # dmf[p, k - 31] above -- one (62, 40) VMEM table so refresh_taps
    # selects both banks with a single matmul per sublane row
    comb = np.concatenate([np.asarray(_MF_BANK).T,
                           np.asarray(_DMF_BANK).T], axis=0)

    i32 = lambda x: x.astype(jnp.int32)
    ins = (
        extt,
        jnp.asarray(comb, jnp.float32),
        jnp.asarray(SYNC_PATTERNS).astype(jnp.float32),
        tb(i32(state.clk)), tb(i32(state.thr)), tb(i32(state.index)),
        tb(i32(state.fclk)), tb(i32(state.ferr)), tb(i32(state.sync_type)),
        tb(state.mf_sum), tb(state.mf_dif), tb(state.pending),
        tb(i32(state.pending_valid)), tb(i32(state.flock)),
        tb(i32(state.sync_pass)), tb(i32(state.slip_in_frame)),
        tw(state.sync_win),
    )

    ext_spec = pl.BlockSpec((ext_len, NR, 128), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = lambda r, c: pl.BlockSpec((r, c), lambda g: (0, 0),
                                         memory_space=pltpu.SMEM)
    plane = pl.BlockSpec((NR, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((SYNC_SYMBOLS, NR, 128), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((s2 // 2, NR, 128), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)

    n_planes = b // 128
    out_shapes = (
        # pair-packed (see the kernel's output comment): one i32 plane
        # per step PAIR for slots (2 x fixed-point int16) and flags
        # (2 x 11-bit words)
        jax.ShapeDtypeStruct((s2 // 2, n_planes, 128), jnp.int32),
        jax.ShapeDtypeStruct((s2 // 2, n_planes, 128), jnp.int32),
        *(jax.ShapeDtypeStruct((n_planes, 128), jnp.int32)
          for _ in range(6)),                                     # int state
        *(jax.ShapeDtypeStruct((n_planes, 128), jnp.float32)
          for _ in range(3)),                                     # f32 state
        *(jax.ShapeDtypeStruct((n_planes, 128), jnp.int32)
          for _ in range(4)),              # pvalid, flock, spass, slipf
        jax.ShapeDtypeStruct((SYNC_SYMBOLS, n_planes, 128), jnp.float32),
    )
    out_specs = (
        seq_spec, seq_spec,
        plane, plane, plane, plane, plane, plane,
        plane, plane, plane,
        plane, plane, plane, plane,
        win_spec,
    )
    comb_spec = pl.BlockSpec((2 * TIMING_FILTER_TAPS, TIMING_NUM_PHASES),
                             lambda g: (0, 0), memory_space=pltpu.VMEM)
    in_specs = (
        ext_spec, comb_spec, tab_spec(6, 8),
        *([plane] * 13), win_spec,
    )

    outs = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((TIMING_FILTER_TAPS + 1, NR, 128), jnp.float32),
            pltpu.VMEM((TIMING_FILTER_TAPS + 1, NR, 128), jnp.float32),
            pltpu.VMEM((NR, 128), jnp.int32),
            pltpu.VMEM((NR, 128), jnp.int32),
            pltpu.VMEM((NR, 128), jnp.int32),
            pltpu.VMEM((NR, 128), jnp.int32),    # framer event bits
            pltpu.VMEM((NR, 128), jnp.int32),    # taps-dirty carry
        ],
        interpret=interpret,
    )(*ins)

    (slots, flags, clk, thr, index, fclk, ferr, stype,
     msum, mdif, pend, pvalid, flock, spass, slipf, swin) = outs

    def ub(x):
        return x.reshape(b)

    def unpack_pairs(x, signed: bool):
        # [P, planes, 128] i32 -> [B, S2] with even steps in the low
        # 16 bits and odd steps in the high (arithmetic shifts recover
        # the fixed-point sign)
        x = jnp.moveaxis(x.reshape(s2 // 2, b), 0, 1)        # [B, P]
        lo = (x << 16) >> 16 if signed else x & 0xFFFF
        hi = x >> 16 if signed else (x >> 16) & 0xFFFF
        return jnp.stack([lo, hi], axis=-1).reshape(b, s2)

    slot_val = unpack_pairs(slots, True).astype(jnp.float32) * (1 / 1024)
    flags_b = unpack_pairs(flags, False)

    new_state = state._replace(
        clk=ub(clk), thr=ub(thr), index=ub(index), fclk=ub(fclk),
        ferr=ub(ferr), sync_type=ub(stype),
        mf_sum=ub(msum), mf_dif=ub(mdif), pending=ub(pend),
        pending_valid=ub(pvalid) != 0, flock=ub(flock) != 0,
        sync_pass=ub(spass) != 0, slip_in_frame=ub(slipf) != 0,
        sync_win=jnp.moveaxis(swin.reshape(SYNC_SYMBOLS, b), 0, 1),
    )
    return slot_val, flags_b, new_state
