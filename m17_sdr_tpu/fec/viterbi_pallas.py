"""Pallas TPU kernel for the batched K=5 soft Viterbi decoder.

Reference behavior: m17_viterbi_decode / m17_conv_new_metric
(m17_conv.cpp:73-168).  Bit-exact against `viterbi.viterbi_decode`
(the XLA `lax.scan` formulation) -- same trellis tables, same
strict-> tie-break, same terminated-trellis init.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * Channels ride the LANE axis: soft inputs arrive as two [T, C]
    planes (C = lane chunk, a multiple of 128), so every ACS step is a
    full-width VPU op across C channels at once.
  * The 16 states live on the SUBLANE axis of a [16, C] VMEM scratch.
    The add-compare-select butterfly is unrolled over the 16 next
    states at trace time -- every accumulated-metric read uses a
    *static* sublane index (PREV0/PREV1 are compile-time tables), so
    there is no gather anywhere in the kernel.
  * Per-step survivor decisions are packed into one int32 word per
    channel (bit v = predecessor choice of next-state v): the whole
    path memory is a [T, C] int32 VMEM scratch -- 16x smaller than a
    [T, 16, C] decision tensor and written with one store per step.
    (The reference instead keeps an int[16][16400] path matrix,
    m17_conv.cpp:17.)
  * Traceback runs in-kernel as a reverse fori_loop with a per-lane
    variable bit shift (VPU) to extract the survivor bit, emitting the
    decoded bit plane [T, C] without ever leaving VMEM.

The forward recursion is sequential in T (a trellis is), but M17
trellises are short (<= 244 steps) so the whole frame's state fits in
VMEM and the grid parallelizes over channel chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv import DIBIT0, DIBIT1, NUM_STATES, PREV0, PREV1

_LANE = 128
_NEG = -1.0e6


def _branch(dibit: int, pp, pm, mp, mm):
    """Branch metric for a dibit (g1 g2) from the 4 precomputed sign combos."""
    return {
        0b11: pp,   # +m1 +m2
        0b10: pm,   # +m1 -m2
        0b01: mp,   # -m1 +m2
        0b00: mm,   # -m1 -m2
    }[dibit]


def _viterbi_kernel(m1_ref, m2_ref, bits_ref, metric_ref, acm, dec):
    t_steps = m1_ref.shape[0]

    # terminated-trellis init: state 0 at 0.0, the rest pinned far down
    acm[:] = jnp.full(acm.shape, _NEG, dtype=jnp.float32)
    acm[0:1, :] = jnp.zeros_like(acm[0:1, :])

    def fwd(t, _):
        m1 = m1_ref[pl.ds(t, 1), :]          # [1, C]
        m2 = m2_ref[pl.ds(t, 1), :]
        pp = m1 + m2
        pm = m1 - m2
        mp = -pm
        mm = -pp

        # read the full metric vector before any write (unrolled)
        old = [acm[v:v + 1, :] for v in range(NUM_STATES)]
        word = jnp.zeros_like(m1, dtype=jnp.int32)
        for v in range(NUM_STATES):
            b0 = _branch(int(DIBIT0[v]), pp, pm, mp, mm)
            b1 = _branch(int(DIBIT1[v]), pp, pm, mp, mm)
            cand0 = old[int(PREV0[v])] + b0
            cand1 = old[int(PREV1[v])] + b1
            # strict > keeps the second predecessor on ties
            # (m17_conv.cpp:19)
            take0 = cand0 > cand1
            acm[v:v + 1, :] = jnp.where(take0, cand0, cand1)
            word = word | jnp.where(take0, 0, 1 << v)
        dec[pl.ds(t, 1), :] = word
        return 0

    jax.lax.fori_loop(0, t_steps, fwd, 0)
    metric_ref[:] = acm[0:1, :]

    def bwd(i, state):
        t = t_steps - 1 - i
        word = dec[pl.ds(t, 1), :]
        d = jax.lax.shift_right_logical(word, state) & 1
        bits_ref[pl.ds(t, 1), :] = state >> 3
        return ((state & 7) << 1) | d

    state0 = jnp.zeros((1, m1_ref.shape[1]), dtype=jnp.int32)
    jax.lax.fori_loop(0, t_steps, bwd, state0)


@functools.partial(jax.jit, static_argnames=("return_metric", "interpret"))
def viterbi_decode_pallas(
    soft: jnp.ndarray,
    return_metric: bool = False,
    interpret: bool = False,
):
    """Decode [..., 2T] soft bits -> [..., T] hard bits on the TPU VPU.

    Drop-in for `viterbi.viterbi_decode`; same conventions (soft >0 ->
    bit 1, 0.0 erasure; output bit t is the encoder input at step t).
    `interpret=True` runs the Pallas interpreter (for CPU-only tests).
    """
    *batch, n2 = soft.shape
    t_steps = n2 // 2
    n = int(np.prod(batch)) if batch else 1

    # lane chunking: keep each chunk's VMEM footprint ~1 MB
    chunk = _LANE if n <= _LANE else min(512, ((n + _LANE - 1) // _LANE) * _LANE)
    n_pad = ((n + chunk - 1) // chunk) * chunk

    pairs = soft.reshape(n, t_steps, 2)
    planes = jnp.moveaxis(pairs, 0, -1)                    # [T, 2, N]
    if n_pad != n:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - n)))
    m1 = planes[:, 0, :]                                   # [T, Npad]
    m2 = planes[:, 1, :]

    grid = (n_pad // chunk,)
    spec_in = pl.BlockSpec((t_steps, chunk), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    bits, metric = pl.pallas_call(
        _viterbi_kernel,
        grid=grid,
        in_specs=[spec_in, spec_in],
        out_specs=[
            pl.BlockSpec((t_steps, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NUM_STATES, chunk), jnp.float32),
            pltpu.VMEM((t_steps, chunk), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_pad * t_steps * NUM_STATES * 3,
            bytes_accessed=n_pad * t_steps * 4 * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m1, m2)

    out = jnp.moveaxis(bits[:, :n], -1, 0).astype(jnp.uint8)
    out = out.reshape(*batch, t_steps)
    if return_metric:
        return out, metric[0, :n].reshape(*batch)
    return out
