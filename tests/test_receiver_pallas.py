"""Fused Pallas receiver kernel vs the XLA scan formulation.

CI runs the kernel through the Pallas interpreter (CPU backend); the
compiled kernel is exercised on real hardware by bench.py (default
fast path at B%1024==0) and tools/tpu_selftest.py-style runs.

Parity standard: the kernel computes the MF dot in f32 while the XLA
path truncates the hoisted conv to bf16, so per-step float values may
differ by ~1e-2 and an occasional timing vote near zero can flip.  The
assertion is therefore at the level that matters: identical lock
behavior and identical recovered frames on a realistic signal.
"""

import numpy as np
import pytest

from m17_sdr_tpu.frame.receiver import ReceiverState, receive_block


@pytest.fixture(scope="module")
def signal():
    from m17_sdr_tpu.pipeline import ber_parity as bp

    # 2 stream frames per session keep the interpreter-mode runtime
    # tolerable; lock, hunt, and frame emission are all still exercised
    wave, _ = bp.make_waveforms(2, 2, sigma=0.02, seed=3)
    b = 1024
    return np.tile(np.asarray(wave), (b // 2, 1)).astype(np.float32)


def test_frame_level_parity_with_xla_scan(signal):
    import jax.numpy as jnp

    b, t2 = signal.shape
    nblk = t2 // 384
    st_a = ReceiverState.init(b)
    st_b = ReceiverState.init(b)
    frames = 0
    for i in range(nblk):
        blk = jnp.asarray(signal[:, i * 384:(i + 1) * 384])
        ev_a, st_a = receive_block(blk, st_a)
        ev_b, st_b = receive_block(blk, st_b, use_pallas=True)
        fva = np.asarray(ev_a.frame_valid)
        fvb = np.asarray(ev_b.frame_valid)
        np.testing.assert_array_equal(fva, fvb, err_msg=f"block {i}")
        np.testing.assert_array_equal(
            np.asarray(ev_a.frame_type), np.asarray(ev_b.frame_type))
        both = fva & fvb
        if both.any():
            fa = np.asarray(ev_a.frames)[both]
            fb = np.asarray(ev_b.frames)[both]
            np.testing.assert_allclose(fa, fb, atol=0.05)
            frames += int(both.sum())
    assert frames > 0
    np.testing.assert_array_equal(
        np.asarray(st_a.flock), np.asarray(st_b.flock))
    np.testing.assert_array_equal(
        np.asarray(st_a.fclk), np.asarray(st_b.fclk))
