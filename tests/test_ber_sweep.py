"""BER-vs-SNR sweep harness (BASELINE config 5).

One batched run covers every SNR point with its own channel block;
sanity: high SNR decodes error-free, low SNR is strictly worse, and the
JSON serialization carries every field the parity record needs.
"""

import jax

from m17_sdr_tpu.pipeline import ber_sweep


def test_sweep_points_and_monotony():
    pts = ber_sweep.ber_sweep(
        jax.random.PRNGKey(0), snr_points_db=[3.0, 30.0],
        channels_per_point=2, n_frames=6)
    assert [p.snr_db for p in pts] == [3.0, 30.0]
    lo, hi = pts
    # clean channel: every frame back, zero errors
    assert hi.frame_recovery == 1.0
    assert hi.bit_errors == 0 and hi.bits > 0
    # noisy channel is strictly worse on at least one axis
    assert (lo.ber > hi.ber) or (lo.frame_recovery < hi.frame_recovery)


def test_sweep_json_fields():
    pts = ber_sweep.ber_sweep(
        jax.random.PRNGKey(1), snr_points_db=[30.0],
        channels_per_point=1, n_frames=4)
    (d,) = ber_sweep.sweep_to_json(pts)
    for k in ("snr_db", "channels", "bits", "bit_errors", "ber",
              "frames_sent", "frames_recovered", "frame_recovery"):
        assert k in d
