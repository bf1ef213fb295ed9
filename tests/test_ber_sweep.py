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


def test_sweep_waterfall_pinned():
    """Pin the modem's measured operating curve (VERDICT round 2 weak
    #8: the sweep asserted only monotonicity).

    This harness's SNR is defined over the full 48 kHz IQ bandwidth
    THROUGH the FM chain (modulator -> AWGN -> limiter ->
    discriminator), so its waterfall sits ~16 dB -- unlike the
    BER-parity harness, whose SNR is in the 9.6 kHz post-discriminator
    soft-symbol domain (waterfall ~6 dB).  Pinned from measurement
    (seed 2): 12 dB -> 0.06 recovery, 14 -> 0.07, 16 -> 0.70,
    18 -> 0.90, 25 -> 1.0 with zero bit errors."""
    pts = ber_sweep.ber_sweep(
        jax.random.PRNGKey(2), snr_points_db=[12.0, 16.0, 18.0, 25.0],
        channels_per_point=8, n_frames=12)
    p12, p16, p18, p25 = pts
    # clean region: everything back, error-free
    assert p25.frame_recovery == 1.0 and p25.bit_errors == 0
    assert p18.frame_recovery >= 0.8 and p18.ber <= 1e-3
    # waterfall region: partial recovery
    assert 0.3 <= p16.frame_recovery <= 0.95
    # below the FM threshold: essentially nothing usable
    assert p12.frame_recovery <= 0.2
    # recovery is monotone across the waterfall
    rec = [p.frame_recovery for p in pts]
    assert rec == sorted(rec)


def test_sweep_with_offset_and_drift():
    """The front end must hold the link under a 400 Hz carrier offset
    plus 50 ppm sample-rate drift at high SNR (the AFC + timing loop
    doing their jobs; radio.cpp:196-208, m17_rx_sync.cpp:45-72)."""
    pts = ber_sweep.ber_sweep(
        jax.random.PRNGKey(3), snr_points_db=[20.0],
        channels_per_point=4, n_frames=12,
        freq_offset_hz=400.0, drift_ppm=50.0)
    (p,) = pts
    assert p.frame_recovery >= 0.85, p
    assert p.ber <= 1e-3, p
