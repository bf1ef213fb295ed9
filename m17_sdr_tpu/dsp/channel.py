"""Channel impairment models for loopback testing and BER sweeps.

The reference's only channel was a stubbed-to-zero noise hook in its
offline harness (m17_test.cpp:18-22); real testing was on-air.  This
module provides the AWGN / carrier-offset / timing-drift impairments the
BASELINE configs call for, batched per channel, on planar IQ
[B, 2, T] (see dsp/iq.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.constants import SAMPLES_PER_SYMBOL
from . import iq as iqmod


def awgn(key: jax.Array, iq2: jnp.ndarray, snr_db) -> jnp.ndarray:
    """Add complex white Gaussian noise at per-channel SNR (dB).

    SNR is defined against the unit-magnitude FM carrier (signal power 1).
    snr_db may be scalar or [B] for per-channel sweeps.
    """
    snr = 10.0 ** (jnp.asarray(snr_db, dtype=jnp.float32) / 10.0)
    sigma = jnp.sqrt(1.0 / (2.0 * snr))
    while sigma.ndim < iq2.ndim:
        sigma = sigma[..., None]
    noise = jax.random.normal(key, iq2.shape)
    return iq2 + noise * sigma


def carrier_offset(iq2: jnp.ndarray, freq_hz, sample_rate: int = 48_000,
                   phase0=0.0) -> jnp.ndarray:
    """Rotate by a per-channel carrier frequency offset (Hz)."""
    freq = jnp.atleast_1d(jnp.asarray(freq_hz, dtype=jnp.float32))
    t = jnp.arange(iq2.shape[-1], dtype=jnp.float32)
    ph = 2.0 * np.pi * freq[:, None] * t / sample_rate + phase0
    return iqmod.rotate(iq2, jnp.cos(ph), jnp.sin(ph))


def carrier_ramp(iq2: jnp.ndarray, rate_hz_per_s, start_hz=0.0,
                 sample_rate: int = 48_000) -> jnp.ndarray:
    """Linearly drifting carrier offset (warming oscillator).

    This is the impairment the reference's AFC loop exists for
    (radio.cpp:196-208): a static offset is absorbed by the
    discriminator DC path, but a drift that accumulates past the
    discriminator's linear range needs the NCO to keep re-centering.
    """
    rate = jnp.atleast_1d(jnp.asarray(rate_hz_per_s, dtype=jnp.float32))
    f0 = jnp.atleast_1d(jnp.asarray(start_hz, dtype=jnp.float32))
    t = jnp.arange(iq2.shape[-1], dtype=jnp.float32) / sample_rate
    # phase = 2*pi * integral of f(t) = 2*pi*(f0*t + rate*t^2/2)
    ph = 2.0 * np.pi * (f0[:, None] * t + 0.5 * rate[:, None] * t * t)
    return iqmod.rotate(iq2, jnp.cos(ph), jnp.sin(ph))


def timing_drift(iq2: jnp.ndarray, ppm, offset_samples=0.0) -> jnp.ndarray:
    """Resample with a static fractional offset plus linear clock drift.

    Linear-interpolation resampler: output n reads input position
    n*(1+ppm*1e-6) + offset.  Exercises the bit-slip path of the timing
    loop (m17_rx_sync.cpp:45-72).
    """
    ppm = jnp.atleast_1d(jnp.asarray(ppm, dtype=jnp.float32))
    off = jnp.atleast_1d(jnp.asarray(offset_samples, dtype=jnp.float32))
    n = iq2.shape[-1]
    pos = jnp.arange(n, dtype=jnp.float32)[None, :] * (1.0 + ppm[:, None] * 1e-6) \
        + off[:, None]
    pos = jnp.clip(pos, 0.0, n - 1.001)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    i0b = jnp.broadcast_to(i0[:, None, :], iq2.shape)
    x0 = jnp.take_along_axis(iq2, i0b, axis=-1)
    x1 = jnp.take_along_axis(iq2, i0b + 1, axis=-1)
    return x0 + (x1 - x0) * frac[:, None, :]


def symbol_rate_awgn(key: jax.Array, samples: jnp.ndarray,
                     snr_db, sps: int = SAMPLES_PER_SYMBOL) -> jnp.ndarray:
    """AWGN added directly to real baseband samples (for the digital
    2-samples/symbol loopback path, the analog of m17_test.cpp:42-52).

    Noise sigma is scaled so snr_db is Es/N0 for unit-amplitude symbols.
    """
    snr = 10.0 ** (jnp.asarray(snr_db, dtype=jnp.float32) / 10.0)
    sigma = jnp.sqrt(1.0 / (2.0 * snr))
    if sigma.ndim == 1:
        sigma = sigma[:, None]
    return samples + jax.random.normal(key, samples.shape) * sigma
