"""Pallas Viterbi kernel parity vs the XLA lax.scan decoder.

Runs the kernel in Pallas interpret mode (tests execute on the CPU
backend, see conftest.py); on real TPU the same kernel is the default
dispatch of `fec.viterbi_decode`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from m17_sdr_tpu.fec.conv import conv_encode_bits
from m17_sdr_tpu.fec.viterbi import viterbi_decode_xla
from m17_sdr_tpu.fec.viterbi_pallas import viterbi_decode_pallas

# the four M17 trellis lengths: LSF, stream, packet, BERT
FRAME_STEPS = [244, 148, 210, 201]


@pytest.mark.parametrize("t_steps", FRAME_STEPS)
def test_pallas_matches_xla_random_soft(t_steps):
    rng = np.random.default_rng(t_steps)
    soft = jnp.asarray(rng.normal(size=(9, 2 * t_steps)).astype(np.float32))
    b_ref, m_ref = viterbi_decode_xla(soft, return_metric=True)
    b_pal, m_pal = viterbi_decode_pallas(soft, return_metric=True,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_pal))
    np.testing.assert_allclose(np.asarray(m_ref), np.asarray(m_pal),
                               atol=1e-3)


def test_pallas_decodes_clean_codeword():
    rng = np.random.default_rng(7)
    bits = jnp.asarray(rng.integers(0, 2, (5, 144), dtype=np.uint8))
    coded = conv_encode_bits(bits)
    soft = jnp.where(coded > 0, 1.0, -1.0).astype(jnp.float32)
    out = viterbi_decode_pallas(soft, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[:, :144]), np.asarray(bits))
    assert not np.any(np.asarray(out[:, 144:]))  # zero tail


def test_pallas_erasures_and_batch_shapes():
    rng = np.random.default_rng(3)
    soft = rng.normal(size=(2, 3, 296)).astype(np.float32)
    soft[..., ::7] = 0.0  # depunctured erasures
    soft = jnp.asarray(soft)
    b_ref = viterbi_decode_xla(soft)
    b_pal = viterbi_decode_pallas(soft, interpret=True)
    assert b_pal.shape == (2, 3, 148)
    np.testing.assert_array_equal(np.asarray(b_ref), np.asarray(b_pal))
