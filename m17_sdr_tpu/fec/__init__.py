"""Forward error correction: K=5 convolutional code + batched Viterbi."""

from .conv import conv_encode_bits, conv_encode_bytes  # noqa: F401
from .viterbi import viterbi_decode, viterbi_decode_xla  # noqa: F401
