"""M17 protocol constants.

Every constant here is part of the public M17 protocol as exercised by the
reference implementation (G4GUO/m17_sdr).  Citations are file:line under
/root/reference/m17gismo/.

Conventions used throughout this framework:
  * symbols are the 4FSK levels {+1, +3, -1, -3} indexed by dibit {0,1,2,3}
    (m17_modulate.cpp:9 -- phase steps {+pi/30, +pi/10, -pi/30, -pi/10}).
  * soft bits are floats where  >0 means "bit is 1", <0 means "bit is 0",
    0.0 means erasure/unknown (m17_correlate.cpp:22-26, m17_puncture.cpp:43).
  * frames are 192 symbols = 40 ms: 8 sync symbols + 184 payload symbols
    (m17defines.h:66-67).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Rates and sizes (m17defines.h:17-18, 66-67)
# ---------------------------------------------------------------------------
SAMPLE_RATE = 48_000          # baseband complex sample rate, Hz
SYMBOL_RATE = 4_800           # 4FSK baud
SAMPLES_PER_SYMBOL = SAMPLE_RATE // SYMBOL_RATE   # 10
BLOCK_SAMPLES = 1_920         # one 40 ms processing block at 48 kHz
FRAME_SYMBOLS = 192           # symbols per frame (= 40 ms)
FRAME_BITS = 384              # bits per frame
PAYLOAD_SYMBOLS = 184         # frame symbols after the 8-symbol sync word
PAYLOAD_SOFT_BITS = 368       # 2 soft bits per payload symbol
SYNC_SYMBOLS = 8

# Receiver internal rate: discriminator output is decimated by 5 to
# 9.6 kHz = 2 samples/symbol (m17_dsp.cpp:206-209).
RX_DECIMATION = 5
RX_SAMPLES_PER_SYMBOL = 2

# ---------------------------------------------------------------------------
# Frame types, ordered exactly as the sync-correlation rows
# (m17_rx_frame.cpp:5-12)
# ---------------------------------------------------------------------------
FT_PREAMBLE = 0
FT_LINK = 1        # LSF
FT_STREAM = 2
FT_PACKET = 3
FT_BERT = 4
FT_EOT = 5
NUM_FRAME_TYPES = 6

# 16-bit sync words (m17_tx_routines.cpp:6-9).  The preamble and EOT have
# no sync word; they are fixed symbol patterns.
SYNC_WORD_LINK = 0x55F7
SYNC_WORD_STREAM = 0xFF5D
SYNC_WORD_PACKET = 0x75FF
SYNC_WORD_BERT = 0xDF55

# Dibit -> symbol map.  Dibit b1b0: 00->+1, 01->+3, 10->-1, 11->-3
# (m17_modulate.cpp:9: phase increments {pi/30, pi/10, -pi/30, -pi/10}
# correspond to deviations {+800, +2400, -800, -2400} Hz).
DIBIT_TO_SYMBOL = np.array([1.0, 3.0, -1.0, -3.0], dtype=np.float32)

# Phase increment per 48 kHz sample for each dibit (m17_modulate.cpp:9).
DIBIT_TO_PHASE_INC = np.array(
    [np.pi / 30.0, np.pi / 10.0, -np.pi / 30.0, -np.pi / 10.0],
    dtype=np.float32,
)


def _sync_word_to_symbols(word: int) -> np.ndarray:
    """Expand a 16-bit sync word into 8 normalized symbols (sign only).

    The receiver correlates against +-1 sign patterns, not full +-3 levels
    (m17_rx_frame.cpp:5-12).
    """
    dibits = [(word >> (14 - 2 * i)) & 0x3 for i in range(8)]
    return np.sign(DIBIT_TO_SYMBOL[dibits]).astype(np.float32)


# Sync correlation patterns, rows indexed by frame type
# (m17_rx_frame.cpp:5-12).  Preamble alternates +3/-3 -> signs +1/-1;
# EOT pattern from its dibit sequence (m17_tx_routines.cpp:242-255).
SYNC_PATTERNS = np.stack(
    [
        np.array([1, -1, 1, -1, 1, -1, 1, -1], dtype=np.float32),  # preamble
        _sync_word_to_symbols(SYNC_WORD_LINK),                     # link
        _sync_word_to_symbols(SYNC_WORD_STREAM),                   # stream
        _sync_word_to_symbols(SYNC_WORD_PACKET),                   # packet
        _sync_word_to_symbols(SYNC_WORD_BERT),                     # bert
        np.array([1, 1, 1, 1, 1, 1, -1, 1], dtype=np.float32),     # EOT
    ]
)

# Preamble dibit pattern: alternating +3 -3 (m17_tx_routines.cpp:24-31:
# dibits 0x01, 0x03 repeated).
PREAMBLE_DIBITS = np.tile(np.array([1, 3], dtype=np.uint8), FRAME_SYMBOLS // 2)

# EOT frame dibit pattern (m17_tx_routines.cpp:242-255): 24 repeats of
# {+3 x6, -3, +3}.
EOT_DIBITS = np.tile(
    np.array([1, 1, 1, 1, 1, 1, 3, 1], dtype=np.uint8), FRAME_SYMBOLS // 8
)

# ---------------------------------------------------------------------------
# Framer thresholds (m17_rx_frame.cpp)
# ---------------------------------------------------------------------------
MAX_FRAME_ERRORS = 5          # consecutive bad frames before LOS (line 122)
UNLOCKED_MAX_VOTES = 0        # line 83: votes > 0 rejects
LOCKED_MAX_VOTES = 1          # line 94: votes > 1 rejects
UNLOCKED_MAX_VARIANCE = 0.3   # line 87
LOCKED_MAX_VARIANCE = 0.5     # line 98

# Timing-loop thresholds (m17_rx_sync.cpp:92-95)
TIMING_THRESH_UNLOCKED = 10
TIMING_THRESH_LOCKED = 80
TIMING_NUM_PHASES = 40        # NF (m17_rx_sync.cpp:3)
TIMING_FILTER_TAPS = 31       # FN (m17_rx_sync.cpp:4)
TIMING_INIT_PHASE = 10        # m17_rx_sync.cpp:126

# TX pulse shaping (m17_modulate.cpp:6, 73)
TX_FILTER_TAPS = 31
RRC_ROLLOFF = 0.5

# Soft-bit demap threshold: |soft symbol| - 2/3 decides the LSB
# (m17_dsp.cpp:41 uses 0.6666 explicitly).
DEMAP_LSB_OFFSET = 0.6666

# ---------------------------------------------------------------------------
# LSF / LICH layout (m17_tx_routines.cpp:37-53, m17_rx_parse.cpp:52-85)
# ---------------------------------------------------------------------------
LSF_BYTES = 30                # 6 dst + 6 src + 2 type + 14 meta + 2 crc
LICH_CHUNK_BYTES = 5          # bytes of LSF carried per stream frame
LICH_CHUNKS = 6               # chunks to reassemble a full LSF
STREAM_PAYLOAD_BYTES = 16     # 2 codec2 frames
PACKET_CHUNK_BYTES = 25
META_BYTES = 14

# Byte counts fed to the convolutional encoder per frame type
LSF_CONV_IN_BYTES = 30        # -> 488 coded bits -> P1 -> 368
STREAM_CONV_IN_BYTES = 18     # 2 FN + 16 payload -> 296 -> P2 -> 272
PACKET_CONV_IN_BYTES = 26     # 25 payload + 1 metadata -> 420 -> P3 -> 368
BERT_BITS = 197               # PRBS9 bits per BERT frame -> 402 -> P2 -> 368

# Coded lengths (pre-puncture): 2*(8*bytes + 4)
LSF_CODED_BITS = 488
STREAM_CODED_BITS = 296
PACKET_CODED_BITS = 420
BERT_CODED_BITS = 402

# Golay section of a stream frame: 4 codewords x 24 bits
STREAM_GOLAY_BITS = 96

# ---------------------------------------------------------------------------
# Network / reflector protocol (m17_net.cpp)
# ---------------------------------------------------------------------------
NET_FRAME_BYTES = 54          # "M17 " voice datagram size (m17_net.cpp:12)
NET_UDP_PORT = 17_000         # m17_net.cpp:10
BROADCAST_ADDRESS = 0xFFFF_FFFF_FFFF  # m17_bit_utils.cpp:210
