"""M17 link layer: frame formatting (TX) and frame decoding (RX)."""

from . import rx_frames, tx_frames  # noqa: F401
