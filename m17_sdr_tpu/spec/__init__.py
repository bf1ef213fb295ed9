"""M17 protocol layer: constants and pure, batched bit transforms.

Everything in this package is stateless and shape-static; transforms act
on the trailing axis and broadcast over arbitrary leading (channel) dims.
"""

from . import bits, callsign, constants, crc, golay, interleave, prbs, puncture, typefield, whiten  # noqa: F401
