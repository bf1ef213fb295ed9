"""M17 base-40 callsign codec (host-side; control plane, not hot path).

Reference: m17_encode_call / m17_decode_call (m17_bit_utils.cpp:191-226).
Callsigns are up to 9 characters from [A-Z 0-9 - / . space], encoded
little-endian in base 40 into a 48-bit word; 0xFFFFFFFFFFFF is BROADCAST.
"""

from __future__ import annotations

from .constants import BROADCAST_ADDRESS

_CHARSET = {**{chr(ord("A") + i): i + 1 for i in range(26)},
            **{chr(ord("0") + i): i + 27 for i in range(10)},
            "-": 37, "/": 38, ".": 39, " ": 0}
_REVERSE = {v: k for k, v in _CHARSET.items()}


def encode_callsign(call: str) -> int:
    """Callsign string -> 48-bit address word.

    Matches the reference exactly: the call is right-padded with spaces to
    9 chars and digested from the last character down
    (m17_bit_utils.cpp:191-208).  Unknown characters map to 0 (space).
    """
    call = call.upper().ljust(9)[:9]
    word = 0
    for ch in reversed(call):
        word = word * 40 + _CHARSET.get(ch, 0)
    return word


def decode_callsign(word: int) -> str:
    """48-bit address word -> callsign string (m17_bit_utils.cpp:209-226)."""
    if word == BROADCAST_ADDRESS:
        return "BROADCAST"
    chars = []
    for _ in range(9):
        chars.append(_REVERSE.get(word % 40, " "))
        word //= 40
    return "".join(chars)
