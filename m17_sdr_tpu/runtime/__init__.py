"""ctypes binding for the native host runtime (libm17rt.so).

Builds the shared library on first import if needed (g++ is part of the
target environment; pybind11 is not, hence the C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).parent
_LIB = _DIR / "libm17rt.so"


def _build() -> None:
    subprocess.run(["make", "-C", str(_DIR), "-s"], check=True)


def _load() -> ctypes.CDLL:
    if not _LIB.exists() or _LIB.stat().st_mtime < (_DIR / "m17_runtime.cpp").stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)

    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, u8p]
    lib.ring_pop.restype = ctypes.c_int
    lib.ring_pop.argtypes = [ctypes.c_void_p, u8p]
    lib.ring_size.restype = ctypes.c_size_t
    lib.ring_size.argtypes = [ctypes.c_void_p]

    lib.dq_create.restype = ctypes.c_void_p
    lib.dq_create.argtypes = [ctypes.c_size_t]
    lib.dq_destroy.argtypes = [ctypes.c_void_p]
    lib.dq_push.restype = ctypes.c_int
    lib.dq_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint16]
    lib.dq_pop.restype = ctypes.c_int
    lib.dq_pop.argtypes = [ctypes.c_void_p, u8p, u16p]
    lib.dq_size.restype = ctypes.c_size_t
    lib.dq_size.argtypes = [ctypes.c_void_p]

    lib.udp_create.restype = ctypes.c_void_p
    lib.udp_create.argtypes = [ctypes.c_char_p, ctypes.c_uint16,
                               ctypes.c_uint16, ctypes.c_size_t]
    lib.udp_send_to_peer.restype = ctypes.c_int
    lib.udp_send_to_peer.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int]
    lib.udp_start_rx.argtypes = [ctypes.c_void_p]
    lib.udp_poll.restype = ctypes.c_int
    lib.udp_poll.argtypes = [ctypes.c_void_p, u8p, u16p]
    lib.udp_queue_size.restype = ctypes.c_size_t
    lib.udp_queue_size.argtypes = [ctypes.c_void_p]
    lib.udp_destroy.argtypes = [ctypes.c_void_p]
    return lib


_lib: ctypes.CDLL | None = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class SampleRing:
    """SPSC ring of fixed-size byte blocks (sample transport)."""

    def __init__(self, block_bytes: int, capacity_pow2: int = 64):
        self._lib = lib()
        self._block = block_bytes
        self._h = self._lib.ring_create(block_bytes, capacity_pow2)
        if not self._h:
            raise MemoryError(
                f"ring_create failed ({block_bytes} B x {capacity_pow2} "
                f"blocks = {block_bytes * capacity_pow2 / 1e9:.1f} GB)")

    def push(self, data: bytes) -> bool:
        assert len(data) == self._block
        buf = (ctypes.c_uint8 * self._block).from_buffer_copy(data)
        return bool(self._lib.ring_push(self._h, buf))

    def pop(self) -> bytes | None:
        buf = (ctypes.c_uint8 * self._block)()
        if self._lib.ring_pop(self._h, buf):
            return bytes(buf)
        return None

    def __len__(self) -> int:
        return self._lib.ring_size(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.ring_destroy(self._h)
            self._h = None


class DatagramQueue:
    """Bounded MPSC queue of datagrams (the gateway jitter buffer;
    200-frame cap like buffers.cpp:11)."""

    MAX_DGRAM = 65536  # keep in sync with m17_runtime.cpp DgramQueue::MAX_DGRAM

    def __init__(self, capacity: int = 200):
        self._lib = lib()
        self._h = self._lib.dq_create(capacity)

    def push(self, data: bytes) -> bool:
        # the wire length field is uint16: an oversize datagram must be
        # rejected HERE -- c_uint16(len) would silently truncate it to
        # len % 65536 and enqueue a corrupt prefix (the C-side bound
        # check can never fire for a uint16 argument)
        if not data or len(data) > 65535:
            return False
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        return bool(self._lib.dq_push(self._h, buf, len(data)))

    def pop(self) -> bytes | None:
        buf = (ctypes.c_uint8 * self.MAX_DGRAM)()
        ln = ctypes.c_uint16()
        if self._lib.dq_pop(self._h, buf, ctypes.byref(ln)):
            return bytes(buf[: ln.value])
        return None

    def __len__(self) -> int:
        return self._lib.dq_size(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.dq_destroy(self._h)
            self._h = None


class UdpTransport:
    """UDP socket with a native background RX thread feeding a queue."""

    def __init__(self, peer_ip: str, peer_port: int,
                 bind_port: int = 0, queue_cap: int = 200):
        import socket

        self._lib = lib()
        # resolve DNS names here: the native side takes dotted quads
        # only (inet_addr), and public reflector directories commonly
        # list hostnames.  gethostbyname passes literal IPs through
        # and raises on garbage instead of letting inet_addr map it to
        # the broadcast address.
        try:
            peer_ip = socket.gethostbyname(peer_ip)
        except OSError as e:
            raise OSError(f"cannot resolve UDP peer {peer_ip!r}: {e}")
        self._h = self._lib.udp_create(
            peer_ip.encode(), peer_port, bind_port, queue_cap)
        if not self._h:
            raise OSError(f"udp_create failed for {peer_ip}:{peer_port}")

    def send(self, data: bytes) -> int:
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        return self._lib.udp_send_to_peer(self._h, buf, len(data))

    def start_rx(self) -> None:
        self._lib.udp_start_rx(self._h)

    def poll(self) -> bytes | None:
        buf = (ctypes.c_uint8 * DatagramQueue.MAX_DGRAM)()
        ln = ctypes.c_uint16()
        if self._lib.udp_poll(self._h, buf, ctypes.byref(ln)):
            return bytes(buf[: ln.value])
        return None

    def queue_size(self) -> int:
        return self._lib.udp_queue_size(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.udp_destroy(self._h)
            self._h = None
