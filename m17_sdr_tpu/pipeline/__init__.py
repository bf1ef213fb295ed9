"""End-to-end pipelines: batched TX, RX, and loopback harnesses."""

from . import loopback, rx, tx  # noqa: F401
