"""Baseband DSP: filters, TX modulator, RX front end, channel models."""

from . import channel, discriminator, filters, modulate  # noqa: F401
