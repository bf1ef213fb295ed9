"""Baseband DSP: filters, TX modulator, RX front end, channel models."""

from . import channel, discriminator, equalize, filters, modulate  # noqa: F401
