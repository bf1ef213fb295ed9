"""Multi-chip / multi-host scaling: channel sharding and time slabs."""

from . import halo, sharding  # noqa: F401
