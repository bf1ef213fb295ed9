"""Device-mesh sharding of the modem pipelines.

The reference is a single-channel scalar pipeline with no parallelism
beyond 4 pthreads (SURVEY.md section 2).  Here the scale-out axes are:

  * `ch`  -- channel parallelism: independent M17 channels sharded over
    devices.  No communication at all on the hot path; only metric
    reductions (psum) cross devices.
  * `time` -- time-block parallelism for long captures: each device
    processes a slab of the stream; FIR state crosses slab boundaries by
    halo exchange (ppermute) and the feedback loops are warmed up on an
    overlap region (mesh/halo.py).

All sharding is expressed with jax.sharding.Mesh + shard_map; XLA
inserts the collectives (ICI within a slice, DCN across hosts).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.rx import RxSessionState, rx_stream


def make_mesh(n_devices: int | None = None, axis: str = "ch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_channels(tree, mesh: Mesh, axis: str = "ch"):
    """Place every array in a pytree with its leading (channel) dim
    sharded over the mesh axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def sharded_rx_stream(mesh: Mesh, afc_enabled: bool = False):
    """Channel-sharded rx_stream: [B, NBLK, T] with B sharded over `ch`.

    Returns (outputs, new_state, global_metrics) where global_metrics
    crosses the mesh with psum (the only collective on this path).
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), jax.tree.map(lambda _: P(axis), 0)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    def _run(iq_blocks, state):
        out, new_state = rx_stream(iq_blocks, state, afc_enabled=afc_enabled)
        # pod-wide aggregates ride one psum: [frames, golay errs, locks]
        local = jnp.stack([
            jnp.sum(new_state.n_frames).astype(jnp.float32),
            jnp.sum(new_state.golay_errors).astype(jnp.float32),
            jnp.sum(out.locked[:, -1].astype(jnp.float32))
            if out.locked.ndim == 2 else jnp.sum(out.locked.astype(jnp.float32)),
        ])
        global_metrics = jax.lax.psum(local, axis)
        return out, new_state, global_metrics

    def run(iq_blocks, state):
        return _run(iq_blocks, state)

    return run


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
