"""Multi-chip scaling: pixel-plane sharding over a jax.sharding.Mesh.

TPU-native replacement for the reference's rayon row-chunk parallelism
(ref: adder-codec-rs/src/transcoder/source/video.rs:677-734 and SURVEY
section 2.5): pixels never communicate during integration, so the plane
shards cleanly along the flattened pixel axis. The only cross-shard
operations are the event-compaction prefix sums, which XLA lowers to
ICI collectives automatically under jit-with-shardings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import integrate as ops


def make_mesh(devices=None, axis_name: str = "px") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def state_sharding(mesh: Mesh, axis_name: str = "px"):
    """Sharding tree for a PixelState: node arrays (DEPTH, N) shard along N,
    per-pixel arrays (N,) shard along N, scalars replicate."""
    node = NamedSharding(mesh, P(None, axis_name))
    flat = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return ops.PixelState(
        node_d=node,
        node_integ=node,
        node_dt=node,
        best_d=node,
        best_dt=node,
        length=flat,
        base_val=flat,
        c_thresh=flat,
        c_increase_counter=flat,
        last_fired_t=flat,
        running_t=flat,
        need_pop=flat,
        dtm_reached=flat,
        popped_dtm=flat,
        overflow=rep,
    )


def shard_state(state: ops.PixelState, mesh: Mesh, axis_name: str = "px"):
    return jax.device_put(state, state_sharding(mesh, axis_name))


def make_transcode_chunk_sharded(
    p: ops.TranscodeParams, event_cap: int, mesh: Mesh, axis_name: str = "px"
):
    """Sharded variant of ops.make_transcode_chunk: state and frames are
    split along the pixel axis across the mesh; the compacted event buffer
    is replicated (it is the serialization boundary)."""
    st_shard = state_sharding(mesh, axis_name)
    frames_shard = NamedSharding(mesh, P(None, axis_name))
    flat_shard = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def chunk_fn(state, frames, time, run0):
        inner = ops.make_transcode_chunk(p, event_cap, ops.K_SLOTS)
        return inner(state, frames, time, run0)

    return jax.jit(
        chunk_fn,
        in_shardings=(st_shard, frames_shard, rep, flat_shard),
        out_shardings=(
            st_shard,  # state
            rep,  # ev pix<<8|d
            rep,  # ev t
            rep,  # ev t16
            rep,  # t_base
            rep,  # t16_ok
            rep,  # total
            rep,  # per-interval counts
            frames_shard,  # runnings
            rep,  # pack_max
        ),
    )
