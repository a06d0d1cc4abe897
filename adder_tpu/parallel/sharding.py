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


def _get_shard_map():
    """jax.shard_map (stable since jax 0.4.35); the experimental module is
    deprecated as of 0.8 and slated for removal."""
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        return sm
    from jax.experimental.shard_map import shard_map

    def compat(f=None, *, check_vma=True, **kw):
        # the experimental module spells check_vma as check_rep
        return shard_map(f, check_rep=check_vma, **kw)

    return compat


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


def make_fused_chunk_sharded(
    p: ops.TranscodeParams,
    event_cap_per_dev: int,
    mesh: Mesh,
    pallas_block: int = 4096,
    pack: int = 4,
    axis_name: str = "px",
    interpret: bool = False,
):
    """Multi-chip fused transcode: each device runs the fused Pallas
    interval+compaction kernel (ops/fused_kernel.py) on its contiguous
    row-block of the pixel plane via shard_map — pixels never communicate,
    so there are NO collectives in the hot loop; each device compacts its
    own event buffer locally and the global single-thread event order is
    simply the device-major concatenation (row-block sharding preserves
    raster order).

    Signature: (state, frames (T, N_global) u8, time, run0) ->
    (state, bufs_pixd (D*cap,), bufs_t (D*cap,), totals (D,),
    per_interval (D, T), pack_max (D,), runnings (T, N_global)).
    Host assembly per device d: events = buf[d*cap : d*cap + totals[d]],
    pixel ids offset by d * (N_global / D). Overflow contract mirrors the
    single-device path and is the CALLER's to enforce: totals[d] > cap
    means a capacity rerun with a larger event_cap_per_dev, and
    (pack_max & 0xFFFF) > pack means events were truncated by the packed
    lanes — rerun with pack=16 (assemble_sharded_events checks both when
    given pack_max). `interpret=True` runs the kernel under the Pallas
    interpreter (CPU meshes / the driver's multi-chip dry run)."""
    shard_map = _get_shard_map()

    st_spec = ops.PixelState(
        node_d=P(None, axis_name), node_integ=P(None, axis_name),
        node_dt=P(None, axis_name), best_d=P(None, axis_name),
        best_dt=P(None, axis_name),
        length=P(axis_name), base_val=P(axis_name), c_thresh=P(axis_name),
        c_increase_counter=P(axis_name), last_fired_t=P(axis_name),
        running_t=P(axis_name), need_pop=P(axis_name),
        dtm_reached=P(axis_name), popped_dtm=P(axis_name), overflow=P(),
    )

    local = ops.make_fused_chunk(
        p, event_cap_per_dev, pack, pallas_block, n_real=0,
        interpret=interpret,
    )

    def body(state, frames, time, run0):
        (
            st, buf_pixd, buf_t, _t16, _tb, _ok, total, per_int, runnings,
            pmax,
        ) = local(state, frames, time, run0)
        return (
            st, buf_pixd, buf_t,
            total.reshape(1), per_int.reshape(1, -1), pmax.reshape(1),
            runnings,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(st_spec, P(None, axis_name), P(), P(axis_name)),
        out_specs=(
            st_spec, P(axis_name), P(axis_name),
            P(axis_name), P(axis_name, None), P(axis_name),
            P(None, axis_name),
        ),
        check_vma=False,  # jax.shard_map's rename of check_rep
    )
    return jax.jit(fn)


def make_resident_chunk_sharded(
    p: ops.TranscodeParams,
    event_cap_per_dev: int,
    mesh: Mesh,
    pallas_block: int = 4096,
    pack: int = 4,
    axis_name: str = "px",
    interpret: bool = False,
    depth: int = ops.DEPTH,
    emit_running: bool = True,
):
    """Multi-chip T-resident transcode (ops/fused_resident.py under
    shard_map): each device holds its contiguous row-block's pixel state
    VMEM-resident across the chunk — no collectives in the hot loop.

    Signature: (state, frames (T, N_global) u8, time, run0) ->
    (state, bufs_pixd (D*cap,), bufs_t (D*cap,), totals (D,),
    per_interval (D, T), pack_max (D,), runnings (T, N_global),
    counts (D, blocks_per_dev, T)).

    Each device's buffer segment is in its local (block, interval, slot,
    pixel) order; `assemble_resident_sharded` restores the global
    single-thread order (interval-major across ALL devices — note the
    plain per-device concatenation of the non-resident sharded path is
    only interval-correct within one device). Overflow contract matches
    make_fused_chunk_sharded."""
    from ..ops import fused_resident

    shard_map = _get_shard_map()

    st_spec = ops.PixelState(
        node_d=P(None, axis_name), node_integ=P(None, axis_name),
        node_dt=P(None, axis_name), best_d=P(None, axis_name),
        best_dt=P(None, axis_name),
        length=P(axis_name), base_val=P(axis_name), c_thresh=P(axis_name),
        c_increase_counter=P(axis_name), last_fired_t=P(axis_name),
        running_t=P(axis_name), need_pop=P(axis_name),
        dtm_reached=P(axis_name), popped_dtm=P(axis_name), overflow=P(),
    )

    local = fused_resident.make_fused_chunk_resident(
        p, event_cap_per_dev, pack, pallas_block, n_real=0,
        interpret=interpret, depth=depth, emit_running=emit_running,
    )

    def body(state, frames, time, run0):
        (
            st, buf_pixd, buf_t, _t16, _tb, _ok, total, per_int, runnings,
            pmax, counts,
        ) = local(state, frames, time, run0)
        return (
            st, buf_pixd, buf_t,
            total.reshape(1), per_int.reshape(1, -1), pmax.reshape(1),
            runnings, counts[None],
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(st_spec, P(None, axis_name), P(), P(axis_name)),
        out_specs=(
            st_spec, P(axis_name), P(axis_name),
            P(axis_name), P(axis_name, None), P(axis_name),
            P(None, axis_name), P(axis_name, None, None),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def assemble_resident_sharded(bufs_pixd, bufs_t, totals, counts,
                              n_devices: int, pack_max=None, pack: int = 4,
                              n_local_px: int = 0):
    """Global single-thread order from per-device resident buffers:
    within each device, assemble_resident_events restores interval-major
    order; across devices, interval t's segments concatenate device-major
    (row-block sharding keeps raster order within an interval)."""
    from ..ops.fused_resident import assemble_resident_events

    if pack_max is not None and pack < 16:
        pm = int(np.max(np.asarray(pack_max))) & 0xFFFF
        if pm > pack:
            raise OverflowError(
                f"a pixel emitted {pm} events (> pack={pack}): rerun the "
                "chunk with pack=16 to avoid event loss"
            )
    counts = np.asarray(counts)
    D, _, T = counts.shape
    cap = bufs_pixd.shape[0] // n_devices
    dev_p, dev_t, dev_off = [], [], []
    for d in range(n_devices):
        k = int(totals[d])
        if k > cap:
            raise OverflowError(
                f"device {d} event buffer overflow ({k} > {cap})"
            )
        ap, at = assemble_resident_events(
            np.asarray(bufs_pixd[d * cap : d * cap + k]),
            np.asarray(bufs_t[d * cap : d * cap + k]),
            counts[d],
        )
        if n_local_px:
            # local -> global pixel ids (row-block shard d starts at
            # pixel d * n_local_px; ids ride the high 24 bits of pixd)
            ap = ap + (np.uint32(d * n_local_px) << np.uint32(8))
        per_t = counts[d].sum(axis=0)
        off = np.concatenate([[0], np.cumsum(per_t)])
        dev_p.append(ap)
        dev_t.append(at)
        dev_off.append(off)
    parts_p, parts_t = [], []
    for t in range(T):
        for d in range(n_devices):
            a, b = int(dev_off[d][t]), int(dev_off[d][t + 1])
            if a != b:
                parts_p.append(dev_p[d][a:b])
                parts_t.append(dev_t[d][a:b])
    if not parts_p:
        return bufs_pixd[:0], bufs_t[:0]
    return np.concatenate(parts_p), np.concatenate(parts_t)


def assemble_sharded_events(bufs_pixd, bufs_t, totals, n_devices: int,
                            pack_max=None, pack: int = 4):
    """Host-side merge of per-device fused buffers into the global stream
    (device-major == raster order under row-block sharding). Pass the
    chunk's pack_max output to also detect packed-lane truncation."""
    if pack_max is not None and pack < 16:
        pm = int(np.max(np.asarray(pack_max))) & 0xFFFF
        if pm > pack:
            raise OverflowError(
                f"a pixel emitted {pm} events (> pack={pack}): rerun the "
                "chunk with pack=16 to avoid event loss"
            )
    cap = bufs_pixd.shape[0] // n_devices
    pixd_parts = []
    t_parts = []
    for d in range(n_devices):
        k = int(totals[d])
        if k > cap:
            # per-device capacity overflow: the caller must rerun the chunk
            # with a larger event_cap_per_dev (same contract as the
            # single-device path); slicing on would read into device d+1's
            # buffer segment
            raise OverflowError(
                f"device {d} event buffer overflow ({k} > {cap})"
            )
        pixd_parts.append(np.asarray(bufs_pixd[d * cap : d * cap + k]))
        t_parts.append(np.asarray(bufs_t[d * cap : d * cap + k]))
    return pixd_parts, t_parts
