"""Pallas TPU kernel for the ADDER integration interval.

The XLA scan path (ops/integrate.py) expresses one interval as ~2000
elementwise ops over (N,) vectors; XLA materializes dozens of N-sized
intermediates per interval in HBM. This kernel runs the *same* interval
logic (`ops.integrate._interval_core` — shared code, shared bit-exactness)
with the working set resident in VMEM: the grid walks pixel blocks, each
step loads the state block, executes the whole interval on-chip, and writes
back state + event slots + running intensities. HBM traffic drops to the
mandatory state/slot read+write.

Mosaic caveats handled via ops.numerics.IN_PALLAS: optimization_barrier ->
bitcast fence; f32->u32 -> via i32 (timestamps < 2^31, the compressed
codec's own assumption).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import integrate as ops
from . import numerics

DEPTH = ops.DEPTH
K = ops.K_SLOTS

_i32 = jnp.int32
_f32 = jnp.float32
_u32 = jnp.uint32


def _kernel_body(p: ops.TranscodeParams, interpret: bool = False):
    def kernel(
        time_ref,  # SMEM (1, 1) f32
        # inputs (VMEM blocks)
        frame_ref,  # (1, B) u8
        nd_ref, ni_ref, ndt_ref, bd_ref, bdt_ref,  # (DEPTH, B)
        length_ref, base_ref, cth_ref, cic_ref,  # (1, B) i32
        lft_ref, rt_ref,  # (1, B) f32
        need_ref, dtm_ref, popped_ref,  # (1, B) u8 (bool)
        # outputs
        o_nd, o_ni, o_ndt, o_bd, o_bdt,
        o_length, o_base, o_cth, o_cic,
        o_lft, o_rt, o_need, o_dtm, o_popped,
        o_slot_d, o_slot_t, o_slot_m,  # (K, B)
        o_run_val, o_run_has,  # (1, B) u8
        o_overflow,  # (1, B) i32, block count broadcast across lanes
    ):
        fences = numerics.pallas_fences("interpret" if interpret else "mosaic")
        fences.__enter__()
        try:
            s = ops._S()
            s.nd = [nd_ref[k : k + 1, :] for k in range(DEPTH)]
            s.ni = [ni_ref[k : k + 1, :] for k in range(DEPTH)]
            s.ndt = [ndt_ref[k : k + 1, :] for k in range(DEPTH)]
            s.bd = [bd_ref[k : k + 1, :] for k in range(DEPTH)]
            s.bdt = [bdt_ref[k : k + 1, :] for k in range(DEPTH)]
            s.length = length_ref[:]
            s.base_val = base_ref[:]
            s.c_thresh = cth_ref[:]
            s.cic = cic_ref[:]
            s.lft = lft_ref[:]
            s.running_t = rt_ref[:]
            s.need_pop = need_ref[:] != 0
            s.dtm_reached = dtm_ref[:] != 0
            s.popped_dtm = popped_ref[:] != 0
            s.overflow = jnp.zeros((), _i32)

            # Mosaic lacks u8 -> f32; go through i32
            fv = frame_ref[:].astype(_i32)
            intensity = fv.astype(_f32)
            time = time_ref[0, 0]

            slots, (run_val, run_has) = ops._interval_core(
                s, intensity, fv, time, p
            )

            for k in range(DEPTH):
                o_nd[k : k + 1, :] = s.nd[k]
                o_ni[k : k + 1, :] = s.ni[k]
                o_ndt[k : k + 1, :] = s.ndt[k]
                o_bd[k : k + 1, :] = s.bd[k]
                o_bdt[k : k + 1, :] = s.bdt[k]
            o_length[:] = s.length
            o_base[:] = s.base_val
            o_cth[:] = s.c_thresh
            o_cic[:] = s.cic
            o_lft[:] = s.lft
            o_rt[:] = s.running_t
            o_need[:] = s.need_pop.astype(jnp.uint8)
            o_dtm[:] = s.dtm_reached.astype(jnp.uint8)
            o_popped[:] = s.popped_dtm.astype(jnp.uint8)
            for k in range(K):
                d_k, t_k, m_k = slots[k]
                o_slot_d[k : k + 1, :] = d_k.astype(_i32)
                o_slot_t[k : k + 1, :] = t_k.astype(_u32)
                o_slot_m[k : k + 1, :] = m_k.astype(jnp.uint8)
            o_run_val[:] = run_val
            o_run_has[:] = run_has.astype(jnp.uint8)
            o_overflow[:] = jnp.full(o_overflow.shape, s.overflow, _i32)
        finally:
            fences.__exit__()

    return kernel


@functools.lru_cache(maxsize=32)
def make_interval_pallas(
    p: ops.TranscodeParams, n: int, block: int = 32768,
    interpret: bool = False,
):
    """Build the jitted Pallas interval step for an N-pixel plane.

    Signature: (state: PixelState, frame (N,) u8, time f32 scalar) ->
    (state, slot_d (K, N) i32, slot_t (K, N) u32, slot_m (K, N) u8,
    run_val (N,) u8, run_has (N,) u8, overflow i32).
    N must be a multiple of `block` (the Video wrapper pads the plane).
    """
    assert n % block == 0, (n, block)
    grid = (n // block,)
    B = block

    def depth_spec():
        return pl.BlockSpec((DEPTH, B), lambda i: (0, i), memory_space=pltpu.VMEM)

    def flat_spec():
        return pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM)

    def slot_spec():
        return pl.BlockSpec((K, B), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),  # time
        flat_spec(),  # frame
        depth_spec(), depth_spec(), depth_spec(), depth_spec(), depth_spec(),
        flat_spec(), flat_spec(), flat_spec(), flat_spec(),
        flat_spec(), flat_spec(),
        flat_spec(), flat_spec(), flat_spec(),
    ]
    out_specs = (
        depth_spec(), depth_spec(), depth_spec(), depth_spec(), depth_spec(),
        flat_spec(), flat_spec(), flat_spec(), flat_spec(),
        flat_spec(), flat_spec(), flat_spec(), flat_spec(), flat_spec(),
        slot_spec(), slot_spec(), slot_spec(),
        flat_spec(), flat_spec(),
        flat_spec(),  # overflow counts (broadcast per block)
    )
    out_shape = (
        jax.ShapeDtypeStruct((DEPTH, n), _i32),
        jax.ShapeDtypeStruct((DEPTH, n), _f32),
        jax.ShapeDtypeStruct((DEPTH, n), _f32),
        jax.ShapeDtypeStruct((DEPTH, n), _i32),
        jax.ShapeDtypeStruct((DEPTH, n), _f32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _f32),
        jax.ShapeDtypeStruct((1, n), _f32),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((K, n), _i32),
        jax.ShapeDtypeStruct((K, n), _u32),
        jax.ShapeDtypeStruct((K, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), _i32),
    )

    call = pl.pallas_call(
        _kernel_body(p, interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )

    def step(state: ops.PixelState, frame_u8, time):
        time2d = jnp.asarray(time, _f32).reshape(1, 1)
        outs = call(
            time2d,
            frame_u8.reshape(1, n),
            state.node_d, state.node_integ, state.node_dt,
            state.best_d, state.best_dt,
            state.length.reshape(1, n).astype(_i32),
            state.base_val.reshape(1, n),
            state.c_thresh.reshape(1, n),
            state.c_increase_counter.reshape(1, n),
            state.last_fired_t.reshape(1, n),
            state.running_t.reshape(1, n),
            state.need_pop.reshape(1, n).astype(jnp.uint8),
            state.dtm_reached.reshape(1, n).astype(jnp.uint8),
            state.popped_dtm.reshape(1, n).astype(jnp.uint8),
        )
        (
            nd, ni, ndt, bd, bdt, length, base, cth, cic, lft, rt,
            need, dtm, popped, slot_d, slot_t, slot_m, run_val, run_has, ov,
        ) = outs
        new_state = ops.PixelState(
            node_d=nd, node_integ=ni, node_dt=ndt, best_d=bd, best_dt=bdt,
            length=length.reshape(n), base_val=base.reshape(n),
            c_thresh=cth.reshape(n), c_increase_counter=cic.reshape(n),
            last_fired_t=lft.reshape(n), running_t=rt.reshape(n),
            need_pop=need.reshape(n) != 0,
            dtm_reached=dtm.reshape(n) != 0,
            popped_dtm=popped.reshape(n) != 0,
            overflow=state.overflow + jnp.sum(ov[0, ::block]),
        )
        return new_state, slot_d, slot_t, slot_m != 0, (
            run_val.reshape(n), run_has.reshape(n) != 0
        )

    return step


def pad_to_block(n: int, block: int = 32768) -> int:
    return ((n + block - 1) // block) * block
