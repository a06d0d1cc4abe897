"""Dense ADDER integration kernel: the whole pixel plane as one state machine.

TPU-native redesign of the reference's per-pixel arena walk
(ref: adder-codec-rs/src/transcoder/event_pixel_tree.rs:317-479 and
transcoder/source/video.rs:1317-1380 `integrate_for_px`).

Design: the per-pixel recursive arena becomes struct-of-arrays state of shape
(DEPTH, N) over the flattened H*W*C plane. The reference's loop index `idx`
increments uniformly per iteration, so the arena walk unrolls into DEPTH
masked elementwise steps — no per-pixel dynamic control flow, no gathers in
the hot loop. D-table lookups (D_SHIFT_F32) are replaced by f32 exponent-bit
manipulation, which is exact for powers of two.

Per input interval each pixel emits events into K=9 fixed slots:
  slot 0      pop_top_event (pre-integration, dtm/D_MAX overflow)
  slots 1..=6 pop_best_events (contrast change drain, up to DEPTH_POP nodes)
  slot 7      set_d_for_continuous D_EMPTY filler (Continuous mode only)
  slot 8      pop_top_event (post-integration)
Flattened in (pixel, slot) order this reproduces the reference's
single-threaded event order exactly (per-pixel chronological, raster across
pixels — the reference's own determinism contract, see
src/bin/adder_simulproc.rs:188).

All real arithmetic is float32, mirroring the reference's `Intensity32` math
step for step so events are bit-identical to the scalar oracle
(adder_tpu.transcoder.pixel_oracle).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Mode, PixelMultiMode, TimeMode
from .numerics import exact_div

DEPTH = 8  # reference SmallVec inline capacity is 6 but can heap-grow
K_SLOTS = DEPTH + 3  # pop_top, DEPTH pop_best nodes, set_d filler, pop_top

F32_EPSILON = np.float32(1.1920929e-07)
D_MAX = 127
D_ZERO_INTEGRATION = 128
D_EMPTY = 255

_i32 = jnp.int32
_f32 = jnp.float32
_u32 = jnp.uint32


class PixelState(NamedTuple):
    """Dense transcoder state over N pixels (SoA; node arrays are (DEPTH, N))."""

    node_d: jax.Array  # int32 (DEPTH, N), 0..=128
    node_integ: jax.Array  # f32 (DEPTH, N)
    node_dt: jax.Array  # f32 (DEPTH, N)
    best_d: jax.Array  # int32 (DEPTH, N), -1 = no best event
    best_dt: jax.Array  # f32 (DEPTH, N)
    length: jax.Array  # int32 (N,), 1..=DEPTH
    base_val: jax.Array  # int32 (N,), u8 range
    c_thresh: jax.Array  # int32 (N,)
    c_increase_counter: jax.Array  # int32 (N,)
    last_fired_t: jax.Array  # f32 (N,)
    running_t: jax.Array  # f32 (N,)
    need_pop: jax.Array  # bool (N,)
    dtm_reached: jax.Array  # bool (N,)
    popped_dtm: jax.Array  # bool (N,)
    overflow: jax.Array  # int32 scalar: arena-depth overflow counter


class TranscodeParams(NamedTuple):
    """Static + per-run integration parameters (all Python scalars: baked
    into the jitted computation)."""

    mode: int = int(Mode.FramePerfect)
    multi_mode: int = int(PixelMultiMode.Collapse)
    time_mode: int = int(TimeMode.AbsoluteT)
    ref_time: int = 255
    delta_t_max: int = 7650
    c_thresh_max: int = 7
    c_increase_velocity: int = 7


def init_state(n_pixels: int, c_thresh: int = 10) -> PixelState:
    """Fresh state as in PixelArena::new(1.0, coord) (ref: :69-87) — node d
    = floor(log2(1.0)) = 0, c_thresh 10, c_increase_counter 1."""
    z = lambda shape, dt: jnp.zeros(shape, dt)
    return PixelState(
        node_d=z((DEPTH, n_pixels), _i32),
        node_integ=z((DEPTH, n_pixels), _f32),
        node_dt=z((DEPTH, n_pixels), _f32),
        best_d=jnp.full((DEPTH, n_pixels), -1, _i32),
        best_dt=z((DEPTH, n_pixels), _f32),
        length=jnp.ones((n_pixels,), _i32),
        base_val=z((n_pixels,), _i32),
        c_thresh=jnp.full((n_pixels,), c_thresh, _i32),
        c_increase_counter=jnp.ones((n_pixels,), _i32),
        last_fired_t=z((n_pixels,), _f32),
        running_t=z((n_pixels,), _f32),
        need_pop=z((n_pixels,), jnp.bool_),
        dtm_reached=z((n_pixels,), jnp.bool_),
        popped_dtm=z((n_pixels,), jnp.bool_),
        overflow=jnp.zeros((), _i32),
    )


def set_initial_d(state: PixelState, frame_val: jax.Array) -> PixelState:
    """Seed D and base_val from the first frame (ref: video.rs:780-801)."""
    d0 = _d_from_intensity(frame_val.astype(_f32))
    return state._replace(
        node_d=state.node_d.at[0].set(d0),
        base_val=frame_val.astype(_i32),
    )


# --- f32 exponent-bit helpers (replace D_SHIFT table lookups) ---------------


def _d_from_intensity(x: jax.Array) -> jax.Array:
    """floor(log2(x)) via exponent bits, 128 below 1.0, clamped to D_MAX.

    Matches the reference's trunc-then-leading_zeros (ref: event_pixel_tree.rs
    :482-499): for x >= 1, floor(log2(trunc(x))) == unbiased f32 exponent.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(_f32), _i32)
    e = ((bits >> 23) & 0xFF) - 127
    return jnp.where(x < 1.0, D_ZERO_INTEGRATION, jnp.minimum(e, D_MAX))


def _dshift_f32(d: jax.Array) -> jax.Array:
    """2^d as f32 for d in 0..=127; 0.0 for d >= 128 (table semantics)."""
    pow2 = jax.lax.bitcast_convert_type(
        (jnp.minimum(d, D_MAX) + 127) << 23, _f32
    )
    return jnp.where(d >= 128, _f32(0.0), pow2)


def _as_u32(x: jax.Array) -> jax.Array:
    """Rust `f32 as u32`: truncate toward zero, saturating, NaN -> 0."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=4294967295.0, neginf=0.0)
    x = jnp.clip(x, 0.0, 4294967295.0)
    return x.astype(_u32)


# --- event time conversion (ref: event_pixel_tree.rs:113-137) ---------------


def _emit_abs(lft, dt_f32, p: TranscodeParams):
    """delta_t -> event t + updated last_fired_t. Returns (t_u32, new_lft)."""
    if p.time_mode != int(TimeMode.AbsoluteT):
        return _as_u32(dt_f32), lft
    dtt = (dt_f32 + lft).astype(_f32)
    new_lft = dtt
    if p.mode == int(Mode.FramePerfect):
        lf_u = _as_u32(dtt)
        ref = _u32(p.ref_time)
        rounded = jnp.where(lf_u % ref == 0, lf_u, (lf_u // ref + 1) * ref)
        new_lft = rounded.astype(_f32)
    return _as_u32(dtt), new_lft


def _emit_abs_continuous(lft, dt_f32, p: TranscodeParams):
    """delta_t_to_absolute_t with mode forced Continuous (set_d filler path,
    ref: event_pixel_tree.rs:303)."""
    if p.time_mode != int(TimeMode.AbsoluteT):
        return _as_u32(dt_f32), lft
    dtt = (dt_f32 + lft).astype(_f32)
    return _as_u32(dtt), dtt


# --- pop_top_event (ref: event_pixel_tree.rs:139-210) -----------------------


def _pop_top_event(state: PixelState, next_i, mask, p: TranscodeParams):
    """Vectorized root pop. Returns (state, ev_d, ev_t, mask)."""
    n0_d = state.node_d[0]
    n0_integ = state.node_integ[0]
    n0_dt = state.node_dt[0]
    n0_best = state.best_d[0]
    has_best = n0_best >= 0

    zero_case = ~has_best & (n0_integ == 0.0) & (n0_dt > 0.0)
    synth_case = ~has_best & ~zero_case

    # synthesized best event (frame-perfect near-dtm path, ref: :161-196)
    synth_d = jnp.where(
        n0_integ < 1.0, D_ZERO_INTEGRATION, _d_from_intensity(n0_integ)
    )
    ev_d = jnp.where(
        zero_case, D_ZERO_INTEGRATION, jnp.where(has_best, n0_best, synth_d)
    )
    ev_dt = jnp.where(has_best, state.best_dt[0], n0_dt)

    t, new_lft = _emit_abs(state.last_fired_t, ev_dt, p)
    lft = jnp.where(mask, new_lft, state.last_fired_t)

    # arena shift-left (best & synth cases); zero case leaves arena in place
    shift = mask & ~zero_case
    new_d0 = _d_from_intensity(next_i)

    def shifted(arr, fill):
        rolled = jnp.concatenate([arr[1:], arr[-1:]], axis=0)
        return jnp.where(shift, rolled, arr)

    node_d = shifted(state.node_d, 0)
    node_integ = shifted(state.node_integ, 0.0)
    node_dt = shifted(state.node_dt, 0.0)
    best_d = shifted(state.best_d, -1)
    best_dt = shifted(state.best_dt, 0.0)

    # synth case: after synthesizing, arena[1] := new node then shift, so the
    # result is arena[0] = PixelNode(next_i), length = 1
    node_d = node_d.at[0].set(jnp.where(mask & synth_case, new_d0, node_d[0]))
    node_integ = node_integ.at[0].set(
        jnp.where(mask & synth_case, 0.0, node_integ[0])
    )
    node_dt = node_dt.at[0].set(jnp.where(mask & synth_case, 0.0, node_dt[0]))
    best_d = best_d.at[0].set(jnp.where(mask & synth_case, -1, best_d[0]))

    # zero case: node0.dt = 0, node0.d = d_from(next_i)
    node_dt = node_dt.at[0].set(jnp.where(mask & zero_case, 0.0, node_dt[0]))
    node_d = node_d.at[0].set(jnp.where(mask & zero_case, new_d0, node_d[0]))

    length = jnp.where(
        mask & synth_case,
        1,
        jnp.where(mask & has_best, state.length - 1, state.length),
    )

    state = state._replace(
        node_d=node_d,
        node_integ=node_integ,
        node_dt=node_dt,
        best_d=best_d,
        best_dt=best_dt,
        length=length,
        last_fired_t=lft,
        need_pop=jnp.where(mask, False, state.need_pop),
        popped_dtm=jnp.where(mask, True, state.popped_dtm),
    )
    return state, ev_d, t, mask


# --- pop_best_events (ref: event_pixel_tree.rs:213-287) ---------------------


def _pop_best_events(state: PixelState, intensity, mask, p: TranscodeParams):
    """Drain all node best events where `mask`. Returns
    (state, [(d, t, emit_mask)] * DEPTH) with slots in node order."""
    lft = state.last_fired_t
    slots = []
    emits = []
    tail_zeroed = jnp.zeros_like(mask)
    for s in range(DEPTH):
        node_active = s < state.length
        has_best = state.best_d[s] >= 0
        zero_ev = ~has_best & (state.node_dt[s] > 0.0) & (state.node_integ[s] == 0.0)
        emit = mask & node_active & (has_best | zero_ev)
        d_raw = jnp.where(has_best, state.best_d[s], D_ZERO_INTEGRATION)
        dt_raw = jnp.where(has_best, state.best_dt[s], state.node_dt[s])
        t, new_lft = _emit_abs(lft, dt_raw, p)
        lft = jnp.where(emit, new_lft, lft)
        slots.append((d_raw, t, emit))
        emits.append(emit)
        # zero-event mutates node.dt = 0; only the tail's survives the reset
        tail_zeroed = tail_zeroed | (emit & zero_ev & (s == state.length - 1))

    any_emit = functools.reduce(jnp.logical_or, emits)
    collapse = (
        mask & state.popped_dtm & any_emit
        if p.multi_mode == int(PixelMultiMode.Collapse)
        else jnp.zeros_like(mask)
    )

    if p.multi_mode == int(PixelMultiMode.Collapse):
        # first emitted event across slots
        first_d = jnp.zeros_like(slots[0][0])
        first_t = jnp.zeros_like(slots[0][1])
        found = jnp.zeros_like(mask)
        for d_raw, t, emit in slots:
            take = emit & ~found
            first_d = jnp.where(take, d_raw, first_d)
            first_t = jnp.where(take, t, first_t)
            found = found | emit
        # rewrite slots: [first, (D_EMPTY, running_t)], rest off
        new_slots = []
        for s, (d_raw, t, emit) in enumerate(slots):
            if s == 0:
                new_slots.append(
                    (
                        jnp.where(collapse, first_d, d_raw),
                        jnp.where(collapse, first_t, t),
                        jnp.where(collapse, collapse, emit),
                    )
                )
            elif s == 1:
                new_slots.append(
                    (
                        jnp.where(collapse, D_EMPTY, d_raw),
                        jnp.where(collapse, _as_u32(state.running_t), t),
                        jnp.where(collapse, collapse, emit),
                    )
                )
            else:
                new_slots.append((d_raw, t, emit & ~collapse))
        slots = new_slots
        lft = jnp.where(collapse, state.running_t, lft)

    # arena reset: normal -> arena[0] = tail node; collapse -> fresh node
    tail_oh = (
        jax.lax.broadcasted_iota(_i32, (DEPTH, 1), 0) == (state.length - 1)[None, :]
    )
    tail_d = jnp.sum(jnp.where(tail_oh, state.node_d, 0), axis=0)
    tail_integ = jnp.sum(jnp.where(tail_oh, state.node_integ, 0.0), axis=0)
    tail_dt = jnp.sum(jnp.where(tail_oh, state.node_dt, 0.0), axis=0)
    tail_dt = jnp.where(tail_zeroed, 0.0, tail_dt)
    # reference tail never carries a best event (debug_assert, ref: :242)

    fresh_d = _d_from_intensity(intensity)
    new0_d = jnp.where(collapse, fresh_d, tail_d)
    new0_integ = jnp.where(collapse, 0.0, tail_integ)
    new0_dt = jnp.where(collapse, 0.0, tail_dt)

    node_d = state.node_d.at[0].set(jnp.where(mask, new0_d, state.node_d[0]))
    node_integ = state.node_integ.at[0].set(
        jnp.where(mask, new0_integ, state.node_integ[0])
    )
    node_dt = state.node_dt.at[0].set(jnp.where(mask, new0_dt, state.node_dt[0]))
    best_d = state.best_d.at[0].set(jnp.where(mask, -1, state.best_d[0]))

    state = state._replace(
        node_d=node_d,
        node_integ=node_integ,
        node_dt=node_dt,
        best_d=best_d,
        length=jnp.where(mask, 1, state.length),
        last_fired_t=lft,
        need_pop=jnp.where(mask, False, state.need_pop),
        dtm_reached=jnp.where(mask, False, state.dtm_reached),
        popped_dtm=jnp.where(mask, False, state.popped_dtm),
    )
    return state, slots


# --- set_d_for_continuous (ref: event_pixel_tree.rs:289-312) ----------------


def _set_d_for_continuous(state: PixelState, intensity, mask, p: TranscodeParams):
    next_d = _d_from_intensity(intensity)
    fire = mask & (next_d < state.node_d[0]) & (state.node_dt[0] > 0.0)
    t, new_lft = _emit_abs_continuous(state.last_fired_t, state.node_dt[0], p)
    state = state._replace(
        last_fired_t=jnp.where(fire, new_lft, state.last_fired_t),
        node_dt=state.node_dt.at[0].set(
            jnp.where(fire, 0.0, state.node_dt[0])
        ),
        node_integ=state.node_integ.at[0].set(
            jnp.where(fire, 0.0, state.node_integ[0])
        ),
        node_d=state.node_d.at[0].set(
            jnp.where(mask, next_d, state.node_d[0])
        ),
    )
    return state, jnp.full_like(next_d, D_EMPTY), t, fire


# --- integrate (ref: event_pixel_tree.rs:317-479) ---------------------------


def _integrate(state: PixelState, intensity, time, p: TranscodeParams):
    """Vectorized PixelArena::integrate over all pixels."""
    # tail D re-aim for virgin tail nodes (ref: :332-335)
    tail_oh = (
        jax.lax.broadcasted_iota(_i32, (DEPTH, 1), 0) == (state.length - 1)[None, :]
    )
    tail_virgin = (
        jnp.sum(jnp.where(tail_oh, state.node_dt, 0.0), axis=0) == 0.0
    ) & (jnp.sum(jnp.where(tail_oh, state.node_integ, 0.0), axis=0) == 0.0)
    d_aim = _d_from_intensity(intensity)
    node_d = jnp.where(tail_oh & tail_virgin[None, :], d_aim[None, :], state.node_d)

    running_t = (state.running_t + time).astype(_f32)

    node_integ = state.node_integ
    node_dt = state.node_dt
    best_d = state.best_d
    best_dt = state.best_dt
    length = state.length
    overflow = state.overflow

    i_cur = intensity.astype(_f32)
    t_cur = jnp.broadcast_to(jnp.asarray(time, _f32), i_cur.shape)
    active = jnp.ones(i_cur.shape, jnp.bool_)
    collapse_brk = (
        state.popped_dtm
        if p.multi_mode == int(PixelMultiMode.Collapse)
        else jnp.zeros_like(state.popped_dtm)
    )

    for s in range(DEPTH):
        d = node_d[s]
        integ = node_integ[s]
        dt = node_dt[s]

        total = (integ + i_cur).astype(_f32)
        fire = active & (total >= _dshift_f32(d))

        new_d = _d_from_intensity(total)
        # correctly-rounded division (XLA's f32 divide is ~1 ulp off IEEE,
        # which would shift event timestamps; see ops/numerics.py)
        prop = exact_div((_dshift_f32(new_d) - integ).astype(_f32), i_cur)
        prop = jnp.where(
            (new_d == D_ZERO_INTEGRATION)
            | (d == D_ZERO_INTEGRATION)
            | (i_cur < F32_EPSILON),
            _f32(1.0),
            prop,
        )
        # barrier: force separate f32 rounding of the product (the reference
        # rounds `time * prop` to f32 before adding; XLA would otherwise fuse
        # into an FMA and shift event timestamps by 1 tick)
        t_prop = jax.lax.optimization_barrier((t_cur * prop).astype(_f32))
        i_prop = jax.lax.optimization_barrier((i_cur * prop).astype(_f32))
        fired_best_dt = (dt + t_prop).astype(_f32)

        # D bump for continued integration (ref: :449-461)
        bump = new_d < D_MAX
        integ2 = total
        dt2 = (dt + t_cur).astype(_f32)
        d_bumped = jnp.minimum(
            jnp.maximum(new_d + 1, _d_from_intensity(integ2) + 1), 128
        )

        # node update: fire&bump -> (d_bumped, total, dt+t); fire&!bump
        # (new_d == D_MAX) -> (new_d, unchanged); active no-fire -> accumulate
        accum = active & ~fire
        node_d = node_d.at[s].set(
            jnp.where(fire, jnp.where(bump, d_bumped, new_d), d)
        )
        node_integ = node_integ.at[s].set(
            jnp.where(
                fire & bump,
                integ2,
                jnp.where(accum, (integ + i_cur).astype(_f32), integ),
            )
        )
        node_dt = node_dt.at[s].set(
            jnp.where(
                fire & bump,
                dt2,
                jnp.where(accum, (dt + t_cur).astype(_f32), dt),
            )
        )

        best_d = best_d.at[s].set(jnp.where(fire, new_d, best_d[s]))
        best_dt = best_dt.at[s].set(jnp.where(fire, fired_best_dt, best_dt[s]))

        # remainder (ref: :463-473)
        rem_i = (i_cur - i_prop).astype(_f32)
        rem_t = (t_cur - t_prop).astype(_f32)
        neg = rem_i < 0.0
        if p.mode == int(Mode.FramePerfect):
            next_i = jnp.zeros_like(i_cur)
            next_t = jnp.zeros_like(t_cur)
        else:
            next_i = jnp.where(neg, 0.0, rem_i).astype(_f32)
            next_t = jnp.where(neg, 0.0, rem_t).astype(_f32)

        # child creation at s+1 (ref: :344-355)
        child_d = _d_from_intensity(i_cur)
        if s + 1 < DEPTH:
            node_d = node_d.at[s + 1].set(jnp.where(fire, child_d, node_d[s + 1]))
            node_integ = node_integ.at[s + 1].set(
                jnp.where(fire, 0.0, node_integ[s + 1])
            )
            node_dt = node_dt.at[s + 1].set(jnp.where(fire, 0.0, node_dt[s + 1]))
            best_d = best_d.at[s + 1].set(jnp.where(fire, -1, best_d[s + 1]))
        else:
            overflow = overflow + jnp.sum(fire.astype(_i32))
        length = jnp.where(fire, s + 2, length)

        i_cur = jnp.where(fire, next_i, i_cur)
        t_cur = jnp.where(fire, next_t, t_cur)

        # break conditions for the next iteration (idx = s+1)
        brk = collapse_brk
        if p.mode == int(Mode.FramePerfect):
            brk = brk | fire
        else:
            # continuous: child D override when remaining time > ref_time
            if s + 1 < DEPTH:
                override = fire & ~collapse_brk & (t_cur > _f32(p.ref_time))
                node_d = node_d.at[s + 1].set(
                    jnp.where(override, _d_from_intensity(i_cur), node_d[s + 1])
                )
            brk = brk | (fire & (i_cur == 0.0))
        brk = brk | ((s + 1) >= length)
        active = active & ~brk

    length = jnp.minimum(length, DEPTH)  # overflow containment (counted above)
    dtm_reached = node_dt[0] >= _f32(p.delta_t_max)
    need_pop = (node_d[0] == D_MAX) | (dtm_reached & ~state.popped_dtm)

    # adaptive c_thresh (ref: :402-412)
    c = state.c_thresh
    cc = state.c_increase_counter
    adapting = c < p.c_thresh_max
    vel_m1 = (p.c_increase_velocity - 1) % 256
    bump_c = adapting & (cc >= vel_m1)
    inc = (_as_u32(jnp.broadcast_to(jnp.asarray(time, _f32), c.shape)) // _u32(max(p.ref_time, 1))).astype(_i32) % 256
    c_thresh = jnp.where(bump_c, jnp.minimum(c + 1, 255), c)
    c_counter = jnp.where(
        bump_c, 0, jnp.where(adapting, jnp.minimum(cc + inc, 255), cc)
    )

    return state._replace(
        node_d=node_d,
        node_integ=node_integ,
        node_dt=node_dt,
        best_d=best_d,
        best_dt=best_dt,
        length=length,
        running_t=running_t,
        dtm_reached=dtm_reached,
        need_pop=need_pop,
        c_thresh=c_thresh,
        c_increase_counter=c_counter,
        overflow=overflow,
    )


# --- full interval: integrate_for_px over the plane -------------------------


def integrate_interval(
    state: PixelState,
    intensity: jax.Array,  # (N,) f32
    frame_val: jax.Array,  # (N,) int32 (u8 range)
    time: jax.Array,  # scalar f32 ticks spanned
    p: TranscodeParams,
):
    """One input interval over all pixels (ref: video.rs:1317-1380).

    Returns (state, slot_d (K, N) int32, slot_t (K, N) uint32,
    slot_mask (K, N) bool). Slots flattened (pixel, slot)-major reproduce the
    reference's single-threaded event order.
    """
    intensity = intensity.astype(_f32)

    # 1. pre-integration pop_top
    state, d0, t0, m0 = _pop_top_event(state, intensity, state.need_pop, p)

    # 2. contrast threshold check (u8 saturating, ref: video.rs:1338-1340)
    bv = state.base_val
    c = state.c_thresh
    changed = (frame_val < jnp.maximum(bv - c, 0)) | (
        frame_val > jnp.minimum(bv + c, 255)
    )
    state, pop_slots = _pop_best_events(state, intensity, changed, p)
    state = state._replace(
        base_val=jnp.where(changed, frame_val.astype(_i32), bv)
    )

    if p.mode == int(Mode.Continuous):
        state, d7, t7, m7 = _set_d_for_continuous(state, intensity, changed, p)
    else:
        d7 = jnp.zeros_like(d0)
        t7 = jnp.zeros_like(t0)
        m7 = jnp.zeros_like(m0)

    # 3. integrate
    state = _integrate(state, intensity, time, p)

    # 4. post-integration pop_top
    state, d8, t8, m8 = _pop_top_event(state, intensity, state.need_pop, p)

    slot_d = jnp.stack([d0] + [s[0] for s in pop_slots] + [d7, d8]).astype(_i32)
    slot_t = jnp.stack([t0] + [s[1] for s in pop_slots] + [t7, t8]).astype(_u32)
    slot_m = jnp.stack([m0] + [s[2] for s in pop_slots] + [m7, m8])
    return state, slot_d, slot_t, slot_m


# --- chunked transcode with on-device compaction ----------------------------


def compact_slots(slot_d, slot_t, slot_m):
    """Compact (K, N) slots to (pixel, slot)-ordered dense event arrays.

    Returns (pix_idx (cap,) int32, d, t, count). Entries past `count` are
    filled with pix_idx = -1. cap = K*N (exact; callers slice by count).
    """
    K, N = slot_d.shape
    # (pixel, slot)-major flattening
    m = slot_m.T.reshape(-1)
    d = slot_d.T.reshape(-1)
    t = slot_t.T.reshape(-1)
    pix = jnp.repeat(jnp.arange(N, dtype=_i32), K)
    pos = jnp.cumsum(m.astype(_i32)) - 1
    count = jnp.sum(m.astype(_i32))
    idx = jnp.where(m, pos, K * N)
    out_pix = jnp.full((K * N,), -1, _i32).at[idx].set(pix, mode="drop")
    out_d = jnp.zeros((K * N,), _i32).at[idx].set(d, mode="drop")
    out_t = jnp.zeros((K * N,), _u32).at[idx].set(t, mode="drop")
    return out_pix, out_d, out_t, count


@functools.lru_cache(maxsize=64)
def make_transcode_chunk(p: TranscodeParams, event_cap: int):
    """Build a jittable function scanning T frames through the integrator,
    compacting events into a bounded (event_cap,) buffer on device.

    Replaces the reference's rayon row-chunk fan-out + serial encoder feed
    (ref: video.rs:651-778): the "chunk" is the whole plane; event order is
    the single-thread order.

    Returned fn: (state, intensities (T, N) f32, frame_vals (T, N) i32,
    time f32) -> (state, ev_pix, ev_d, ev_t, total, interval_counts (T,)).
    `total` > event_cap signals overflow (events beyond cap were dropped;
    caller should re-run the chunk from the checkpointed state with a larger
    cap).
    """

    def chunk_fn(state, intensities, frame_vals, time):
        def step(carry, inp):
            st, buf_pix, buf_d, buf_t, offset = carry
            intensity, fv = inp
            st, sd, stt, sm = integrate_interval(st, intensity, fv, time, p)
            K, N = sd.shape
            m = sm.T.reshape(-1)
            d = sd.T.reshape(-1)
            t = stt.T.reshape(-1)
            pix = jnp.repeat(jnp.arange(N, dtype=_i32), K)
            # two-level prefix sum: per-pixel slot counts, then across pixels
            counts = jnp.sum(sm, axis=0).astype(_i32)  # (N,)
            base = jnp.cumsum(counts) - counts  # exclusive
            rank = (jnp.cumsum(sm.astype(_i32), axis=0) - 1).T.reshape(-1)
            pos = offset + jnp.repeat(base, K) + rank
            idx = jnp.where(m, pos, event_cap)
            buf_pix = buf_pix.at[idx].set(pix, mode="drop")
            buf_d = buf_d.at[idx].set(d, mode="drop")
            buf_t = buf_t.at[idx].set(t, mode="drop")
            n_ev = jnp.sum(counts)
            return (st, buf_pix, buf_d, buf_t, offset + n_ev), n_ev

        buf_pix = jnp.full((event_cap,), -1, _i32)
        buf_d = jnp.zeros((event_cap,), _i32)
        buf_t = jnp.zeros((event_cap,), _u32)
        (state, buf_pix, buf_d, buf_t, total), per_interval = jax.lax.scan(
            step,
            (state, buf_pix, buf_d, buf_t, jnp.zeros((), _i32)),
            (intensities, frame_vals),
        )
        return state, buf_pix, buf_d, buf_t, total, per_interval

    return jax.jit(chunk_fn)
