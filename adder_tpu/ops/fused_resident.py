"""T-resident fused Pallas kernel: pixel state lives in VMEM across a chunk.

Round-2 profiling (NOTES.md / round-3 stage profile) showed the fused
kernel's cost is dominated by MEMORY MOVEMENT, not compute: at 1080p the
interval state machine adds ~0.3 ms while state HBM round-trips + the DMA
skeleton cost ~5.2 ms per interval, and the in-kernel pixel-major
interleave + full-capacity compaction add another ~3.8 ms. Two structural
changes eliminate most of that:

1. **T-blocking**: the grid becomes (n_blocks, T) with the interval index
   innermost. State block specs index only on the block coordinate, so
   Pallas keeps each pixel block's state IN VMEM across all T intervals of
   a chunk — state reads HBM once per chunk instead of once per interval
   (16x less state traffic at the default chunk length). At t==0 the
   kernel reads the state inputs; at t>0 it reads its own previous outputs
   (the output block is VMEM-resident until the block index changes).

2. **Per-slot event streams instead of the pixel-major interleave**: the
   old kernel interleaved K packed lanes to pixel-major staging (a stacked
   MXU matmul, ~2.3 ms) then log-shift-compacted a staging sized for the
   worst case (B*pack slots, ~1.5 ms). Here each slot lane j is compacted
   SEPARATELY: lane j of the block is already pixel-major flat order, so
   it needs no interleave at all, and its staging is B/128 rows (pack
   times smaller). Slot lanes j >= 1 are almost always empty (multi-event
   pixels in one interval are rare) and their whole compact+DMA pass is
   skipped via pl.when.

The cost: the event buffer is filled in (block, interval, slot, pixel)
order rather than the reference's (interval, block|pixel, slot) single
-thread order. Per-(block, interval) event counts come back with the
chunk, and `assemble_resident_events` restores the exact reference order
on the host (segment-ordered memcpys; within a segment a stable
sort-by-pixel is only needed when a multi-event pixel exists). Device
consumers that sort events anyway (the device framer) can skip assembly.

Ref for the semantics: adder-codec-rs/src/transcoder/source/video.rs:651-778
(integrate_matrix) and event_pixel_tree.rs:317-479; order contract
src/bin/adder_simulproc.rs:188.
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
from .fused_kernel import (
    _bitcast_i32,
    _bitcast_u32,
    _flat_shift_left,
    _rank_exclusive,
)


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _rank_exclusive_band(valid: jax.Array, gr: int):
    """Band-local exclusive flat prefix sum of a 0/1 (R, 128) array:
    like fused_kernel._rank_exclusive but the row-offset cumsum runs only
    WITHIN gr-row bands (log2(gr) row passes instead of log2(R)).
    Returns (rank, y) with y the inclusive within-band row cumsum."""
    R = valid.shape[0]
    lane = jax.lax.broadcasted_iota(_i32, valid.shape, 1)
    x = valid
    s = 1
    while s < 128:
        sh = pltpu.roll(x, shift=s, axis=1)
        x = x + jnp.where(lane >= s, sh, 0)
        s *= 2
    row_tot = x[:, 127:128]
    rowi = jax.lax.broadcasted_iota(_i32, (R, 1), 0)
    y = row_tot
    s = 1
    while s < gr:
        sh = pltpu.roll(y, shift=s, axis=0)
        y = y + jnp.where(rowi % gr >= s, sh, 0)
        s *= 2
    return x - valid + (y - row_tot), y


def _band_total_bcast(y: jax.Array, gr: int) -> jax.Array:
    """Broadcast each gr-row band's total (y at the band-end row) to every
    row of the band. y: (R, 1) inclusive within-band cumsum (from
    _rank_exclusive_band); counts are non-negative so a masked max-scan
    upward recovers the band-end value everywhere."""
    R = y.shape[0]
    rowi = jax.lax.broadcasted_iota(_i32, (R, 1), 0)
    t = jnp.where(rowi % gr == gr - 1, y, 0)
    s = 1
    while s < gr:
        sh = pltpu.roll(t, shift=(R - s) % max(R, 1), axis=0)
        t = jnp.maximum(t, jnp.where(rowi % gr < gr - s, sh, 0))
        s *= 2
    return t

DEPTH = ops.DEPTH
K = ops.K_SLOTS

_i32 = jnp.int32
_f32 = jnp.float32
_u32 = jnp.uint32
_u8 = jnp.uint8


def _kernel_body(p: ops.TranscodeParams, block: int, pack: int,
                 rows_cap: int, n_real: int, interpret: bool,
                 depth: int, emit_running: bool, debug_stage: int = 0,
                 dvs: bool = False, group_mode: bool = False):
    # group_mode: the STATIC-SEGMENT compactor (round-4 compaction
    # attempt): each (block, interval) owns a fixed JROWS-row buffer
    # segment; events pack band-locally (8-row bands, in-band shift
    # distances <= 1023 -> 10 passes instead of the 14 global ones) and
    # the whole staging DMAs to its static offset — no running offset, no
    # head/carry replay, no ordered overlapping-tail rewrites. Validity
    # rides buffer bit31 (host masks). A band whose events exceed its
    # 8*128 slots sets pmax bit 17 (caller falls back to the logshift
    # kernel for that chunk).
    # dvs=True: the interval axis carries DVS lane SUB-STEPS instead of
    # frames (SURVEY P5). The frames input becomes (T, 3, B) f32 planes
    # [intensity, ticks-spanned, fv | active<<8 bitcast]; each sub-step
    # integrates per-pixel time spans and only `active` pixels commit
    # state (masked-off pixels are restored from the pre-step values and
    # their slots suppressed — in-kernel ops/dvs_batch.masked_interval).
    # debug_stage (profiling only): 0 full | 1 skip compaction+DMA |
    # 2 also skip slot packing | 4 state+core only (no event handling)
    B = block
    SUB, LN = 8, B // 8
    JROWS = B // 128  # one lane per pixel per slot stream
    SROWS = JROWS + 1  # head row + event rows
    SROWS_PHYS = ((SROWS + 7) // 8) * 8  # DMA sublane-count constraint
    NPASS = (SROWS * 128 - 1).bit_length()

    def kernel(
        time_ref, off_in_ref,  # SMEM (1,1) f32, (1,) i32
        live_ref, frame_ref,  # VMEM (1, B) / (1, 1, B) u8
        nd_ref, ni_ref, ndt_ref, bd_ref, bdt_ref,  # (depth, B)
        length_ref, base_ref, cth_ref, cic_ref,  # (1, B) i32
        lft_ref, rt_ref,  # (1, B) f32
        need_ref, dtm_ref, popped_ref,  # (1, B) u8
        bufp_in, buft_in,  # ANY (rows_cap, 128) u32, aliased to outputs
        # outputs
        o_nd, o_ni, o_ndt, o_bd, o_bdt,
        o_length, o_base, o_cth, o_cic,
        o_lft, o_rt, o_need, o_dtm, o_popped,
        o_run_val, o_run_has,  # (1, B) u8 blocks of (T, n)
        o_counts,  # (1, 128) i32 block of (n_blocks, 128)
        o_bufp, o_buft,  # ANY aliased
        o_off, o_pmax,  # SMEM (1,) i32
        # scratch
        stgp0, stgt0, stgp1, stgt1,  # VMEM (SROWS_PHYS, 128) u32
        headp, headt,  # VMEM (1, 128) u32
        carryp, carryt,  # VMEM (1, 128) u32
        cntvec,  # VMEM (1, 128) i32
        dma_cnt,  # SMEM (1,) i32: flushes issued so far
        sem_out,  # DMA sems (2, 2)
        sem_in,  # DMA sems (2,)
    ):
        i = pl.program_id(0)
        t = pl.program_id(1)
        nb = pl.num_programs(0)
        nt = pl.num_programs(1)

        @pl.when((i == 0) & (t == 0))
        def _():
            o_off[0] = off_in_ref[0]
            o_pmax[0] = 0
            dma_cnt[0] = 0
            if not group_mode:
                # head replay: the current partial output row (zeros on a
                # fresh chunk); group mode has no running offset
                row0 = jnp.minimum(off_in_ref[0] // 128, rows_cap - 1)
                cp = pltpu.make_async_copy(
                    bufp_in.at[pl.ds(row0, 1)], headp, sem_in.at[0]
                )
                ct = pltpu.make_async_copy(
                    buft_in.at[pl.ds(row0, 1)], headt, sem_in.at[1]
                )
                cp.start()
                ct.start()
                cp.wait()
                ct.wait()

        at0 = t == 0
        r8 = lambda x: x.reshape(SUB, LN)
        r1 = lambda x: x.reshape(1, B)

        # state source: at t==0 copy the HBM input block into the output
        # block ONCE (a VMEM->VMEM move), then every interval reads the
        # output block (VMEM-resident across the t axis). A per-step
        # where(t==0, in, out) would double the state loads instead.
        @pl.when(at0)
        def _():
            for k in range(depth):
                o_nd[k : k + 1, :] = nd_ref[k : k + 1, :]
                o_ni[k : k + 1, :] = ni_ref[k : k + 1, :]
                o_ndt[k : k + 1, :] = ndt_ref[k : k + 1, :]
                o_bd[k : k + 1, :] = bd_ref[k : k + 1, :]
                o_bdt[k : k + 1, :] = bdt_ref[k : k + 1, :]
            o_length[:] = length_ref[:]
            o_base[:] = base_ref[:]
            o_cth[:] = cth_ref[:]
            o_cic[:] = cic_ref[:]
            o_lft[:] = lft_ref[:]
            o_rt[:] = rt_ref[:]
            o_need[:] = need_ref[:]
            o_dtm[:] = dtm_ref[:]
            o_popped[:] = popped_ref[:]

        def ldn(in_ref, out_ref, k):
            return r8(out_ref[k : k + 1, :])

        def ldf(in_ref, out_ref):
            return r8(out_ref[:])

        fences = numerics.pallas_fences("interpret" if interpret else "mosaic")
        fences.__enter__()
        try:
            s = ops._S()
            s.nd = [ldn(nd_ref, o_nd, k) for k in range(depth)]
            s.ni = [ldn(ni_ref, o_ni, k) for k in range(depth)]
            s.ndt = [ldn(ndt_ref, o_ndt, k) for k in range(depth)]
            s.bd = [ldn(bd_ref, o_bd, k) for k in range(depth)]
            s.bdt = [ldn(bdt_ref, o_bdt, k) for k in range(depth)]
            s.length = ldf(length_ref, o_length)
            s.base_val = ldf(base_ref, o_base)
            s.c_thresh = ldf(cth_ref, o_cth)
            s.cic = ldf(cic_ref, o_cic)
            s.lft = ldf(lft_ref, o_lft)
            s.running_t = ldf(rt_ref, o_rt)
            s.need_pop = ldf(need_ref, o_need) != 0
            s.dtm_reached = ldf(dtm_ref, o_dtm) != 0
            s.popped_dtm = ldf(popped_ref, o_popped) != 0
            s.overflow = jnp.zeros((), _i32)

            if dvs:
                # (1, 1, B) slices reshape cleanly to (8, LN) under Mosaic
                # (a 1-D -> 2-D vector reshape does not lower). The planes
                # ride i32 — small integers bitcast to f32 are DENORMALS,
                # which the TPU flushes to zero (observed: compiled kernel
                # read active=0 everywhere); normal floats bitcast to i32
                # and back are safe.
                wcol = 3 if dvs == "davis" else 2
                w = r8(frame_ref[:, wcol : wcol + 1, :])
                fv = w & 0xFF
                active = ((w >> 8) & 1) != 0
                old = ops._S()
                old.nd = list(s.nd)
                old.ni = list(s.ni)
                old.ndt = list(s.ndt)
                old.bd = list(s.bd)
                old.bdt = list(s.bdt)
                (
                    old.length, old.base_val, old.c_thresh, old.cic,
                    old.lft, old.running_t, old.need_pop, old.dtm_reached,
                    old.popped_dtm,
                ) = (
                    s.length, s.base_val, s.c_thresh, s.cic, s.lft,
                    s.running_t, s.need_pop, s.dtm_reached, s.popped_dtm,
                )
                if dvs == "davis":
                    # DAVIS op order (ref: davis.rs:235-465, in-kernel
                    # ops/dvs_batch.davis_event_interval): pop_top ->
                    # integrate(held intensity over the gap) -> pop_top ->
                    # contrast stage against the post-ln-step frame value
                    first_int = _bitcast_f32(r8(frame_ref[:, 0:1, :]))
                    dt_ticks = _bitcast_f32(r8(frame_ref[:, 1:2, :]))
                    fval = _bitcast_f32(r8(frame_ref[:, 2:3, :]))
                    d0, t0, m0 = ops._pop_top_event(
                        s, first_int, s.need_pop, p
                    )
                    ops._integrate(s, first_int, dt_ticks, p,
                                   ovf_mask=active)
                    d8, t8, m8 = ops._pop_top_event(
                        s, first_int, s.need_pop, p
                    )
                    bv, c = s.base_val, s.c_thresh
                    changed = active & (
                        (fv < jnp.maximum(bv - c, 0))
                        | (fv > jnp.minimum(bv + c, 255))
                    )
                    pop_slots = ops._pop_best_events(s, fval, changed, p)
                    s.base_val = jnp.where(changed, fv, s.base_val)
                    d7, t7, m7 = ops._set_d_for_continuous(
                        s, fval, changed, p
                    )
                    slots = (
                        [(d0, t0, m0), (d8, t8, m8)]
                        + list(pop_slots)
                        + [(d7, t7, m7)]
                    )
                    z = jnp.zeros_like(s.base_val)
                    run_val, run_has = z.astype(jnp.uint8), z != 0
                else:
                    intensity = _bitcast_f32(r8(frame_ref[:, 0:1, :]))
                    tspan = _bitcast_f32(r8(frame_ref[:, 1:2, :]))
                    slots, (run_val, run_has) = ops._interval_core(
                        s, intensity, fv, tspan, p,
                        emit_running=emit_running, ovf_mask=active,
                    )
                # only active pixels commit; the rest roll back (their
                # garbage inputs may have popped/moved c_thresh)
                for k in range(depth):
                    s.nd[k] = jnp.where(active, s.nd[k], old.nd[k])
                    s.ni[k] = jnp.where(active, s.ni[k], old.ni[k])
                    s.ndt[k] = jnp.where(active, s.ndt[k], old.ndt[k])
                    s.bd[k] = jnp.where(active, s.bd[k], old.bd[k])
                    s.bdt[k] = jnp.where(active, s.bdt[k], old.bdt[k])
                s.length = jnp.where(active, s.length, old.length)
                s.base_val = jnp.where(active, s.base_val, old.base_val)
                s.c_thresh = jnp.where(active, s.c_thresh, old.c_thresh)
                s.cic = jnp.where(active, s.cic, old.cic)
                s.lft = jnp.where(active, s.lft, old.lft)
                s.running_t = jnp.where(active, s.running_t, old.running_t)
                # bool selects lower poorly under Mosaic (i8->i1 trunc);
                # select in u8 and re-compare
                def _selb(a, b):
                    return jnp.where(
                        active, a.astype(_u8), b.astype(_u8)
                    ) != 0

                s.need_pop = _selb(s.need_pop, old.need_pop)
                s.dtm_reached = _selb(s.dtm_reached, old.dtm_reached)
                s.popped_dtm = _selb(s.popped_dtm, old.popped_dtm)
                slots = [(d, tt, m & active) for (d, tt, m) in slots]
            else:
                fv = r8(frame_ref[:]).astype(_i32)
                intensity = fv.astype(_f32)
                slots, (run_val, run_has) = ops._interval_core(
                    s, intensity, fv, time_ref[0, 0], p,
                    emit_running=emit_running,
                )

            for k in range(depth):
                o_nd[k : k + 1, :] = r1(s.nd[k])
                o_ni[k : k + 1, :] = r1(s.ni[k])
                o_ndt[k : k + 1, :] = r1(s.ndt[k])
                o_bd[k : k + 1, :] = r1(s.bd[k])
                o_bdt[k : k + 1, :] = r1(s.bdt[k])
            o_length[:] = r1(s.length)
            o_base[:] = r1(s.base_val)
            o_cth[:] = r1(s.c_thresh)
            o_cic[:] = r1(s.cic)
            o_lft[:] = r1(s.lft)
            o_rt[:] = r1(s.running_t)
            o_need[:] = r1(s.need_pop.astype(_u8))
            o_dtm[:] = r1(s.dtm_reached.astype(_u8))
            o_popped[:] = r1(s.popped_dtm.astype(_u8))
            o_run_val[:] = run_val.reshape(1, 1, B)
            o_run_has[:] = run_has.astype(_u8).reshape(1, 1, B)
            depth_ovf = s.overflow
        finally:
            fences.__exit__()

        if debug_stage >= 4:
            o_counts[:] = jnp.zeros((1, 1, 128), _i32)
            return

        # ---- event slots -> per-pixel left-packed lanes ----
        pix = i * B + (
            jax.lax.broadcasted_iota(_i32, (SUB, LN), 0) * LN
            + jax.lax.broadcasted_iota(_i32, (SUB, LN), 1)
        )
        if n_real:
            live = r8(live_ref[:]) != 0
            slots = [(d, tt, m & live) for (d, tt, m) in slots]

        pixd = [
            ((pix << 8) | (d & 0xFF), _bitcast_i32(tt), m)
            for (d, tt, m) in slots
        ]
        n_slots = len(pixd)
        cnt = jnp.zeros((SUB, LN), _i32)
        if debug_stage >= 2:
            z = jnp.zeros((SUB, LN), _i32)
            pd = [z] * pack
            pt = [z] * pack
            mw = z
        elif pack < n_slots:
            pd = [jnp.zeros((SUB, LN), _i32) for _ in range(pack)]
            pt = [jnp.zeros((SUB, LN), _i32) for _ in range(pack)]
            for pd_k, t_k, m_k in pixd:
                for j in range(pack):
                    place = m_k & (cnt == j)
                    pd[j] = jnp.where(place, pd_k, pd[j])
                    pt[j] = jnp.where(place, t_k, pt[j])
                cnt = cnt + m_k.astype(_i32)
            mw = (1 << jnp.minimum(cnt, pack)) - 1
        else:
            pd = [x[0] for x in pixd] + [
                jnp.zeros((SUB, LN), _i32) for _ in range(pack - len(pixd))
            ]
            pt = [x[1] for x in pixd] + [
                jnp.zeros((SUB, LN), _i32) for _ in range(pack - len(pixd))
            ]
            mw = jnp.zeros((SUB, LN), _i32)
            for k, (_, _, m_k) in enumerate(pixd):
                mw = mw | (m_k.astype(_i32) << k)
                cnt = cnt + m_k.astype(_i32)

        prev = o_pmax[0]
        o_pmax[0] = (
            jnp.maximum(prev & 0xFFFF, jnp.max(cnt))
            | (prev & (1 << 16))
            | jnp.where(depth_ovf > 0, 1 << 16, 0)
        )

        # ---- per-(block, interval) event count ----
        valids = [((mw >> j) & 1) for j in range(pack)]
        n_js = [jnp.sum(v) for v in valids]
        n_tot = sum(n_js)
        lane128 = jax.lax.broadcasted_iota(_i32, (1, 128), 1)
        prevv = jnp.where(
            at0, jnp.zeros((1, 128), _i32), cntvec[:]
        )
        vec = prevv + jnp.where(lane128 == t, n_tot, 0)
        cntvec[:] = vec
        o_counts[:] = vec.reshape(1, 1, 128)

        # ---- group mode: lane 0 packs band-locally into its (block,
        # interval)'s STATIC buffer segment; lanes >= 1 (rare) fall through
        # to the running-offset tail region below ----
        if group_mode:
            # 8-row bands: in-band distances <= 1023 (10 shift passes) and
            # a 3-pass band row-scan. GR=1 (pure lane-roll shifts, 14
            # passes total) measured 4x SLOWER compiled — Mosaic lowers
            # the dense (64,128) lane rolls far worse than the
            # flat-shift roll pairs; see NOTES round-4 compaction table
            GR = min(8, JROWS)
            GSZ = GR * 128
            NP_B = (GSZ - 1).bit_length()
            fband = (
                (jax.lax.broadcasted_iota(_i32, (JROWS, 128), 0) % GR) * 128
                + jax.lax.broadcasted_iota(_i32, (JROWS, 128), 1)
            )
            main_row0 = (i * nt + t) * SROWS_PHYS

            def group_flush(stg_p, stg_t, sems, other_p, other_t,
                            other_sems):
                fp = pd[0].reshape(JROWS, 128)
                ft = pt[0].reshape(JROWS, 128)
                fvalid = valids[0].reshape(JROWS, 128)
                # lane 0 has at most one event per pixel, so a band's
                # count never exceeds its GSZ slots: dist >= 0 always
                rank, _y = _rank_exclusive_band(fvalid, GR)
                sign = jnp.int32(-0x80000000)
                cp = fp | (fvalid << 31)
                ct_ = ft
                cd = fband - rank
                for bi in range(NP_B):
                    step = 1 << bi
                    if GR == 1:
                        sh1 = lambda x: pltpu.roll(
                            x, shift=128 - step, axis=1
                        )
                        sp, st, sd = sh1(cp), sh1(ct_), sh1(cd)
                    else:
                        sp = _flat_shift_left(cp, step)
                        st = _flat_shift_left(ct_, step)
                        sd = _flat_shift_left(cd, step)
                    take = (
                        (sp < 0)
                        & (fband < GSZ - step)
                        & (((sd >> bi) & 1) != 0)
                    )
                    stay = (cp < 0) & (((cd >> bi) & 1) == 0)
                    cp = jnp.where(
                        take, sp, jnp.where(stay, cp, cp & ~sign)
                    )
                    ct_ = jnp.where(take, st, ct_)
                    cd = jnp.where(take, sd - step, cd)
                # bit31 stays SET on packed events: buffer validity marker
                # (the host masks it; pix < 2^23 keeps the bit free)
                stg_p[:JROWS] = _bitcast_u32(cp)
                stg_t[:JROWS] = _bitcast_u32(ct_)
                if SROWS_PHYS > JROWS:
                    # pad rows of the segment must not carry stale bit31s
                    stg_p[JROWS:SROWS_PHYS] = jnp.zeros(
                        (SROWS_PHYS - JROWS, 128), _u32
                    )
                    stg_t[JROWS:SROWS_PHYS] = jnp.zeros(
                        (SROWS_PHYS - JROWS, 128), _u32
                    )

                # same single-outstanding-DMA discipline as do_flush: by
                # induction the wait at issue k-1 covered copy k-2, so
                # stg_p/stg_t are reusable here
                @pl.when(dma_cnt[0] > 0)
                def _():
                    pltpu.make_async_copy(
                        other_p, o_bufp.at[pl.ds(main_row0, SROWS_PHYS)],
                        other_sems[0],
                    ).wait()
                    pltpu.make_async_copy(
                        other_t, o_buft.at[pl.ds(main_row0, SROWS_PHYS)],
                        other_sems[1],
                    ).wait()

                pltpu.make_async_copy(
                    stg_p, o_bufp.at[pl.ds(main_row0, SROWS_PHYS)], sems[0]
                ).start()
                pltpu.make_async_copy(
                    stg_t, o_buft.at[pl.ds(main_row0, SROWS_PHYS)], sems[1]
                ).start()
                dma_cnt[0] = dma_cnt[0] + 1

            par_g = jax.lax.rem(dma_cnt[0], 2)
            go_g = n_js[0] > 0

            @pl.when(go_g & (par_g == 0))
            def _():
                group_flush(
                    stgp0, stgt0,
                    (sem_out.at[0, 0], sem_out.at[0, 1]),
                    stgp1, stgt1,
                    (sem_out.at[1, 0], sem_out.at[1, 1]),
                )

            @pl.when(go_g & (par_g == 1))
            def _():
                group_flush(
                    stgp1, stgt1,
                    (sem_out.at[1, 0], sem_out.at[1, 1]),
                    stgp0, stgt0,
                    (sem_out.at[0, 0], sem_out.at[0, 1]),
                )

        # ---- per-slot-stream compaction + ordered DMA append ----
        f_flat = (
            jax.lax.broadcasted_iota(_i32, (JROWS, 128), 0) * 128
            + jax.lax.broadcasted_iota(_i32, (JROWS, 128), 1)
        )
        lane1 = jax.lax.broadcasted_iota(_i32, (1, 128), 1)
        total_sz = SROWS * 128
        rowf = jax.lax.broadcasted_iota(_i32, (SROWS, 128), 0) * 128 + (
            jax.lax.broadcasted_iota(_i32, (SROWS, 128), 1)
        )

        def do_flush(j, n_j, stg_p, stg_t, sems, other_p, other_t,
                     other_sems):
            off = o_off[0]
            q = jax.lax.rem(off, 128)
            fp = pd[j].reshape(JROWS, 128)
            ft = pt[j].reshape(JROWS, 128)
            fvalid = valids[j].reshape(JROWS, 128)
            rank = _rank_exclusive(fvalid)
            # staging position of source element = 128 + f (head first);
            # destination = q + rank; distance non-negative and monotone
            dist_ev = 128 + f_flat - q - rank

            first_dma = dma_cnt[0] == 0
            hp = jnp.where(
                first_dma, _bitcast_i32(headp[:]), _bitcast_i32(carryp[:])
            )
            ht = jnp.where(
                first_dma, _bitcast_i32(headt[:]), _bitcast_i32(carryt[:])
            )
            hv = (lane1 < q).astype(_i32)

            # validity rides the pixd sign bit (pix < 2^23 keeps bit 31
            # free): one fewer array to move through every shift pass
            sign = jnp.int32(-0x80000000)
            cp = jnp.concatenate(
                [hp & ~sign | (hv << 31), fp | (fvalid << 31)], axis=0
            )  # (SROWS, 128)
            ct_ = jnp.concatenate([ht, ft], axis=0)
            cd = jnp.concatenate([jnp.zeros((1, 128), _i32), dist_ev], axis=0)

            for bi in range(NPASS):
                step = 1 << bi
                sp = _flat_shift_left(cp, step)
                st = _flat_shift_left(ct_, step)
                sd = _flat_shift_left(cd, step)
                take = (
                    (sp < 0)
                    & (rowf < total_sz - step)
                    & (((sd >> bi) & 1) != 0)
                )
                stay = (cp < 0) & (((cd >> bi) & 1) == 0)
                cp = jnp.where(
                    take, sp, jnp.where(stay, cp, cp & ~sign)
                )
                ct_ = jnp.where(take, st, ct_)
                cd = jnp.where(take, sd - step, cd)

            end = q + n_j
            last_row = end // 128  # < SROWS
            row0c = jnp.minimum(off // 128, rows_cap - SROWS_PHYS)

            stg_p[:SROWS] = _bitcast_u32(cp & ~sign)
            stg_t[:SROWS] = _bitcast_u32(ct_)
            carryp[:] = stg_p[pl.ds(last_row, 1), :]
            carryt[:] = stg_t[pl.ds(last_row, 1), :]

            # overlapping tail rewrite requires strict DMA ordering: wait
            # for the previous flush (the other buffer) before issuing
            @pl.when(jnp.logical_not(first_dma))
            def _():
                pltpu.make_async_copy(
                    other_p, o_bufp.at[pl.ds(row0c, SROWS_PHYS)],
                    other_sems[0],
                ).wait()
                pltpu.make_async_copy(
                    other_t, o_buft.at[pl.ds(row0c, SROWS_PHYS)],
                    other_sems[1],
                ).wait()

            pltpu.make_async_copy(
                stg_p, o_bufp.at[pl.ds(row0c, SROWS_PHYS)], sems[0]
            ).start()
            pltpu.make_async_copy(
                stg_t, o_buft.at[pl.ds(row0c, SROWS_PHYS)], sems[1]
            ).start()

            o_off[0] = off + n_j
            dma_cnt[0] = dma_cnt[0] + 1

        j_lanes = range(1 if group_mode else 0,
                        pack if debug_stage < 1 else 0)
        for j in j_lanes:
            par = jax.lax.rem(dma_cnt[0], 2)
            go = n_js[j] > 0

            @pl.when(go & (par == 0))
            def _(j=j):
                do_flush(
                    j, n_js[j], stgp0, stgt0,
                    (sem_out.at[0, 0], sem_out.at[0, 1]),
                    stgp1, stgt1,
                    (sem_out.at[1, 0], sem_out.at[1, 1]),
                )

            @pl.when(go & (par == 1))
            def _(j=j):
                do_flush(
                    j, n_js[j], stgp1, stgt1,
                    (sem_out.at[1, 0], sem_out.at[1, 1]),
                    stgp0, stgt0,
                    (sem_out.at[0, 0], sem_out.at[0, 1]),
                )

        # ---- end-of-grid drain: only the final flush is outstanding ----
        @pl.when((i == nb - 1) & (t == nt - 1) & (dma_cnt[0] > 0))
        def _():
            lastpar = jax.lax.rem(dma_cnt[0] - 1, 2)

            @pl.when(lastpar == 0)
            def _():
                pltpu.make_async_copy(
                    stgp0, o_bufp.at[pl.ds(0, SROWS_PHYS)], sem_out.at[0, 0]
                ).wait()
                pltpu.make_async_copy(
                    stgt0, o_buft.at[pl.ds(0, SROWS_PHYS)], sem_out.at[0, 1]
                ).wait()

            @pl.when(lastpar == 1)
            def _():
                pltpu.make_async_copy(
                    stgp1, o_bufp.at[pl.ds(0, SROWS_PHYS)], sem_out.at[1, 0]
                ).wait()
                pltpu.make_async_copy(
                    stgt1, o_buft.at[pl.ds(0, SROWS_PHYS)], sem_out.at[1, 1]
                ).wait()

    return kernel


@functools.lru_cache(maxsize=32)
def make_resident_call(
    p: ops.TranscodeParams,
    n: int,
    rows_cap: int,
    T: int,
    block: int = 4096,
    pack: int = 4,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = DEPTH,
    emit_running: bool = True,
    debug_stage: int = 0,
    dvs: bool = False,
    group_mode: bool = False,
):
    """Build the T-resident chunk kernel call for an N-pixel plane.

    Signature: (state, frames (T, n) u8, time f32, bufp, buft, offset) ->
    (state, bufp, buft, off, pmax, counts (n_blocks, 128) i32,
    run_val (T, n) u8, run_has (T, n) u8).

    Events land in bufp/buft at [offset, off) in (block, interval, slot,
    pixel) order; counts[i, t] is block i's event count in interval t
    (see assemble_resident_events)."""
    assert n % block == 0, (n, block)
    assert block % 128 == 0 and block % 8 == 0
    assert T <= 128, "counts vector holds one lane per interval"
    n_blocks = n // block
    grid = (n_blocks, T)
    B = block
    SROWS_PHYS = ((B // 128 + 1 + 7) // 8) * 8

    def depth_spec():
        return pl.BlockSpec(
            (depth, B), lambda i, t: (0, i), memory_space=pltpu.VMEM
        )

    def flat_spec():
        return pl.BlockSpec(
            (1, B), lambda i, t: (0, i), memory_space=pltpu.VMEM
        )

    def tflat_spec(c: int = 1):
        # (T, c, n) arrays with (1, c, B) blocks: Mosaic requires the last
        # two block dims divisible by (8, 128) or equal to the array dims,
        # so the T axis must sit in a leading position
        return pl.BlockSpec(
            (1, c, B), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
        )

    chans = 4 if dvs == "davis" else (3 if dvs else 1)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offset_in
        flat_spec(),  # live
        tflat_spec(chans),  # frames (T, n) u8 | dvs planes (T, 3, n) f32
        depth_spec(), depth_spec(), depth_spec(), depth_spec(), depth_spec(),
        flat_spec(), flat_spec(), flat_spec(), flat_spec(),
        flat_spec(), flat_spec(),
        flat_spec(), flat_spec(), flat_spec(),
        pl.BlockSpec(memory_space=pl.ANY),  # bufp
        pl.BlockSpec(memory_space=pl.ANY),  # buft
    ]
    out_specs = (
        depth_spec(), depth_spec(), depth_spec(), depth_spec(), depth_spec(),
        flat_spec(), flat_spec(), flat_spec(), flat_spec(),
        flat_spec(), flat_spec(), flat_spec(), flat_spec(), flat_spec(),
        tflat_spec(), tflat_spec(),  # run_val, run_has (T, n)
        pl.BlockSpec(
            (1, 1, 128), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
        ),  # counts
        pl.BlockSpec(memory_space=pl.ANY),  # bufp
        pl.BlockSpec(memory_space=pl.ANY),  # buft
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offset_out
        pl.BlockSpec(memory_space=pltpu.SMEM),  # pack_max
    )
    out_shape = (
        jax.ShapeDtypeStruct((depth, n), _i32),
        jax.ShapeDtypeStruct((depth, n), _f32),
        jax.ShapeDtypeStruct((depth, n), _f32),
        jax.ShapeDtypeStruct((depth, n), _i32),
        jax.ShapeDtypeStruct((depth, n), _f32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _i32),
        jax.ShapeDtypeStruct((1, n), _f32),
        jax.ShapeDtypeStruct((1, n), _f32),
        jax.ShapeDtypeStruct((1, n), _u8),
        jax.ShapeDtypeStruct((1, n), _u8),
        jax.ShapeDtypeStruct((1, n), _u8),
        jax.ShapeDtypeStruct((T, 1, n), _u8),
        jax.ShapeDtypeStruct((T, 1, n), _u8),
        jax.ShapeDtypeStruct((n_blocks, 1, 128), _i32),
        jax.ShapeDtypeStruct((rows_cap, 128), _u32),
        jax.ShapeDtypeStruct((rows_cap, 128), _u32),
        jax.ShapeDtypeStruct((1,), _i32),
        jax.ShapeDtypeStruct((1,), _i32),
    )
    scratch_shapes = [
        pltpu.VMEM((SROWS_PHYS, 128), _u32), pltpu.VMEM((SROWS_PHYS, 128), _u32),
        pltpu.VMEM((SROWS_PHYS, 128), _u32), pltpu.VMEM((SROWS_PHYS, 128), _u32),
        pltpu.VMEM((1, 128), _u32), pltpu.VMEM((1, 128), _u32),
        pltpu.VMEM((1, 128), _u32), pltpu.VMEM((1, 128), _u32),
        pltpu.VMEM((1, 128), _i32),
        pltpu.SMEM((1,), _i32),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    call = pl.pallas_call(
        _kernel_body(p, block, pack, rows_cap, n_real, interpret,
                     depth, emit_running, debug_stage, dvs=dvs,
                     group_mode=group_mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        input_output_aliases={18: 17, 19: 18},
        interpret=interpret,
    )

    live_np = (np.arange(n) < (n_real or n)).astype(np.uint8).reshape(1, n)

    def step(state: ops.PixelState, frames, time, bufp, buft, offset):
        time2d = jnp.asarray(time, _f32).reshape(1, 1)
        off1 = jnp.asarray(offset, _i32).reshape(1)
        outs = call(
            time2d, off1, jnp.asarray(live_np),
            frames.reshape(T, chans, n),
            state.node_d, state.node_integ, state.node_dt,
            state.best_d, state.best_dt,
            state.length.reshape(1, n).astype(_i32),
            state.base_val.reshape(1, n),
            state.c_thresh.reshape(1, n),
            state.c_increase_counter.reshape(1, n),
            state.last_fired_t.reshape(1, n),
            state.running_t.reshape(1, n),
            state.need_pop.reshape(1, n).astype(_u8),
            state.dtm_reached.reshape(1, n).astype(_u8),
            state.popped_dtm.reshape(1, n).astype(_u8),
            bufp, buft,
        )
        (
            nd, ni, ndt, bd, bdt, length, base, cth, cic, lft, rt,
            need, dtm, popped, run_val, run_has, counts,
            bufp, buft, off_out, pmax,
        ) = outs
        new_state = ops.PixelState(
            node_d=nd, node_integ=ni, node_dt=ndt, best_d=bd, best_dt=bdt,
            length=length.reshape(n), base_val=base.reshape(n),
            c_thresh=cth.reshape(n), c_increase_counter=cic.reshape(n),
            last_fired_t=lft.reshape(n), running_t=rt.reshape(n),
            need_pop=need.reshape(n) != 0,
            dtm_reached=dtm.reshape(n) != 0,
            popped_dtm=popped.reshape(n) != 0,
            overflow=state.overflow,
        )
        return (
            new_state, bufp, buft, off_out[0], pmax[0],
            counts.reshape(-1, 128),
            run_val.reshape(T, n), run_has.reshape(T, n),
        )

    return step


@functools.lru_cache(maxsize=64)
def make_fused_chunk_resident(
    p: ops.TranscodeParams,
    event_cap: int,
    pack: int = 4,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = DEPTH,
    emit_running: bool = True,
    debug_stage: int = 0,
):
    """T-resident variant of ops.make_fused_chunk: one pallas_call per
    chunk, state VMEM-resident across the chunk's intervals.

    Signature matches make_fused_chunk plus a trailing `counts`
    (n_blocks, T) i32 output:
    (state, frames (T, N) u8, time f32, run0 (N,) u8) ->
    (state, ev_pixd, ev_t, ev_t16, t_base, t16_ok, total, per_interval,
    runnings, pack_max, counts).

    The event buffer prefix [0, total) is in (block, interval, slot,
    pixel) order — run it through `assemble_resident_events(pixd, t,
    counts)` on the host to recover the reference single-thread order.
    Overflow semantics match make_fused_chunk (total > event_cap, and
    pack_max's low 16 bits / bit 16 for slot and arena-depth overflow)."""
    srows_phys = ((pallas_block // 128 + 1 + 7) // 8) * 8
    rows_cap = -(-event_cap // 128) + srows_phys

    def chunk_fn(state, frames, time, run0):
        T, n = frames.shape
        fstep = make_resident_call(
            p, n, rows_cap, T, pallas_block, pack, n_real, interpret,
            depth=depth, emit_running=emit_running, debug_stage=debug_stage,
        )
        bufp0 = jnp.zeros((rows_cap, 128), _u32)
        buft0 = jnp.zeros((rows_cap, 128), _u32)
        (
            state, bufp, buft, total, pmax, counts, run_val, run_has,
        ) = fstep(state, frames, time, bufp0, buft0, jnp.zeros((), _i32))
        counts = counts[:, :T]  # (n_blocks, T)
        per_interval = counts.sum(axis=0)

        if emit_running:
            def rstep(run, xs):
                rv, rh = xs
                run = jnp.where(rh != 0, rv, run)
                return run, run

            _, runnings = jax.lax.scan(rstep, run0, (run_val, run_has))
        else:
            # running-intensity outputs are all-zero; skip the carry scan
            runnings = run_val

        buf_pixd = bufp.reshape(-1)[:event_cap]
        buf_t = buft.reshape(-1)[:event_cap]
        buf_t16, t_base, t16_ok = ops._finish_chunk(
            buf_pixd, buf_t, total, event_cap
        )
        return (
            state, buf_pixd, buf_t, buf_t16, t_base, t16_ok, total,
            per_interval, runnings, pmax, counts,
        )

    return jax.jit(chunk_fn)


@functools.lru_cache(maxsize=32)
def make_group_chunk_resident(
    p: ops.TranscodeParams,
    tail_cap: int,
    pack: int = 4,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = DEPTH,
    emit_running: bool = False,
):
    """Round-4 compaction-attempt variant of make_fused_chunk_resident:
    STATIC buffer segments per (block, interval) — slot lane 0 packs
    band-locally (in-band distances, fewer/cheaper shift passes, no
    running offset / head-carry replay / ordered tail rewrites) with
    buffer bit31 as the validity marker; lanes >= 1 (rare multi-event
    pixels) append to a small running tail region with the logshift
    machinery. tail_cap bounds the tail events (tail_used > tail_cap
    signals overflow; rerun with a doubled tail).

    Signature: (state, frames (T, N) u8, time f32, run0 (N,) u8) ->
    (state, bufp (rows, 128) u32, buft, total, tail_used, per_interval,
    pack_max, counts). Decode with assemble_group_events."""
    srows_phys = ((pallas_block // 128 + 1 + 7) // 8) * 8
    tail_rows = -(-tail_cap // 128) + srows_phys

    def chunk_fn(state, frames, time, run0):
        T, n = frames.shape
        nb = n // pallas_block
        main_rows = nb * T * srows_phys
        rows_cap = main_rows + tail_rows
        fstep = make_resident_call(
            p, n, rows_cap, T, pallas_block, pack, n_real, interpret,
            depth=depth, emit_running=emit_running, group_mode=True,
        )
        bufp0 = jnp.zeros((rows_cap, 128), _u32)
        buft0 = jnp.zeros((rows_cap, 128), _u32)
        (
            state, bufp, buft, off_out, pmax, counts, run_val, run_has,
        ) = fstep(
            state, frames, time, bufp0, buft0,
            jnp.asarray(main_rows * 128, _i32),
        )
        counts = counts[:, :T]
        per_interval = counts.sum(axis=0)
        total = per_interval.sum()
        tail_used = off_out - main_rows * 128
        return (
            state, bufp, buft, total, tail_used, per_interval, pmax,
            counts,
        )

    return jax.jit(chunk_fn)


def assemble_group_events(bufp: np.ndarray, buft: np.ndarray,
                          counts: np.ndarray, pallas_block: int,
                          tail_used: int):
    """Host decode of make_group_chunk_resident buffers into the reference
    single-thread order (interval-major, raster pixel, per-pixel slot
    order). bufp bit31 marks valid lane-0 events in the static segments;
    the tail region carries lanes >= 1 as a contiguous prefix. Test-grade
    (python loop over segments); the production consumer is the chained
    no-fetch path."""
    counts = np.asarray(counts)
    nb, T = counts.shape
    srows_phys = ((pallas_block // 128 + 1 + 7) // 8) * 8
    seg = srows_phys * 128
    main = nb * T * seg
    bp = np.asarray(bufp).reshape(-1)
    bt = np.asarray(buft).reshape(-1)
    mp = bp[:main].reshape(nb, T, seg)
    mt = bt[:main].reshape(nb, T, seg)
    valid = (mp & 0x80000000) != 0
    lane0 = valid.sum(axis=2)
    tail_counts = counts - lane0
    tp = bp[main : main + int(tail_used)]
    tt = bt[main : main + int(tail_used)]
    tail_off = np.concatenate(
        [[0], np.cumsum(tail_counts.reshape(-1))]
    ).astype(np.int64)
    out_p: list = []
    out_t: list = []
    for t in range(T):
        for i in range(nb):
            m = valid[i, t]
            p_seg = (mp[i, t][m] & 0x7FFFFFFF).astype(np.uint32)
            t_seg = mt[i, t][m]
            s = i * T + t  # tail produced in (i, t) grid order
            a, b = tail_off[s], tail_off[s + 1]
            if b > a:
                p_seg = np.concatenate([p_seg, tp[a:b]])
                t_seg = np.concatenate([t_seg, tt[a:b]])
                o = np.argsort(
                    (p_seg >> 8).astype(np.int64), kind="stable"
                )
                p_seg, t_seg = p_seg[o], t_seg[o]
            out_p.append(p_seg)
            out_t.append(t_seg)
    return np.concatenate(out_p), np.concatenate(out_t)


@functools.lru_cache(maxsize=32)
def make_dvs_chunk_resident(
    p: ops.TranscodeParams,
    event_cap: int,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = 16,
):
    """DVS lanes through the T-resident kernel (SURVEY P5): the interval
    axis carries lane sub-steps — per-pixel (intensity, ticks-spanned,
    fv, active) planes — with state VMEM-resident across the whole batch
    and per-slot in-kernel compaction, replacing the XLA scan path whose
    per-sub-step compaction scales with the event-capacity bound.

    Signature: (state, intensity (T, N) f32, tspan (T, N) f32,
    fvw (T, N) i32 [fv | active << 8]) ->
    (state, ev_pixd, ev_t, total, per_interval, pack_max, counts).
    The three planes ship device-side as ONE (T, 3, N) i32 array (the f32
    planes bitcast): integers bitcast to f32 are denormals and the TPU
    flushes them to zero.

    Slot lanes = depth + 3 (every event a sub-step can emit has its own
    lane), so there is no packed-lane overflow; `total > event_cap` is the
    only overflow (caller reruns with a larger cap). Event buffer order is
    (block, sub-step, slot, pixel) — assemble_resident_events restores
    (sub-step, pixel, slot), which is each pixel's chronological order
    (lane k = the pixel's k-th event of the batch).
    Ref semantics: adder-codec-rs/src/transcoder/source/prophesee.rs:116-297.
    """
    pack = depth + 3
    srows_phys = ((pallas_block // 128 + 1 + 7) // 8) * 8
    rows_cap = -(-event_cap // 128) + srows_phys

    def chunk_fn(state, intensity, tspan, fvw):
        T, n = intensity.shape
        fstep = make_resident_call(
            p, n, rows_cap, T, pallas_block, pack, n_real, interpret,
            depth=depth, emit_running=False, dvs=True,
        )
        bc = lambda x: jax.lax.bitcast_convert_type(x, _i32)
        frames = jnp.stack([bc(intensity), bc(tspan), fvw], axis=1)
        bufp0 = jnp.zeros((rows_cap, 128), _u32)
        buft0 = jnp.zeros((rows_cap, 128), _u32)
        (
            state, bufp, buft, total, pmax, counts, _rv, _rh,
        ) = fstep(state, frames, jnp.float32(0.0), bufp0, buft0,
                  jnp.zeros((), _i32))
        counts = counts[:, :T]
        per_interval = counts.sum(axis=0)
        buf_pixd = bufp.reshape(-1)[:event_cap]
        buf_t = buft.reshape(-1)[:event_cap]
        return state, buf_pixd, buf_t, total, per_interval, pmax, counts

    return jax.jit(chunk_fn)


@functools.lru_cache(maxsize=32)
def make_dvs_chunk_resident_compact(
    p: ops.TranscodeParams,
    event_cap: int,
    T: int,
    n: int,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = 16,
):
    """make_dvs_chunk_resident fed by COMPACT per-event rows instead of
    host-built dense planes: the (T, N) lane planes are scattered on
    DEVICE from (E,) arrays, so host->device volume is O(events) — the
    round-3 e2e path shipped 3 dense (T, N) f32 planes per window
    (~24*T*N bytes), which strangled the whole DVS pipeline on a slow
    link (round-3 verdict item 1; ref: prophesee.rs:116-297).

    Signature: (state, pix (E,) i32, lane (E,) i32,
    gap_on (E,) bool, gap_fv i32, gap_int f32, gap_time f32,
    tick_on bool, tick_fv i32, tick_int f32) ->
    (state, ev_pixd, ev_t, total, per_interval, pack_max, counts).
    The tick sub-step's time span is ALWAYS p.ref_time (one source tick,
    prophesee.rs:243), so no tick_time array ships — it is derived on
    device. Rows with gap_on/tick_on False (padding included) scatter
    nowhere. Event/overflow semantics identical to
    make_dvs_chunk_resident."""
    inner = make_dvs_chunk_resident(
        p, event_cap, pallas_block, n_real, interpret, depth
    )

    def chunk_fn(state, pix, lane, gap_on, gap_fv, gap_int, gap_time,
                 tick_on, tick_fv, tick_int):
        inten, tsp, fvw = build_dvs_planes(
            T, n, pix, lane, gap_on, gap_fv, gap_int, gap_time,
            tick_on, tick_fv, tick_int, None, ref_time=p.ref_time,
        )
        return inner(state, inten, tsp, fvw)

    return jax.jit(chunk_fn)


def build_dvs_planes(T, n, pix, lane, gap_on, gap_fv, gap_int, gap_time,
                     tick_on, tick_fv, tick_int, tick_time, *,
                     ref_time=None):
    """Device-side scatter of compact DVS rows into the (T, N) lane planes
    [intensity, ticks-spanned, fv | active << 8] — gap sub-step at row
    2*lane, tick at 2*lane+1 (the exact layout the host dense path builds
    from stack_lanes; pinned equal by tests/test_dvs_batch.py)."""
    nn = jnp.int32(n)
    pix = pix.astype(_i32)
    lane = lane.astype(_i32)
    # flat (T*N) destination per sub-step; inactive rows -> distinct OOB
    # slots (T*n + row index), dropped by scatter mode=drop. Distinct
    # sentinels keep ALL indices unique — each (lane, pixel) carries at
    # most one gap and one tick row by planner construction — which lets
    # XLA lower the scatter without the duplicate-combining path (measured
    # 177 -> 12 ms for 800K updates on the v5 chip).
    E = jnp.int32(pix.shape[0])
    oob = jnp.int32(T * n) + jnp.arange(pix.shape[0], dtype=_i32)
    gdst = jnp.where(gap_on, (2 * lane) * nn + pix, oob)
    tdst = jnp.where(tick_on, (2 * lane + 1) * nn + pix, oob + E)
    dst = jnp.concatenate([gdst, tdst])

    def plane(gv, tv, dtype):
        z = jnp.zeros((T * n,), dtype)
        vals = jnp.concatenate([gv.astype(dtype), tv.astype(dtype)])
        return z.at[dst].set(
            vals, mode="drop", unique_indices=True
        ).reshape(T, n)

    if tick_time is None:
        # one source tick per tick sub-step (prophesee.rs:243): constant
        # p.ref_time — derived here instead of shipping an (E,) array
        tick_time = jnp.full(tick_on.shape, jnp.float32(ref_time), _f32)
    inten = plane(gap_int, tick_int, _f32)
    tsp = plane(gap_time, tick_time, _f32)
    fvw = plane(
        gap_fv | (gap_on.astype(_i32) << 8),
        tick_fv | (tick_on.astype(_i32) << 8),
        _i32,
    )
    return inten, tsp, fvw


@functools.lru_cache(maxsize=32)
def make_dvs_chunk_resident_packed(
    p: ops.TranscodeParams,
    event_cap: int,
    T: int,
    n: int,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = 16,
):
    """make_dvs_chunk_resident_compact fed by ONE (9, E) i32 carrier
    instead of nine (E,) arrays. Through a high-latency link every
    device_put is a synchronous RPC (~tens of ms regardless of size,
    measured on this harness), so the compact path's 9 uploads per window
    dominated the DVS e2e wall clock; the carrier makes it one.

    The link is both latency- AND bandwidth-taxed, so the carrier is
    dense — 20 bytes/event in 5 i32 rows:
      row 0 meta: pix | lane << 20 | gap_on << 27 | tick_on << 28
                  (pix < 2^20, lane < 128 — guaranteed by the <=64/128
                  lane groups and DVS plane sizes; pack_dvs_plan asserts)
      row 1 fvs:  gap_fv | tick_fv << 8 (both in [0, 255])
      rows 2-4:   bits(gap_int), bits(gap_time), bits(tick_int) — f32
                  fields travel as their i32 bit patterns (host
                  `.view(np.int32)`, bitcast back in-graph; an i32
                  carrier avoids the TPU denormal-flush trap that
                  shipping ints as f32 bits would hit)
    Semantics identical to make_dvs_chunk_resident_compact (pinned by
    tests)."""
    inner = make_dvs_chunk_resident_compact(
        p, event_cap, T, n, pallas_block, n_real, interpret, depth
    )

    def chunk_fn(state, packed):
        bf = lambda r: jax.lax.bitcast_convert_type(packed[r], _f32)
        meta = packed[0]
        return inner(
            state,
            meta & 0xFFFFF,
            (meta >> 20) & 0x7F,
            (meta >> 27) & 1 != 0,
            packed[1] & 0xFF,
            bf(2), bf(3),
            (meta >> 28) & 1 != 0,
            (packed[1] >> 8) & 0xFF,
            bf(4),
        )

    return jax.jit(chunk_fn)


DICT_CAP = 64  # shared value dictionary capacity of the 8-byte carrier


@functools.lru_cache(maxsize=32)
def make_dvs_chunk_resident_packed8(
    p: ops.TranscodeParams,
    event_cap: int,
    T: int,
    n: int,
    pb: int,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = 16,
):
    """make_dvs_chunk_resident_compact fed by ONE (2, E_pad + 64) i32
    carrier — 8 bytes/event, vs pack_dvs_plan's 20 — for windows whose
    gap values fit the factored layout (pack_dvs_plan8). On this
    harness's ~35 MB/s tunnel the bulk DVS e2e is h2d-transfer-bound, so
    bytes/event IS the throughput ceiling (r04 verdict item: bulk within
    3x of the device kernel).

    The carrier ships only (pix, lane, flags, gap_n, two 6-bit dictionary
    indices); the f32 intensities and times are RECONSTRUCTED in-graph:
      gap_int  = dict_val[gap_idx] * f32(gap_n)     (f32 multiply)
      gap_time = f32(gap_n * ref_time)              (exact i32 product)
      tick_int = dict_val[tick_idx]; fvs from the dictionary's fv row.
    This is bit-identical to the planner's own fields because gap_int is
    DEFINED as that f32 product (ops/dvs_batch.DvsCompact) and the i32 ->
    f32 conversions round the same integers on host and device. The
    held/new intensity values live on a small lattice (the ln chain steps
    by +-theta from a fixed mid-clamp reset), so one <=64-entry dictionary
    covers a whole window; pack_dvs_plan8 returns None when it cannot
    (caller falls back to the 20-byte carrier). Layout: pack_dvs_plan8."""
    inner = make_dvs_chunk_resident_compact(
        p, event_cap, T, n, pallas_block, n_real, interpret, depth
    )

    def chunk_fn(state, packed):
        return inner(state, *unpack_dvs_carrier8(packed, pb, p.ref_time))

    return jax.jit(chunk_fn)


def unpack_dvs_carrier8(packed, pb: int, ref_time: int):
    """In-graph unpack of the pack_dvs_plan8 carrier -> the nine
    make_dvs_chunk_resident_compact field arrays (pix, lane, gap_on,
    gap_fv, gap_int, gap_time, tick_on, tick_fv, tick_int). Gap-side
    values of tick-only rows are don't-cares (the plane scatter drops
    them via gap_on); everything else is bit-identical to the planner's
    fields (suite-pinned)."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    E_pad = packed.shape[1] - DICT_CAP
    r0, r1 = u[0, :E_pad], u[1, :E_pad]
    dval, dfv = packed[0, E_pad:], packed[1, E_pad:]
    pix = (r0 & ((1 << pb) - 1)).astype(_i32)
    lane = ((r0 >> pb) & 63).astype(_i32)
    gap_on = ((r0 >> (pb + 6)) & 1) != 0
    tick_on = ((r0 >> (pb + 7)) & 1) != 0
    gn = ((r0 >> (pb + 8)).astype(_i32) << 20) | (
        r1 & 0xFFFFF
    ).astype(_i32)
    gidx = ((r1 >> 20) & 63).astype(_i32)
    tidx = ((r1 >> 26) & 63).astype(_i32)
    gval = jax.lax.bitcast_convert_type(dval[gidx], _f32)
    gap_int = gval * gn.astype(_f32)
    gap_time = (gn * jnp.int32(ref_time)).astype(_f32)
    tick_int = jax.lax.bitcast_convert_type(dval[tidx], _f32)
    return (
        pix, lane, gap_on, dfv[gidx], gap_int, gap_time,
        tick_on, dfv[tidx], tick_int,
    )


def pack_dvs_plan8(plan, E_pad: int, n: int, ref_time: int):
    """Host side of make_dvs_chunk_resident_packed8: a DvsCompact (or a
    lane_slice) -> ((2, E_pad + DICT_CAP) i32 carrier, pb), 8 bytes per
    event — or None when the window doesn't fit the factored layout and
    the caller must fall back to pack_dvs_plan's 20-byte carrier.

    Bit layout (within u32 rows; pb = bits for a pixel index < n):
      row0: pix[0:pb] | lane[pb:pb+6] | gap_on[pb+6] | tick_on[pb+7]
            | gap_n_hi[pb+8:32]
      row1: gap_n_lo[0:20] | gap_idx[20:26] | tick_idx[26:32]
      dict appendix (columns E_pad .. E_pad+DICT_CAP):
            row0 = f32 bits of the value, row1 = its frame value
    One shared dictionary holds the unique (value, fv) pairs of both the
    gap side (gap_val/gap_fv) and the tick side (tick_int/tick_fv).
    Infeasible when: pixel indices need > 24 bits, a lane id >= 64, the
    dictionary exceeds DICT_CAP, or gap_n overflows its field / the exact
    i32 gap_n * ref_time product."""
    E = len(plan.pix)
    pb = max(1, int(n - 1).bit_length())
    hi_bits = 24 - pb
    if hi_bits < 0 or E == 0:
        return None
    gn = np.where(plan.gap_on, plan.gap_n, 0).astype(np.int64)
    if int(plan.lane.max()) >= 64:
        return None
    mx = int(gn.max())
    if mx >= (1 << (20 + hi_bits)) or mx > (2**31 - 1) // max(ref_time, 1):
        return None
    gv = plan.gap_val.view(np.int32).astype(np.int64)
    tv = plan.tick_int.view(np.int32).astype(np.int64)
    gkey = (gv << 32) | (plan.gap_fv.astype(np.int64) & 0xFFFFFFFF)
    tkey = (tv << 32) | (plan.tick_fv.astype(np.int64) & 0xFFFFFFFF)
    keys, inv = np.unique(np.concatenate([gkey, tkey]), return_inverse=True)
    if len(keys) > DICT_CAP:
        return None
    gidx = inv[:E].astype(np.uint32)
    tidx = inv[E:].astype(np.uint32)
    row0 = (
        plan.pix.astype(np.uint32)
        | (plan.lane.astype(np.uint32) << pb)
        | (plan.gap_on.astype(np.uint32) << (pb + 6))
        | (plan.tick_on.astype(np.uint32) << (pb + 7))
        | ((gn >> 20).astype(np.uint32) << (pb + 8))
    )
    row1 = (gn & 0xFFFFF).astype(np.uint32) | (gidx << 20) | (tidx << 26)
    packed = np.zeros((2, E_pad + DICT_CAP), np.uint32)
    packed[0, :E] = row0
    packed[1, :E] = row1
    packed[0, E_pad : E_pad + len(keys)] = (keys >> 32).astype(np.uint32)
    packed[1, E_pad : E_pad + len(keys)] = (
        keys & 0xFFFFFFFF
    ).astype(np.uint32)
    return packed.view(np.int32), pb


def pack_dvs_plan(plan, E_pad: int) -> np.ndarray:
    """Host side of make_dvs_chunk_resident_packed: a DvsCompact (or a
    lane_slice of one) -> the (5, E_pad) i32 carrier."""
    E = len(plan.pix)
    if E:
        assert int(plan.pix.max()) < (1 << 20), "plane too large for carrier"
        assert int(plan.lane.max()) < 128, "lane group too large for carrier"
    packed = np.zeros((5, E_pad), np.int32)
    packed[0, :E] = (
        plan.pix
        | (plan.lane << 20)
        | (plan.gap_on.astype(np.int32) << 27)
        | (plan.tick_on.astype(np.int32) << 28)
    )
    packed[1, :E] = plan.gap_fv | (plan.tick_fv << 8)
    packed[2, :E] = plan.gap_int.view(np.int32)
    packed[3, :E] = plan.gap_time.view(np.int32)
    packed[4, :E] = plan.tick_int.view(np.int32)
    return packed


@functools.lru_cache(maxsize=32)
def make_davis_chunk_resident_compact(
    p: ops.TranscodeParams,
    event_cap: int,
    T: int,
    n: int,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = 16,
):
    """DAVIS DVS lanes through the T-resident kernel (dvs='davis' op
    order: pop_top -> integrate(held gap) -> pop_top -> contrast stage,
    ref davis.rs:235-465), fed by COMPACT per-event rows: the (T, 4, N)
    lane planes [first_integration, dt_ticks, frame_val, fv8|active<<8]
    are scattered on device. One sub-step per lane (T = lane count).

    Signature: (state, pix (E,) i32, lane (E,) i32, active (E,) bool,
    first_int f32, dt_ticks f32, fval f32, fv8 i32) ->
    (state, ev_pixd, ev_t, total, per_interval, pack_max, counts).
    Same overflow/order contract as make_dvs_chunk_resident."""
    pack = depth + 3
    srows_phys = ((pallas_block // 128 + 1 + 7) // 8) * 8
    rows_cap = -(-event_cap // 128) + srows_phys

    def chunk_fn(state, pix, lane, active, first_int, dt_ticks, fval, fv8):
        fstep = make_resident_call(
            p, n, rows_cap, T, pallas_block, pack, n_real, interpret,
            depth=depth, emit_running=False, dvs="davis",
        )
        fi, dt, fv, fvw = build_davis_planes(
            T, n, pix, lane, active, first_int, dt_ticks, fval, fv8
        )
        bc = lambda x: jax.lax.bitcast_convert_type(x, _i32)
        frames = jnp.stack([bc(fi), bc(dt), bc(fv), fvw], axis=1)
        bufp0 = jnp.zeros((rows_cap, 128), _u32)
        buft0 = jnp.zeros((rows_cap, 128), _u32)
        (
            state, bufp, buft, total, pmax, counts, _rv, _rh,
        ) = fstep(state, frames, jnp.float32(0.0), bufp0, buft0,
                  jnp.zeros((), _i32))
        counts = counts[:, :T]
        per_interval = counts.sum(axis=0)
        buf_pixd = bufp.reshape(-1)[:event_cap]
        buf_t = buft.reshape(-1)[:event_cap]
        return state, buf_pixd, buf_t, total, per_interval, pmax, counts

    return jax.jit(chunk_fn)


@functools.lru_cache(maxsize=32)
def make_davis_chunk_resident_packed(
    p: ops.TranscodeParams,
    event_cap: int,
    T: int,
    n: int,
    pallas_block: int = 4096,
    n_real: int = 0,
    interpret: bool = False,
    depth: int = 16,
):
    """make_davis_chunk_resident_compact fed by ONE (5, E) i32 carrier
    (see make_dvs_chunk_resident_packed for why — 20 bytes/event):
      row 0 meta: pix | lane << 20 | active << 27
      row 1:      fv8
      rows 2-4:   bits(first_int), bits(dt_ticks), bits(fval)."""
    inner = make_davis_chunk_resident_compact(
        p, event_cap, T, n, pallas_block, n_real, interpret, depth
    )

    def chunk_fn(state, packed):
        bf = lambda r: jax.lax.bitcast_convert_type(packed[r], _f32)
        meta = packed[0]
        return inner(
            state,
            meta & 0xFFFFF,
            (meta >> 20) & 0x7F,
            (meta >> 27) & 1 != 0,
            bf(2), bf(3), bf(4),
            packed[1],
        )

    return jax.jit(chunk_fn)


def pack_davis_plan(plan, E_pad: int) -> np.ndarray:
    """Host side of make_davis_chunk_resident_packed: a DavisCompact ->
    the (5, E_pad) i32 carrier."""
    E = len(plan.pix)
    if E:
        assert int(plan.pix.max()) < (1 << 20), "plane too large for carrier"
        assert int(plan.lane.max()) < 128, "lane group too large for carrier"
    packed = np.zeros((5, E_pad), np.int32)
    packed[0, :E] = (
        plan.pix
        | (plan.lane << 20)
        | (plan.active.astype(np.int32) << 27)
    )
    packed[1, :E] = plan.fv8
    packed[2, :E] = plan.first_int.view(np.int32)
    packed[3, :E] = plan.dt_ticks.view(np.int32)
    packed[4, :E] = plan.fval.view(np.int32)
    return packed


def build_davis_planes(T, n, pix, lane, active, first_int, dt_ticks, fval,
                       fv8):
    """Device-side scatter of compact DAVIS rows into the (T, N) lane
    planes [first_integration, dt_ticks, frame_val, fv8 | active << 8] —
    one sub-step per lane (row = lane). Pinned equal to the host
    stack_davis_lanes layout by tests/test_dvs_batch.py."""
    # distinct OOB sentinels keep all indices unique (each (lane, pixel)
    # appears at most once by planner construction) — see build_dvs_planes
    oob = jnp.int32(T * n) + jnp.arange(pix.shape[0], dtype=_i32)
    dst = jnp.where(
        active, lane.astype(_i32) * jnp.int32(n) + pix.astype(_i32), oob
    )

    def plane(v, dtype):
        z = jnp.zeros((T * n,), dtype)
        return z.at[dst].set(
            v.astype(dtype), mode="drop", unique_indices=True
        ).reshape(T, n)

    return (
        plane(first_int, _f32),
        plane(dt_ticks, _f32),
        plane(fval, _f32),
        plane(fv8 | (active.astype(_i32) << 8), _i32),
    )


def assemble_resident_events(pixd: np.ndarray, t, counts: np.ndarray):
    """Host assembly: (block, interval, slot, pixel)-ordered buffer prefix ->
    the reference single-thread order (interval, then raster pixel, then
    slot).

    pixd/t: fetched buffer prefixes (total,) — pixd may be u32 wire-packed
    (pix << 8 | d). t may be None (pixd-only callers). counts: (n_blocks,
    T) i32. Within one (block, interval) segment events arrive as
    concatenated slot streams, each pixel-ascending; a stable sort by
    pixel is needed only when some pixel emitted more than one event in
    that interval (detected per segment).

    Both layouts are segment-contiguous, so the hot path is the native
    per-segment memcpy assembler (ops/native/assemble.cpp, ~500x the
    numpy gather/scatter on a 1-core host); assemble_resident_events_np
    is the pinned reference fallback (no g++ / exotic dtypes /
    ADDER_TPU_NATIVE_ASSEMBLE=0)."""
    counts = np.asarray(counts)
    if len(pixd) > 0 and np.asarray(pixd).dtype == np.uint32:
        from .native_assemble import assemble_native

        native = assemble_native(
            np.asarray(pixd), None if t is None else np.asarray(t), counts
        )
        if native is not None:
            return native
    return assemble_resident_events_np(pixd, t, counts)


def assemble_resident_events_np(pixd: np.ndarray, t, counts: np.ndarray):
    """Numpy reference implementation of assemble_resident_events (the
    semantics the native assembler is pinned against)."""
    counts = np.asarray(counts)
    n_blocks, T = counts.shape
    total = len(pixd)
    if total == 0:
        return pixd, t
    flat = counts.reshape(-1).astype(np.int64)  # produced (i, t) order
    ends = np.cumsum(flat)
    prod_off = ends - flat
    # destination offsets: segments reordered to (t, i)
    want_counts = counts.T.reshape(-1)  # (t, i) order
    want_off_tmaj = np.cumsum(want_counts) - want_counts
    # dest_start indexed by produced segment id s = i*T + t
    dest_start = want_off_tmaj.reshape(T, n_blocks).T.reshape(-1)
    seg_of_ev = np.repeat(np.arange(len(flat)), flat)
    dest = dest_start[seg_of_ev] + np.arange(total) - prod_off[seg_of_ev]
    out_p = np.empty_like(pixd)
    out_p[dest] = pixd
    out_t = None
    if t is not None:
        out_t = np.empty_like(t)
        out_t[dest] = t
    # within-segment (slot-stream) order: a stable sort by pixel is needed
    # only where a segment's pixel sequence decreases (a multi-event pixel
    # re-started a slot stream) — rare; fix just those segments
    pix_seq = (out_p >> 8).astype(np.int64)
    seg_starts_new = np.zeros(total, dtype=bool)
    seg_starts_new[want_off_tmaj[want_counts > 0]] = True
    bad = np.zeros(total, dtype=bool)
    bad[1:] = (np.diff(pix_seq) < 0) & ~seg_starts_new[1:]
    if bad.any():
        new_ends = np.cumsum(want_counts)
        new_starts = new_ends - want_counts
        bad_pos = np.flatnonzero(bad)
        # robust against zero-count segments sharing an end offset
        seg_of_new = np.repeat(np.arange(len(want_counts)), want_counts)
        bad_segs = np.unique(seg_of_new[bad_pos])
        for s in bad_segs:
            a, b = int(new_starts[s]), int(new_ends[s])
            o = np.argsort(pix_seq[a:b], kind="stable")
            out_p[a:b] = out_p[a:b][o]
            if out_t is not None:
                out_t[a:b] = out_t[a:b][o]
    return out_p, out_t
