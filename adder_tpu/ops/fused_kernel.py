"""Fused Pallas TPU kernel: ADDER interval + in-kernel event compaction.

Round-1 profiling (NOTES.md) showed the interval integration itself is a
minority of device time: ~3/4 went to the XLA-side event compaction
(top_k over (K, N) slot keys + capacity-sized gathers + merge). This kernel
eliminates that stage entirely — events never leave VMEM uncompacted:

  1. the interval state machine runs per pixel block (shared
     `ops.integrate._interval_core`, bit-identical to the XLA path and the
     scalar oracle);
  2. the K event slots are left-packed to `pack` lanes per pixel (selects);
  3. packed lanes are interleaved to pixel-major staging order — a sublane
     stretch (concat+reshape) plus row-class column picks as ONE stacked
     0/1 matmul on the MXU (8-bit chunks: exact in bf16 at default
     precision);
  4. an order-preserving log-shift compaction (pltpu.roll passes; distances
     are monotone because destinations are) squeezes valid events to the
     staging head, continuing from the running global offset's intra-row
     position;
  5. the staging block is DMA'd to the chunk event buffer at the running
     offset (SMEM accumulator across the sequential grid). Successive
     blocks overwrite each other's garbage tails (DMAs are ordered), so
     the buffer prefix [0, total) is always exactly the event stream in
     the reference's single-thread order.

Replaces: top_k compaction + gathers + dynamic-update-slice merge
(ops/integrate.py `_compact_interval`/`_merge_prefix`) and the (K, N) slot
round-trip through HBM. Ref for the semantics being accelerated:
adder-codec-rs/src/transcoder/source/video.rs:651-778 (integrate_matrix)
and event_pixel_tree.rs:317-479.
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

class _SkipCore(Exception):
    """debug_stage>=4 control flow: skip the interval core during trace."""


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, _i32)


def _bitcast_u32(x):
    return jax.lax.bitcast_convert_type(x, _u32)


def colpick_matrices(pack: int) -> np.ndarray:
    """0/1 column-pick matrix Cbig (128, pack*128) in bfloat16 with
    Cbig[k, m*128 + l] = [k == (128/pack)*m + l//pack].

    Row-class m of a sublane-stretched array picks its lanes through
    columns [m*128, (m+1)*128): (G @ Cbig)[r, m*128+l] = G[r,
    (128/pack)*m + l//pack]. Values are fed as 8-bit chunks so the matmul
    is exact in bf16 at DEFAULT MXU precision (products are 0/1 * v<256,
    accumulation in f32). Passed to the kernel as an input (Mosaic kernels
    cannot capture array constants)."""
    assert 128 % pack == 0, pack
    l = np.arange(128)
    C = np.zeros((128, pack * 128), np.float32)
    for m in range(pack):
        C[(128 // pack) * m + l // pack, m * 128 + l] = 1.0
    return C  # f32 on the wire; cast to bf16 inside the kernel


def _sublane_stretch(x: jax.Array, factor: int) -> jax.Array:
    """(rows, 128) -> (rows*factor, 128) with y[r, k] = x[r//factor, k].

    concat along lanes + a lane->sublane regrouping reshape; both are
    layout-natural on TPU (validated on Mosaic)."""
    g = jnp.concatenate([x] * factor, axis=1)
    return g.reshape(x.shape[0] * factor, 128)


def _interleave_all(pds, pts, mw, C_ref, pack):
    """Pixel-major interleave of all packed lane arrays in ONE matmul.

    Each (SUB, LN) i32 array is split into 8-bit chunks, sublane-stretched
    by `pack` (concat+reshape, layout-natural), stacked along sublanes and
    multiplied once against the 0/1 column-pick matrix: small matmuls were
    dispatch- and pass-bound (16-bit halves needed precision=HIGHEST,
    tripling MXU passes; 8-bit chunks are exact in bf16 at default
    precision). Returns (fp, ft, fvalid) in (R, 128) staging order with
    out[r, l] = arr[l % pack][(128*r + l) // pack]."""
    B = pds[0].size
    xrows = B // 128
    R = B * pack // 128
    bf16 = jnp.bfloat16

    def chunks(x, n):
        x = x.reshape(xrows, 128)
        return [
            _sublane_stretch(
                ((x >> (8 * c)) & 0xFF).astype(_f32), pack
            )
            for c in range(n)
        ]

    specs = []  # (kind, lane, chunk_shift)
    stacks = []
    for j in range(pack):
        for c, g in enumerate(chunks(pds[j], 4)):
            specs.append(("p", j, 8 * c))
            stacks.append(g)
        for c, g in enumerate(chunks(pts[j], 4)):
            specs.append(("t", j, 8 * c))
            stacks.append(g)
    for c, g in enumerate(chunks(mw, 2)):
        specs.append(("m", 0, 8 * c))
        stacks.append(g)

    Cb = C_ref[:].astype(bf16)
    # Matmul in groups bounded by a VMEM budget for the f32 result: at
    # pack=4 one stacked matmul fits comfortably, but the pack=16 fallback
    # would materialize hundreds of MB in one shot.
    result_bytes_per_stack = R * pack * 128 * 4
    group = max(1, (4 << 20) // result_bytes_per_stack)
    results = []
    for g0 in range(0, len(stacks), group):
        big = jnp.concatenate(stacks[g0 : g0 + group], axis=0).astype(bf16)
        results.append(
            jnp.dot(big, Cb, preferred_element_type=_f32)
        )

    rowm = jax.lax.broadcasted_iota(_i32, (R, 128), 0) % pack
    lane = jax.lax.broadcasted_iota(_i32, (R, 128), 1)
    lmod = lane % pack

    def class_select(block):
        out = jnp.zeros((R, 128), _i32)
        for m in range(pack):
            out = jnp.where(
                rowm == m,
                block[:, m * 128 : (m + 1) * 128].astype(_i32),
                out,
            )
        return out

    def result_slice(i):
        res = results[i // group]
        k = i % group
        return res[k * R : (k + 1) * R, :]

    pvals = [jnp.zeros((R, 128), _i32) for _ in range(pack)]
    tvals = [jnp.zeros((R, 128), _i32) for _ in range(pack)]
    mval = jnp.zeros((R, 128), _i32)
    for (kind, j, shift), i in zip(specs, range(len(specs))):
        sel = class_select(result_slice(i)) << shift
        if kind == "p":
            pvals[j] = pvals[j] | sel
        elif kind == "t":
            tvals[j] = tvals[j] | sel
        else:
            mval = mval | sel

    fp = jnp.zeros((R, 128), _i32)
    ft = jnp.zeros((R, 128), _i32)
    for j in range(pack):
        fp = jnp.where(lmod == j, pvals[j], fp)
        ft = jnp.where(lmod == j, tvals[j], ft)
    fvalid = ((mval >> lmod) & 1).astype(_i32)
    return fp, ft, fvalid


def _flat_shift_left(x: jax.Array, s: int) -> jax.Array:
    """Flat (row-major) left shift by s on a (rows, 128) array:
    y[f] = x[f + s], with wraparound (callers mask validity)."""
    rows = x.shape[0]
    q, r = divmod(s, 128)
    z = pltpu.roll(x, shift=128 - r, axis=1) if r else x
    a = pltpu.roll(z, shift=(rows - q) % rows, axis=0)
    if r == 0:
        return a
    b = pltpu.roll(z, shift=(rows - q - 1) % rows, axis=0)
    lane = jax.lax.broadcasted_iota(_i32, x.shape, 1)
    return jnp.where(lane + r < 128, a, b)


def _rank_exclusive(valid: jax.Array) -> jax.Array:
    """Exclusive flat (row-major) prefix sum of a 0/1 (R, 128) array via
    log-shift passes (lane cumsum per row, then row-offset cumsum)."""
    R = valid.shape[0]
    lane = jax.lax.broadcasted_iota(_i32, valid.shape, 1)
    x = valid
    s = 1
    while s < 128:
        sh = pltpu.roll(x, shift=s, axis=1)  # sh[l] = x[l - s]
        x = x + jnp.where(lane >= s, sh, 0)
        s *= 2
    row_tot = x[:, 127:128]  # (R, 1) inclusive row sums
    rowi = jax.lax.broadcasted_iota(_i32, (R, 1), 0)
    y = row_tot
    s = 1
    while s < R:
        sh = pltpu.roll(y, shift=s, axis=0)
        y = y + jnp.where(rowi >= s, sh, 0)
        s *= 2
    return x - valid + (y - row_tot)


def _kernel_body(p: ops.TranscodeParams, block: int, pack: int,
                 rows_cap: int, n_real: int, interpret: bool = False,
                 debug_stage: int = 0, depth: int = DEPTH,
                 emit_running: bool = True):
    # debug_stage (profiling only; events are garbage for stage > 0):
    # 0 full | 1 skip log-shift passes | 2 also skip interleave | 3 also
    # skip packing (interval core + DMA skeleton only) | 4 also skip the
    # interval core (state copy-through: measures pure state r/w + DMA)
    B = block
    R = B * pack // 128
    SROWS = R + 1  # head row + event rows (logical)
    # DMAs of VMEM buffers with a non-multiple-of-8 sublane count abort the
    # device (measured); pad the staging physically and ship the garbage
    # tail rows — successive blocks' overlapping writes cover them
    SROWS_PHYS = ((SROWS + 7) // 8) * 8
    NPASS = (SROWS * 128 - 1).bit_length()

    def kernel(
        time_ref, off_in_ref,  # SMEM (1,1) f32, (1,) i32
        C_ref,  # VMEM (pack*128, 128) f32
        live_ref,  # (1, B) u8: 1 for real pixels, 0 for plane padding
        frame_ref,  # (1, B) u8
        nd_ref, ni_ref, ndt_ref, bd_ref, bdt_ref,  # (DEPTH, B)
        length_ref, base_ref, cth_ref, cic_ref,  # (1, B) i32
        lft_ref, rt_ref,  # (1, B) f32
        need_ref, dtm_ref, popped_ref,  # (1, B) u8
        bufp_in, buft_in,  # ANY (rows_cap, 128) u32, aliased to outputs
        # outputs
        o_nd, o_ni, o_ndt, o_bd, o_bdt,
        o_length, o_base, o_cth, o_cic,
        o_lft, o_rt, o_need, o_dtm, o_popped,
        o_run_val, o_run_has,  # (1, B) u8
        o_bufp, o_buft,  # ANY aliased
        o_off, o_pmax,  # SMEM (1,) i32
        # scratch
        stgp0, stgt0, stgp1, stgt1,  # VMEM (SROWS, 128) u32 double buffer
        headp, headt,  # VMEM (1, 128) u32 (block-0 head DMA target)
        carryp, carryt,  # VMEM (1, 128) u32
        sem_out,  # DMA sems (2, 2)
        sem_in,  # DMA sems (2,)
    ):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        @pl.when(b == 0)
        def _():
            o_off[0] = off_in_ref[0]
            o_pmax[0] = 0
            # head replay: the current partial output row, written by the
            # previous interval's last DMA (or zeros on the first interval)
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

        off = o_off[0]
        q = jax.lax.rem(off, 128)

        # ---- interval state machine (shared with the XLA path) ----
        # (1, B) vectors occupy one sublane of each 8x128 vreg; reshape the
        # block to (8, B/8) so the ~2000 elementwise interval ops run at
        # full VPU occupancy (measured ~2x whole-kernel speedup at 1080p).
        # The reshape is layout-natural (row-major) so pixel order within
        # the block is unchanged.
        SUB, LN = 8, B // 8
        r8 = lambda x: x.reshape(SUB, LN)
        r1 = lambda x: x.reshape(1, B)
        if debug_stage >= 4:
            # state copy-through: isolates state r/w + DMA skeleton cost
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
            o_run_val[:] = jnp.zeros((1, B), jnp.uint8)
            o_run_has[:] = jnp.zeros((1, B), jnp.uint8)
            z_i = jnp.zeros((SUB, LN), _i32)
            slots = [(z_i, _bitcast_u32(z_i), z_i != 0)] * (depth + 3)
            run_val = jnp.zeros((SUB, LN), jnp.uint8)
            run_has = z_i != 0
            depth_ovf = jnp.zeros((), _i32)
        fences = numerics.pallas_fences("interpret" if interpret else "mosaic")
        fences.__enter__()
        try:
            if debug_stage >= 4:
                raise _SkipCore
            s = ops._S()
            s.nd = [r8(nd_ref[k : k + 1, :]) for k in range(depth)]
            s.ni = [r8(ni_ref[k : k + 1, :]) for k in range(depth)]
            s.ndt = [r8(ndt_ref[k : k + 1, :]) for k in range(depth)]
            s.bd = [r8(bd_ref[k : k + 1, :]) for k in range(depth)]
            s.bdt = [r8(bdt_ref[k : k + 1, :]) for k in range(depth)]
            s.length = r8(length_ref[:])
            s.base_val = r8(base_ref[:])
            s.c_thresh = r8(cth_ref[:])
            s.cic = r8(cic_ref[:])
            s.lft = r8(lft_ref[:])
            s.running_t = r8(rt_ref[:])
            s.need_pop = r8(need_ref[:]) != 0
            s.dtm_reached = r8(dtm_ref[:]) != 0
            s.popped_dtm = r8(popped_ref[:]) != 0
            s.overflow = jnp.zeros((), _i32)

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
            o_need[:] = r1(s.need_pop.astype(jnp.uint8))
            o_dtm[:] = r1(s.dtm_reached.astype(jnp.uint8))
            o_popped[:] = r1(s.popped_dtm.astype(jnp.uint8))
            o_run_val[:] = r1(run_val)
            o_run_has[:] = r1(run_has.astype(jnp.uint8))
            depth_ovf = s.overflow  # fires that found no free child node
        except _SkipCore:
            pass
        finally:
            fences.__exit__()

        # ---- event slots -> packed per-pixel lanes ----
        pix = b * B + (
            jax.lax.broadcasted_iota(_i32, (SUB, LN), 0) * LN
            + jax.lax.broadcasted_iota(_i32, (SUB, LN), 1)
        )
        if n_real:
            # pad-pixel suppression comes in as data: computing the mask
            # from program_id arithmetic trips an unimplemented "sublane
            # broadcast" lowering in Mosaic
            live = r8(live_ref[:]) != 0
            slots = [(d, t, m & live) for (d, t, m) in slots]

        # wire-packed event value (pix << 8 | d); pix < 2^23 so i32-safe
        pixd = [
            ((pix << 8) | (d & 0xFF), _bitcast_i32(t), m)
            for (d, t, m) in slots
        ]
        n_slots = len(pixd)  # depth + 3
        cnt = jnp.zeros((SUB, LN), _i32)
        if debug_stage >= 3:
            pd = [x[0] for x in pixd[:1]] * pack
            pt = [x[1] for x in pixd[:1]] * pack
            mw = jnp.zeros((1, B), _i32)
        elif pack < n_slots:
            pd = [jnp.zeros((SUB, LN), _i32) for _ in range(pack)]
            pt = [jnp.zeros((SUB, LN), _i32) for _ in range(pack)]
            for pd_k, t_k, m_k in pixd:
                for j in range(pack):
                    place = m_k & (cnt == j)
                    pd[j] = jnp.where(place, pd_k, pd[j])
                    pt[j] = jnp.where(place, t_k, pt[j])
                cnt = cnt + m_k.astype(_i32)
            # left-packed lanes: validity bitmask is (1 << cnt) - 1
            mw = (1 << jnp.minimum(cnt, pack)) - 1
        else:
            # unpacked: lanes are the K slots themselves (gaps allowed —
            # the compaction rank skips invalid lanes)
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
        # low 16 bits: per-pixel slot max (max-combined; pack fallback);
        # bit 16: arena depth overflowed (OR-combined; deep-graph rerun).
        # The channels must combine independently — a plain max() would
        # let a flagged-but-small value mask a larger slot count.
        prev = o_pmax[0]
        o_pmax[0] = (
            jnp.maximum(prev & 0xFFFF, jnp.max(cnt))
            | (prev & (1 << 16))
            | jnp.where(depth_ovf > 0, 1 << 16, 0)
        )

        # ---- interleave to pixel-major staging order ----
        if debug_stage >= 2:
            fp = jnp.broadcast_to(pd[0][:1, :128], (R, 128)).astype(_i32)
            ft = fp
            fvalid = (fp & 1)
        else:
            fp, ft, fvalid = _interleave_all(pd, pt, mw, C_ref, pack)

        # ---- destinations ----
        rank = _rank_exclusive(fvalid)
        n_new = jnp.sum(fvalid)
        f_flat = (
            jax.lax.broadcasted_iota(_i32, (R, 128), 0) * 128
            + jax.lax.broadcasted_iota(_i32, (R, 128), 1)
        )
        # staging position of source element = 128 + f (head row first);
        # destination = q + rank; distance is non-negative and monotone
        dist_ev = 128 + f_flat - q - rank

        hp = jnp.where(b == 0, _bitcast_i32(headp[:]), _bitcast_i32(carryp[:]))
        ht = jnp.where(b == 0, _bitcast_i32(headt[:]), _bitcast_i32(carryt[:]))
        lane1 = jax.lax.broadcasted_iota(_i32, (1, 128), 1)
        hv = (lane1 < q).astype(_i32)

        cp = jnp.concatenate([hp, fp], axis=0)  # (SROWS, 128)
        ct_ = jnp.concatenate([ht, ft], axis=0)
        cd = jnp.concatenate([jnp.zeros((1, 128), _i32), dist_ev], axis=0)
        cv = jnp.concatenate([hv, fvalid], axis=0)

        # ---- order-preserving log-shift compaction ----
        total_sz = SROWS * 128
        rowf = jax.lax.broadcasted_iota(_i32, (SROWS, 128), 0) * 128 + (
            jax.lax.broadcasted_iota(_i32, (SROWS, 128), 1)
        )
        for bi in range(NPASS if debug_stage < 1 else 0):
            step = 1 << bi
            sp = _flat_shift_left(cp, step)
            st = _flat_shift_left(ct_, step)
            sd = _flat_shift_left(cd, step)
            sv = jnp.where(
                rowf < total_sz - step, _flat_shift_left(cv, step), 0
            )
            take = (sv != 0) & (((sd >> bi) & 1) != 0)
            stay = (cv != 0) & (((cd >> bi) & 1) == 0)
            cp = jnp.where(take, sp, cp)
            ct_ = jnp.where(take, st, ct_)
            cd = jnp.where(take, sd - step, cd)
            cv = (take | stay).astype(_i32)

        # ---- staging write, carry, ordered DMA out ----
        end = q + n_new
        last_row = end // 128  # < SROWS (end <= 127 + R*128)
        row0c = jnp.minimum(off // 128, rows_cap - SROWS_PHYS)

        def flush(stgp, stgt, sems, other_p, other_t, other_sems):
            stgp[:SROWS] = _bitcast_u32(cp)
            stgt[:SROWS] = _bitcast_u32(ct_)
            carryp[:] = stgp[pl.ds(last_row, 1), :]
            carryt[:] = stgt[pl.ds(last_row, 1), :]

            # overlapping tail rewrite requires strict DMA ordering
            @pl.when(b > 0)
            def _():
                pltpu.make_async_copy(
                    other_p, o_bufp.at[pl.ds(row0c, SROWS_PHYS)], other_sems[0]
                ).wait()
                pltpu.make_async_copy(
                    other_t, o_buft.at[pl.ds(row0c, SROWS_PHYS)], other_sems[1]
                ).wait()

            dp = pltpu.make_async_copy(
                stgp, o_bufp.at[pl.ds(row0c, SROWS_PHYS)], sems[0]
            )
            dt_ = pltpu.make_async_copy(
                stgt, o_buft.at[pl.ds(row0c, SROWS_PHYS)], sems[1]
            )
            dp.start()
            dt_.start()

            @pl.when(b == nb - 1)
            def _():
                dp.wait()
                dt_.wait()

        @pl.when(jax.lax.rem(b, 2) == 0)
        def _():
            flush(stgp0, stgt0, (sem_out.at[0, 0], sem_out.at[0, 1]),
                  stgp1, stgt1, (sem_out.at[1, 0], sem_out.at[1, 1]))

        @pl.when(jax.lax.rem(b, 2) == 1)
        def _():
            flush(stgp1, stgt1, (sem_out.at[1, 0], sem_out.at[1, 1]),
                  stgp0, stgt0, (sem_out.at[0, 0], sem_out.at[0, 1]))

        o_off[0] = off + n_new

    return kernel


@functools.lru_cache(maxsize=32)
def make_fused_interval(
    p: ops.TranscodeParams,
    n: int,
    rows_cap: int,
    block: int = 4096,
    pack: int = 4,
    n_real: int = 0,
    interpret: bool = False,
    debug_stage: int = 0,
    depth: int = DEPTH,
    emit_running: bool = True,
):
    """Build the fused interval+compaction step for an N-pixel plane.

    Signature: (state, frame (N,) u8, time f32, bufp (rows_cap,128) u32,
    buft (rows_cap,128) u32, offset i32) ->
    (state, bufp, buft, new_offset, pack_max, (run_val (N,) u8, run_has)).

    Events land in bufp/buft (flat row-major, wire-packed pix<<8|d and t)
    at [offset, new_offset), in the reference's single-thread order.
    N must be a multiple of `block`; 128 % pack == 0; pack >= K means
    lossless slot coverage (no pack overflow possible)."""
    assert n % block == 0, (n, block)
    assert 128 % pack == 0 and (block * pack) % 128 == 0
    grid = (n // block,)
    B = block
    R = B * pack // 128
    SROWS_PHYS = ((R + 1 + 7) // 8) * 8  # must match _kernel_body padding

    def depth_spec():
        return pl.BlockSpec((depth, B), lambda i: (0, i), memory_space=pltpu.VMEM)

    def flat_spec():
        return pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),  # time
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offset_in
        pl.BlockSpec(
            (128, pack * 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),  # colpick
        flat_spec(),  # live mask
        flat_spec(),  # frame
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
        flat_spec(), flat_spec(),  # run_val, run_has
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
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
        jax.ShapeDtypeStruct((1, n), jnp.uint8),
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
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    call = pl.pallas_call(
        _kernel_body(p, block, pack, rows_cap, n_real, interpret,
                     debug_stage, depth, emit_running),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        input_output_aliases={19: 16, 20: 17},
        interpret=interpret,
    )

    # numpy, not jnp: make_fused_interval is lru_cached and may be reused
    # under a different jit trace — a jnp constant created inside one trace
    # leaks as a tracer into the next (jax stages large constants)
    cmat_np = colpick_matrices(pack)
    live_np = (np.arange(n) < (n_real or n)).astype(np.uint8).reshape(1, n)

    def step(state: ops.PixelState, frame_u8, time, bufp, buft, offset):
        time2d = jnp.asarray(time, _f32).reshape(1, 1)
        off1 = jnp.asarray(offset, _i32).reshape(1)
        outs = call(
            time2d, off1, jnp.asarray(cmat_np), jnp.asarray(live_np),
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
            bufp, buft,
        )
        (
            nd, ni, ndt, bd, bdt, length, base, cth, cic, lft, rt,
            need, dtm, popped, run_val, run_has, bufp, buft, off_out, pmax,
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
        return new_state, bufp, buft, off_out[0], pmax[0], (
            run_val.reshape(n), run_has.reshape(n) != 0
        )

    return step
