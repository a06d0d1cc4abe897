"""Interpret-mode parity tests for the T-resident fused kernel
(ops/fused_resident.py) against the XLA scan path (itself pinned bit-exact
to the scalar oracle). The resident kernel emits events in (block,
interval, slot, pixel) order; `assemble_resident_events` restores the
reference single-thread order, and the assembled stream must match the
XLA path exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from adder_tpu.core.types import Mode, PixelMultiMode, TimeMode
from adder_tpu.ops import integrate as ops
from adder_tpu.ops import fused_resident as fr

BLOCK = 256  # multi-block grids exercise cross-block DMA appends
N = BLOCK * 2
T = 3


def _frames(rng, t=T, n=N):
    frames = rng.integers(0, 256, (t, n)).astype(np.uint8)
    frames[:, : n // 4] = 128  # static region: empty block-intervals
    return frames


def _run_xla(p, frames, cap):
    fn = ops.make_transcode_chunk(p, cap, ops.K_SLOTS)
    n = frames.shape[1]
    state = ops.set_initial_d(
        ops.init_state(n), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    return fn(state, jnp.asarray(frames), jnp.float32(255.0), run0)


def _run_resident(p, frames, cap, pack=4, n_real=0):
    fn = fr.make_fused_chunk_resident(
        p, cap, pack, pallas_block=BLOCK, n_real=n_real, interpret=True
    )
    n = frames.shape[1]
    state = ops.set_initial_d(
        ops.init_state(n), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    return fn(state, jnp.asarray(frames), jnp.float32(255.0), run0)


def _assembled(res):
    total = int(res[6])
    pixd = np.asarray(res[1][:total])
    t = np.asarray(res[2][:total])
    counts = np.asarray(res[10])
    assert int(counts.sum()) == total
    return fr.assemble_resident_events(pixd, t, counts)


def _assert_fma_tie_only(a, b):
    """Exact equality, except the documented FMA-tie class (see
    test_fused_kernel._assert_fma_tie_only): interpret-vs-XLA graphs may
    make opposite LLVM FMA-contraction choices on rounding near-ties.
    Allow <=1% of elements to differ by one ulp/tick; else exact."""
    a, b = np.asarray(a), np.asarray(b)
    if np.array_equal(a, b):
        return
    if a.dtype == np.float32:
        tie = np.abs(a - b) <= np.spacing(np.maximum(np.abs(a), np.abs(b)))
    else:
        tie = np.abs(a.astype(np.int64) - b.astype(np.int64)) <= 1
    frac = float((a != b).mean())
    assert tie.all() and frac <= 0.01, (
        f"non-tie mismatch: frac={frac}, "
        f"max={np.abs(a.astype(np.float64) - b.astype(np.float64)).max()}"
    )


def _assert_matches_xla(ref, got):
    tot_r, tot_g = int(ref[6]), int(got[6])
    assert tot_r == tot_g
    np.testing.assert_array_equal(np.asarray(ref[7]), np.asarray(got[7]))
    gp, gt = _assembled(got)
    np.testing.assert_array_equal(np.asarray(ref[1][:tot_r]), gp)
    _assert_fma_tie_only(np.asarray(ref[2][:tot_r]), gt)
    _assert_fma_tie_only(ref[8], got[8])  # runnings
    for f_r, f_g in zip(ref[0][:-1], got[0][:-1]):
        _assert_fma_tie_only(f_r, f_g)


# Normal-mode tails are slow-tier (see test_fused_kernel.MODE_CASES)
MODE_CASES = [
    (Mode.FramePerfect, PixelMultiMode.Collapse, TimeMode.AbsoluteT),
    pytest.param(
        Mode.FramePerfect, PixelMultiMode.Normal, TimeMode.DeltaT,
        marks=pytest.mark.slow,
    ),
    (Mode.Continuous, PixelMultiMode.Collapse, TimeMode.AbsoluteT),
    pytest.param(
        Mode.Continuous, PixelMultiMode.Normal, TimeMode.AbsoluteT,
        marks=pytest.mark.slow,
    ),
]


@pytest.mark.parametrize("mode,multi,tm", MODE_CASES)
def test_resident_matches_xla(mode, multi, tm):
    p = ops.TranscodeParams(
        mode=int(mode), multi_mode=int(multi), time_mode=int(tm),
        ref_time=255, delta_t_max=255 * 4,
    )
    rng = np.random.default_rng(7)
    frames = _frames(rng)
    cap = ops.K_SLOTS * N * T * 4
    _assert_matches_xla(
        _run_xla(p, frames, cap), _run_resident(p, frames, cap)
    )


def test_resident_multi_event_pixels():
    """Continuous/Normal at dtm == ref emits multiple slots per pixel per
    interval — the per-slot streams interleave at assembly via the
    stable per-segment sort."""
    p = ops.TranscodeParams(
        mode=int(Mode.Continuous), multi_mode=int(PixelMultiMode.Normal),
        ref_time=255, delta_t_max=255,
    )
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (T, N)).astype(np.uint8)
    cap = ops.K_SLOTS * N * T * 4
    ref = _run_xla(p, frames, cap)
    got = _run_resident(p, frames, cap, pack=16)
    # the pattern must actually produce multi-event pixel-intervals
    assert (int(got[9]) & 0xFFFF) > 1
    _assert_matches_xla(ref, got)


def test_resident_pad_masking():
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(11)
    n_real = N - 100
    frames = _frames(rng)
    frames_real = frames[:, :n_real]
    cap = ops.K_SLOTS * N * T * 4
    ref = _run_xla(p, frames_real, cap)
    padded = frames.copy()
    padded[:, n_real:] = 0
    got = _run_resident(p, padded, cap, pack=4, n_real=n_real)
    tot = int(ref[6])
    assert int(got[6]) == tot
    gp, gt = _assembled(got)
    np.testing.assert_array_equal(np.asarray(ref[1][:tot]), gp)
    np.testing.assert_array_equal(np.asarray(ref[2][:tot]), gt)


def test_resident_multichunk_state_carry():
    """Chained chunks: VMEM-resident state writes back correctly and the
    next chunk continues bit-identically to the XLA path."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(13)
    cap = ops.K_SLOTS * N * T * 4
    fn_x = ops.make_transcode_chunk(p, cap, ops.K_SLOTS)
    fn_r = fr.make_fused_chunk_resident(
        p, cap, 4, pallas_block=BLOCK, interpret=True
    )
    frames1 = _frames(rng)
    frames2 = _frames(rng)
    st = ops.set_initial_d(
        ops.init_state(N), jnp.asarray(frames1[0].astype(np.int32))
    )
    run0 = jnp.zeros((N,), jnp.uint8)
    ox1 = fn_x(st, jnp.asarray(frames1), jnp.float32(255.0), run0)
    ox2 = fn_x(ox1[0], jnp.asarray(frames2), jnp.float32(255.0), run0)
    or1 = fn_r(st, jnp.asarray(frames1), jnp.float32(255.0), run0)
    or2 = fn_r(or1[0], jnp.asarray(frames2), jnp.float32(255.0), run0)
    _assert_matches_xla(ox1, or1)
    _assert_matches_xla(ox2, or2)


def test_resident_single_interval_and_longer_chunks():
    """T=1 (no revisiting) and T=8 (deep revisiting) both hold parity."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(19)
    for t_len in (1, 8):
        frames = _frames(rng, t=t_len)
        cap = ops.K_SLOTS * N * t_len * 4
        _assert_matches_xla(
            _run_xla(p, frames, cap), _run_resident(p, frames, cap)
        )


def test_group_compactor_matches_logshift():
    """The static-segment (group) compactor must produce the exact event
    stream of the logshift resident kernel: lane-0 events band-packed
    with bit31 validity, multi-event pixels through the tail region,
    identical carried state (round-4 compaction attempt)."""
    import numpy as np

    from adder_tpu.ops import fused_resident as FR
    from adder_tpu.ops import integrate as ops

    p = ops.TranscodeParams(
        mode=int(Mode.FramePerfect), multi_mode=int(PixelMultiMode.Collapse),
        time_mode=int(TimeMode.DeltaT), ref_time=255, delta_t_max=255 * 4,
        c_thresh_max=0, c_increase_velocity=1,
    )
    B, n, T = 128, 512, 5
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, (T, n)).astype(np.uint8)
    state0 = ops.set_initial_d(
        ops.init_state(n, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    cap = ops.K_SLOTS * n * T

    ref_fn = FR.make_fused_chunk_resident(
        p, cap, 4, pallas_block=B, interpret=True, depth=6,
        emit_running=False,
    )
    ro = ref_fn(state0, jnp.asarray(frames), jnp.float32(255.0), run0)
    tot_r = int(ro[6])
    rp, rt = FR.assemble_resident_events(
        np.asarray(ro[1][:tot_r]), np.asarray(ro[2][:tot_r]),
        np.asarray(ro[10]),
    )

    grp_fn = FR.make_group_chunk_resident(
        p, tail_cap=4096, pack=4, pallas_block=B, interpret=True, depth=6,
    )
    go = grp_fn(state0, jnp.asarray(frames), jnp.float32(255.0), run0)
    gstate, gbufp, gbuft, gtotal, gtail, gper, gpmax, gcounts = go
    assert int(gtail) <= 4096
    assert int(gtotal) == tot_r
    gp, gt = FR.assemble_group_events(
        np.asarray(gbufp), np.asarray(gbuft), np.asarray(gcounts), B,
        int(gtail),
    )
    np.testing.assert_array_equal(gp, rp)
    np.testing.assert_array_equal(gt, rt)
    assert int(gtail) > 0  # multi-event pixels actually exercised the tail
    # carried state identical
    for a, b in zip(ro[0], gstate):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # per-interval counts identical
    np.testing.assert_array_equal(
        np.asarray(gper), np.asarray(ro[7])
    )


def test_native_assemble_matches_numpy():
    """The C++ segment-memcpy assembler (ops/native/assemble.cpp) must
    reproduce the numpy reference exactly: segment reorder, in-segment
    slot-stream sort fix, zero-count segments, t=None, 8-byte t."""
    from adder_tpu.ops.native_assemble import assemble_native

    rng = np.random.default_rng(7)
    n_blocks, T = 9, 5
    counts = rng.integers(0, 40, size=(n_blocks, T)).astype(np.int32)
    counts[rng.random((n_blocks, T)) < 0.3] = 0  # zero-count segments
    total = int(counts.sum())
    flat = counts.reshape(-1)
    starts = np.cumsum(flat) - flat
    pix = np.empty(total, dtype=np.uint32)
    for s, c in enumerate(flat):
        c = int(c)
        seg = np.sort(rng.integers(0, 64, size=c).astype(np.uint32))
        if c >= 4 and s % 3 == 0:  # slot-stream restart (multi-event pixel)
            seg[-2:] = seg[:2]
        pix[int(starts[s]):int(starts[s]) + c] = seg
    pixd = (pix << 8) | rng.integers(0, 256, size=total).astype(np.uint32)
    t = rng.integers(0, 1 << 30, size=total, dtype=np.uint32)

    want_p, want_t = fr.assemble_resident_events_np(pixd, t, counts)
    got = assemble_native(pixd, t, counts)
    if got is None:
        pytest.skip("native assembler unavailable (no g++)")
    np.testing.assert_array_equal(got[0], want_p)
    np.testing.assert_array_equal(got[1], want_t)

    got_p, got_none = assemble_native(pixd, None, counts)
    np.testing.assert_array_equal(got_p, want_p)
    assert got_none is None

    t64 = t.astype(np.int64)
    _, got_t64 = assemble_native(pixd, t64, counts)
    np.testing.assert_array_equal(got_t64, want_t.astype(np.int64))

    with pytest.raises(ValueError):
        assemble_native(pixd[:-1], None, counts)
