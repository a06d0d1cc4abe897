"""Interpret-mode parity tests for the Pallas kernels on CPU.

The TPU kernels (ops/pallas_kernel.py interval kernel; ops/fused_kernel.py
fused interval+compaction kernel) normally only run on TPU hardware.
`pl.pallas_call(interpret=True)` executes the same kernel logic on CPU, so
CI pins the kernels against the XLA scan path (which is itself pinned
bit-exact to the scalar oracle in test_integrate_kernel.py /
test_pixel_oracle.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adder_tpu.core.types import Mode, PixelMultiMode, TimeMode
from adder_tpu.ops import integrate as ops
from adder_tpu.ops import fused_kernel, pallas_kernel

BLOCK = 256  # small grid blocks so tests exercise multi-block offsets
N = BLOCK * 2
T = 3


def _frames(rng, t=T, n=N):
    # mix of flat regions (no events), steps (pop_best), and ramps
    frames = rng.integers(0, 256, (t, n)).astype(np.uint8)
    frames[:, : n // 4] = 128  # static region
    return frames


def _run_xla(p, frames, cap, pack):
    fn = ops.make_transcode_chunk(p, cap, pack)
    n = frames.shape[1]
    state = ops.set_initial_d(
        ops.init_state(n), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    return fn(state, jnp.asarray(frames), jnp.float32(255.0), run0)


def _run_fused(p, frames, cap, pack, n_real=0):
    fn = ops.make_fused_chunk(
        p, cap, pack, pallas_block=BLOCK, n_real=n_real, interpret=True
    )
    n = frames.shape[1]
    state = ops.set_initial_d(
        ops.init_state(n), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    return fn(state, jnp.asarray(frames), jnp.float32(255.0), run0)


def _assert_fma_tie_only(a, b):
    """Exact equality, except the documented FMA-tie class: XLA:CPU (LLVM)
    contracts single-use fmul+fadd into an FMA regardless of
    optimization_barrier, and the interpret-mode kernel graph can make the
    opposite contraction choice from the XLA-path graph. On rounding
    near-ties this flips the last ulp (f32 state), one tick (timestamps),
    or one display unit. The compiled TPU path has no such divergence — it
    is pinned byte-exact by the e2e TPU tests. Allow <=1% of elements to
    differ by the tie amount; everything else must be exact."""
    a, b = np.asarray(a), np.asarray(b)
    if np.array_equal(a, b):
        return
    if a.dtype == np.float32:
        tie = np.abs(a - b) <= np.spacing(np.maximum(np.abs(a), np.abs(b)))
    else:
        tie = np.abs(a.astype(np.int64) - b.astype(np.int64)) <= 1
    frac = float((a != b).mean())
    assert tie.all() and frac <= 0.01, (
        f"non-tie mismatch: frac={frac}, max={np.abs(a.astype(np.float64) - b.astype(np.float64)).max()}"
    )


def _assert_chunk_equal(a, b):
    (st_a, pixd_a, t_a, _, _, _, tot_a, per_a, run_a, _) = a
    (st_b, pixd_b, t_b, _, _, _, tot_b, per_b, run_b, _) = b
    tot_a, tot_b = int(tot_a), int(tot_b)
    assert tot_a == tot_b
    np.testing.assert_array_equal(np.asarray(per_a), np.asarray(per_b))
    np.testing.assert_array_equal(
        np.asarray(pixd_a[:tot_a]), np.asarray(pixd_b[:tot_b])
    )
    _assert_fma_tie_only(t_a[:tot_a], t_b[:tot_b])
    _assert_fma_tie_only(run_a, run_b)
    for f_a, f_b in zip(st_a[:-1], st_b[:-1]):  # overflow counter differs
        _assert_fma_tie_only(f_a, f_b)


# fast tier keeps one FramePerfect + one Continuous pin; the Normal-mode
# tails are slow-tier (compile-heavy on a 1-core host; full matrix runs
# with `pytest tests/` or `-m slow` — see pytest.ini)
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
def test_fused_matches_xla(mode, multi, tm):
    p = ops.TranscodeParams(
        mode=int(mode), multi_mode=int(multi), time_mode=int(tm),
        ref_time=255, delta_t_max=255 * 4,
    )
    rng = np.random.default_rng(7)
    frames = _frames(rng)
    cap = ops.K_SLOTS * N * T * 4
    _assert_chunk_equal(
        _run_xla(p, frames, cap, ops.K_SLOTS),
        _run_fused(p, frames, cap, pack=4),
    )


def test_fused_unpacked_lanes():
    """pack=16 (>= K_SLOTS) uses the slots directly with gaps."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 2)
    rng = np.random.default_rng(3)
    frames = _frames(rng)
    cap = ops.K_SLOTS * N * T * 4
    _assert_chunk_equal(
        _run_xla(p, frames, cap, ops.K_SLOTS),
        _run_fused(p, frames, cap, pack=16),
    )


def test_fused_pad_masking():
    """Pad pixels beyond n_real emit no events."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(11)
    n_real = N - 100
    frames = _frames(rng)
    frames_real = frames[:, :n_real]
    cap = ops.K_SLOTS * N * T * 4
    ref = _run_xla(p, frames_real, cap, ops.K_SLOTS)
    padded = frames.copy()
    padded[:, n_real:] = 0
    got = _run_fused(p, padded, cap, pack=4, n_real=n_real)
    tot = int(ref[6])
    assert int(got[6]) == tot
    np.testing.assert_array_equal(
        np.asarray(ref[1][:tot]), np.asarray(got[1][:tot])
    )
    np.testing.assert_array_equal(
        np.asarray(ref[2][:tot]), np.asarray(got[2][:tot])
    )


def test_fused_pack_overflow_detected():
    """A pixel emitting more events than the packed lanes raises max_cnt,
    and the pack=16 rerun recovers the full stream."""
    # continuous/normal with dtm == ref and random content emits up to 3
    # slots per pixel-interval (measured), overflowing 2 packed lanes
    p = ops.TranscodeParams(
        mode=int(Mode.Continuous), multi_mode=int(PixelMultiMode.Normal),
        ref_time=255, delta_t_max=255,
    )
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (T, N)).astype(np.uint8)
    cap = ops.K_SLOTS * N * T * 4
    ref = _run_xla(p, frames, cap, ops.K_SLOTS)
    ref2 = _run_xla(p, frames, cap, 2)  # XLA tracks max_cnt only when packing
    got2 = _run_fused(p, frames, cap, pack=2)
    pack_max = int(got2[9])
    assert pack_max == int(ref2[9])
    assert pack_max > 2  # the pattern must actually overflow 2 lanes
    got16 = _run_fused(p, frames, cap, pack=16)
    _assert_chunk_equal(ref, got16)


def test_fused_multichunk_offsets():
    """Chaining chunks: each chunk's buffer starts at offset 0 and the
    carried state keeps streams identical to the XLA path."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(13)
    cap = ops.K_SLOTS * N * T * 4
    fn_x = ops.make_transcode_chunk(p, cap, ops.K_SLOTS)
    fn_f = ops.make_fused_chunk(
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
    of1 = fn_f(st, jnp.asarray(frames1), jnp.float32(255.0), run0)
    of2 = fn_f(of1[0], jnp.asarray(frames2), jnp.float32(255.0), run0)
    _assert_chunk_equal(ox1, of1)
    _assert_chunk_equal(ox2, of2)


def test_interval_kernel_interpret_matches_xla():
    """The plain interval kernel (ops/pallas_kernel.py), interpret mode:
    same state + slots as integrate_interval (VERDICT r1 item 4)."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(17)
    n = 512
    frames = rng.integers(0, 256, (2, n)).astype(np.uint8)
    state = ops.set_initial_d(
        ops.init_state(n), jnp.asarray(frames[0].astype(np.int32))
    )
    pstep = pallas_kernel.make_interval_pallas(p, n, block=256, interpret=True)
    # jit the reference too: eager per-op execution rounds the display
    # intensity division differently by 1 ulp than any fused graph
    xstep = jax.jit(
        lambda st, f: ops.integrate_interval(
            st, f.astype(jnp.float32), f.astype(jnp.int32),
            jnp.float32(255.0), p,
        )
    )
    st_p, st_x = state, state
    for i in range(2):
        f = jnp.asarray(frames[i])
        st_p, sd_p, st_t_p, sm_p, (rv_p, rh_p) = pstep(
            st_p, f, jnp.float32(255.0)
        )
        st_x, sd_x, st_t_x, sm_x, (rv_x, rh_x) = xstep(st_x, f)
        np.testing.assert_array_equal(np.asarray(sm_p), np.asarray(sm_x))
        m = np.asarray(sm_x)
        np.testing.assert_array_equal(np.asarray(sd_p)[m], np.asarray(sd_x)[m])
        _assert_fma_tie_only(np.asarray(st_t_p)[m], np.asarray(st_t_x)[m])
        _assert_fma_tie_only(np.asarray(rv_p), np.asarray(rv_x))
        np.testing.assert_array_equal(np.asarray(rh_p), np.asarray(rh_x))
        for f_p, f_x in zip(st_p[:-1], st_x[:-1]):
            _assert_fma_tie_only(f_p, f_x)


def test_fused_shallow_depth_parity_and_overflow():
    """depth=6 arenas (the reference's SmallVec inline capacity) produce
    identical events; a too-shallow graph raises the overflow bit and the
    padded-state rerun on the deep graph recovers the exact stream."""
    p = ops.TranscodeParams(
        mode=1, multi_mode=1, ref_time=255, delta_t_max=255 * 24,
    )  # continuous/normal reaches arena length 5 on random content
    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (T, N)).astype(np.uint8)
    cap = ops.K_SLOTS * N * T * 4

    ref = _run_xla(p, frames, cap, ops.K_SLOTS)
    tot = int(ref[6])

    # depth 6: no overflow, byte-identical events
    fn6 = ops.make_fused_chunk(
        p, cap, 4, pallas_block=BLOCK, interpret=True, depth=6
    )
    st6 = ops.set_initial_d(
        ops.init_state(N, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((N,), jnp.uint8)
    out6 = fn6(st6, jnp.asarray(frames), jnp.float32(255.0), run0)
    assert int(out6[9]) >> 16 == 0, "depth-6 should suffice here"
    assert int(out6[6]) == tot
    np.testing.assert_array_equal(np.asarray(out6[1][:tot]), np.asarray(ref[1][:tot]))
    np.testing.assert_array_equal(np.asarray(out6[2][:tot]), np.asarray(ref[2][:tot]))

    # depth 2: the same content overflows (continuous remainder spill
    # fires at the last level) -> bit 16 set
    fn3 = ops.make_fused_chunk(
        p, cap, 4, pallas_block=BLOCK, interpret=True, depth=2
    )
    st3 = ops.set_initial_d(
        ops.init_state(N, depth=2), jnp.asarray(frames[0].astype(np.int32))
    )
    out3 = fn3(st3, jnp.asarray(frames), jnp.float32(255.0), run0)
    assert int(out3[9]) >> 16 == 1, "expected depth overflow at depth=2"

    # fallback: pad the pre-chunk state and rerun deep -> exact stream
    st_deep = ops.pad_state_depth(st3, 8)
    fn8 = ops.make_fused_chunk(
        p, cap, 4, pallas_block=BLOCK, interpret=True, depth=8
    )
    out8 = fn8(st_deep, jnp.asarray(frames), jnp.float32(255.0), run0)
    assert int(out8[6]) == tot
    np.testing.assert_array_equal(np.asarray(out8[1][:tot]), np.asarray(ref[1][:tot]))
    np.testing.assert_array_equal(np.asarray(out8[2][:tot]), np.asarray(ref[2][:tot]))


def test_fused_emit_running_off_same_events():
    """emit_running=False skips only the display conversion; the event
    stream and state are unchanged."""
    p = ops.TranscodeParams(ref_time=255, delta_t_max=255 * 4)
    rng = np.random.default_rng(23)
    frames = _frames(rng)
    cap = ops.K_SLOTS * N * T * 4
    on = _run_fused(p, frames, cap, pack=4)
    fn = ops.make_fused_chunk(
        p, cap, 4, pallas_block=BLOCK, interpret=True, emit_running=False
    )
    state = ops.set_initial_d(
        ops.init_state(N), jnp.asarray(frames[0].astype(np.int32))
    )
    off = fn(state, jnp.asarray(frames), jnp.float32(255.0),
             jnp.zeros((N,), jnp.uint8))
    tot = int(on[6])
    assert int(off[6]) == tot
    np.testing.assert_array_equal(np.asarray(off[1][:tot]), np.asarray(on[1][:tot]))
    np.testing.assert_array_equal(np.asarray(off[2][:tot]), np.asarray(on[2][:tot]))
    for f_a, f_b in zip(off[0][:-1], on[0][:-1]):
        np.testing.assert_array_equal(np.asarray(f_a), np.asarray(f_b))
