"""Differential tests for the batched DVS device path (ops/dvs_batch.py).

The batched path must reproduce the scalar-oracle Prophesee pipeline's
per-pixel event streams bit-for-bit (the reference's own determinism
contract for serial DVS processing, prophesee.rs:116-297).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adder_tpu.codec.encoder import EncoderOptions, EncoderType
from adder_tpu.core.types import (
    Mode,
    PixelMultiMode,
    SourceCamera,
    TimeMode,
)
from adder_tpu.ops import dvs_batch as B
from adder_tpu.ops import integrate as K


def test_masked_interval_restores_unmasked_pixels():
    """Pixels outside the mask keep their state bit-for-bit, and emit no
    slots; pixels inside the mask evolve exactly like a dense interval
    over only those pixels."""
    rng = np.random.default_rng(5)
    n = 64
    p = K.TranscodeParams(
        mode=int(Mode.Continuous),
        multi_mode=int(PixelMultiMode.Collapse),
        ref_time=20,
        delta_t_max=40,
        c_thresh_max=10,
        c_increase_velocity=1,
    )
    state = K.init_state(n)
    # evolve everything a few steps so the state is non-trivial
    for step in range(3):
        inten = rng.integers(0, 256, n).astype(np.float32)
        state, *_ = K.integrate_interval(
            state, jnp.asarray(inten), jnp.asarray(inten.astype(np.int32)),
            jnp.full((n,), 20.0, jnp.float32), p,
        )
    mask = rng.random(n) < 0.5
    inten = rng.integers(0, 256, n).astype(np.float32)
    tvec = np.full(n, 20.0, np.float32)
    st2, sd, stt, sm, _ = B.masked_interval(
        state, jnp.asarray(inten), jnp.asarray(inten.astype(np.int32)),
        jnp.asarray(tvec), jnp.asarray(mask), p,
    )
    # unmasked pixels: identical state, no slots
    for a, b in zip(state, st2):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim == 0:
            continue
        cols = ~mask
        np.testing.assert_array_equal(a[..., cols], b[..., cols])
    assert not np.asarray(sm)[:, ~mask].any()

    # masked pixels: same as a dense interval over the submatrix
    sub_idx = np.flatnonzero(mask)
    sub_state = K.PixelState(*[
        jnp.asarray(np.asarray(a)[..., sub_idx]) if np.asarray(a).ndim else a
        for a in state
    ])
    st3, sd3, stt3, sm3, _ = K.integrate_interval(
        sub_state, jnp.asarray(inten[sub_idx]),
        jnp.asarray(inten[sub_idx].astype(np.int32)),
        jnp.asarray(tvec[sub_idx]), p,
    )
    for a, b in zip(st3, st2):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim == 0:
            continue
        np.testing.assert_array_equal(a, b[..., sub_idx])
    np.testing.assert_array_equal(np.asarray(sm3), np.asarray(sm)[:, sub_idx])
    np.testing.assert_array_equal(
        np.asarray(sd3)[np.asarray(sm3)],
        np.asarray(sd)[:, sub_idx][np.asarray(sm3)],
    )
    np.testing.assert_array_equal(
        np.asarray(stt3)[np.asarray(sm3)],
        np.asarray(stt)[:, sub_idx][np.asarray(sm3)],
    )


def _make_raw(path, w, h, events):
    with open(path, "wb") as f:
        f.write(b"% Height " + str(h).encode() + b"\n")
        f.write(b"% Width " + str(w).encode() + b"\n")
        f.write(bytes([0, 8]))
        rec = np.zeros((len(events), 2), dtype="<u4")
        for i, (t, x, y, p) in enumerate(events):
            rec[i, 0] = t
            rec[i, 1] = (p << 28) | (y << 14) | x
        f.write(rec.tobytes())


def _run(path, batched, multi_mode, engine=None):
    from adder_tpu.transcoder.prophesee import Prophesee

    src = Prophesee(20, str(path), batched=batched, engine=engine)
    out = open(str(path) + (".b" if batched else ".o"), "wb")
    src.write_out(
        SourceCamera.Dvs, TimeMode.AbsoluteT, multi_mode, None,
        EncoderType.Raw, EncoderOptions.default(src.plane), out,
    )
    streams = {}
    while True:
        try:
            arr = src.consume()
        except EOFError:
            break
        for x, y, d, t in zip(arr.x, arr.y, arr.d, arr.t):
            streams.setdefault((int(x), int(y)), []).append((int(d), int(t)))
    src.end_write_stream().close()
    return streams


@pytest.mark.parametrize(
    "multi_mode",
    [
        PixelMultiMode.Collapse,
        pytest.param(PixelMultiMode.Normal, marks=pytest.mark.slow),
    ],
)
def test_batched_matches_oracle(tmp_path, multi_mode):
    w, h = 14, 10
    rng = np.random.default_rng(3)
    events = []
    t = 10
    for _ in range(300):
        t += int(rng.integers(1, 1500))
        events.append(
            (t, int(rng.integers(0, w)), int(rng.integers(0, h)),
             int(rng.integers(0, 2)))
        )
    raw = tmp_path / "diff.raw"
    _make_raw(raw, w, h, events)

    oracle = _run(raw, batched=False, multi_mode=multi_mode)
    batched = _run(raw, batched=True, multi_mode=multi_mode)

    assert set(oracle) == set(batched)
    for key in sorted(oracle):
        assert oracle[key] == batched[key], (
            key, oracle[key][:6], batched[key][:6]
        )


def _check_resident_matches_scan(tmp_path, multi_mode, n_events):
    """The T-resident Pallas DVS engine (lane sub-steps as kernel
    intervals, prophesee._run_lanes_resident) must reproduce the scan
    engine's per-pixel event streams bit-for-bit — and, transitively, the
    scalar oracle's (test_batched_matches_oracle)."""
    w, h = 14, 10
    rng = np.random.default_rng(11)
    events = []
    t = 10
    for _ in range(n_events):
        t += int(rng.integers(1, 1500))
        events.append(
            (t, int(rng.integers(0, w)), int(rng.integers(0, h)),
             int(rng.integers(0, 2)))
        )
    raw = tmp_path / "res.raw"
    _make_raw(raw, w, h, events)

    scan = _run(raw, batched=True, multi_mode=multi_mode, engine="scan")
    resident = _run(
        raw, batched=True, multi_mode=multi_mode, engine="resident"
    )
    assert set(scan) == set(resident)
    for key in sorted(scan):
        assert scan[key] == resident[key], (
            key, scan[key][:6], resident[key][:6]
        )


@pytest.mark.slow
def test_resident_engine_matches_scan(tmp_path):
    # compile-heavy (two engines on one core); the fast tier pins the
    # compact plan + scatter (test_compact_plan_matches_dense_and_scatter)
    # and the oracle==scan chain; full engine parity runs in the slow tier
    _check_resident_matches_scan(tmp_path, PixelMultiMode.Collapse, 120)


@pytest.mark.slow
def test_resident_engine_matches_scan_normal_long(tmp_path):
    _check_resident_matches_scan(tmp_path, PixelMultiMode.Normal, 260)


@pytest.mark.parametrize(
    "mode_name",
    ["RawDavis", pytest.param("RawDvs", marks=pytest.mark.slow)],
)
def test_davis_batched_matches_oracle(mode_name):
    """Davis batched path (davis_event_interval + dense frame/gap calls)
    must reproduce the oracle's per-pixel event streams exactly."""
    from adder_tpu.transcoder.davis import (
        ArrayDavisProvider,
        Davis,
        DavisPacket,
        DvsEvent,
        TranscoderMode,
    )
    from adder_tpu.core.types import PlaneSize

    mode = TranscoderMode[mode_name]
    H, W = 12, 14
    plane = PlaneSize(W, H, 1)
    rng = np.random.default_rng(9)

    def frame():
        return rng.integers(40, 200, (H, W)).astype(np.uint8)

    def burst(t0, t1, n):
        evs = [
            DvsEvent(t=int(t), x=int(rng.integers(0, W)),
                     y=int(rng.integers(0, H)), on=bool(rng.integers(0, 2)))
            for t in sorted(rng.integers(t0, t1, n))
        ]
        return evs

    packets = [
        DavisPacket(frame(), 1000, 3000, burst(10, 900, 60)),
        DavisPacket(frame(), 6000, 8000, burst(3100, 5900, 80)),
        DavisPacket(None, 0, 0, burst(8100, 12000, 70)),
        DavisPacket(frame(), 15000, 17000, burst(12100, 14900, 50)),
    ]

    def run(batched):
        src = Davis(ArrayDavisProvider(packets, plane), ref_time=255,
                    mode=mode, batched=batched)
        streams = {}
        while True:
            try:
                arr = src.consume()
            except EOFError:
                break
            for x, y, d, t in zip(arr.x, arr.y, arr.d, arr.t):
                streams.setdefault((int(x), int(y)), []).append(
                    (int(d), int(t))
                )
        return streams

    oracle = run(False)
    batched = run(True)
    assert set(oracle) == set(batched)
    for key in sorted(oracle):
        assert oracle[key] == batched[key], (
            key, oracle[key][:6], batched[key][:6]
        )


def test_davis_framed_mode_batched():
    """Framed transcoder mode (APS frames only) through the batched path
    matches the oracle too (exercises _integrate_frame_batched alone)."""
    from adder_tpu.transcoder.davis import (
        ArrayDavisProvider,
        Davis,
        DavisPacket,
        TranscoderMode,
    )
    from adder_tpu.core.types import PlaneSize

    H, W = 10, 12
    plane = PlaneSize(W, H, 1)
    rng = np.random.default_rng(4)
    packets = [
        DavisPacket(rng.integers(20, 230, (H, W)).astype(np.uint8),
                    1000 + 5000 * i, 3000 + 5000 * i, [])
        for i in range(4)
    ]

    def run(batched):
        src = Davis(ArrayDavisProvider(packets, plane), ref_time=255,
                    mode=TranscoderMode.Framed, batched=batched)
        streams = {}
        while True:
            try:
                arr = src.consume()
            except EOFError:
                break
            for x, y, d, t in zip(arr.x, arr.y, arr.d, arr.t):
                streams.setdefault((int(x), int(y)), []).append(
                    (int(d), int(t))
                )
        return streams

    oracle = run(False)
    batched = run(True)
    assert oracle == batched and len(oracle) > 0

@pytest.mark.slow
def test_davis_resident_engine_matches_scan():
    """The DAVIS lanes through the T-resident Pallas kernel (dvs='davis'
    op order, compact device-side plane scatter) must reproduce the XLA
    scan engine's per-pixel event streams bit-for-bit — and, transitively,
    the scalar oracle's (test_davis_batched_matches_oracle)."""
    from adder_tpu.transcoder.davis import (
        ArrayDavisProvider,
        Davis,
        DavisPacket,
        DvsEvent,
        TranscoderMode,
    )
    from adder_tpu.core.types import PlaneSize

    H, W = 12, 14
    plane = PlaneSize(W, H, 1)
    rng = np.random.default_rng(17)

    def frame():
        return rng.integers(40, 200, (H, W)).astype(np.uint8)

    def burst(t0, t1, n):
        return [
            DvsEvent(t=int(t), x=int(rng.integers(0, W)),
                     y=int(rng.integers(0, H)), on=bool(rng.integers(0, 2)))
            for t in sorted(rng.integers(t0, t1, n))
        ]

    packets = [
        DavisPacket(frame(), 1000, 3000, burst(10, 900, 70)),
        DavisPacket(None, 0, 0, burst(3100, 6000, 90)),
        DavisPacket(frame(), 9000, 11000, burst(6100, 8900, 60)),
    ]

    def run(engine):
        src = Davis(ArrayDavisProvider(packets, plane), ref_time=255,
                    mode=TranscoderMode.RawDavis, batched=True,
                    engine=engine)
        streams = {}
        while True:
            try:
                arr = src.consume()
            except EOFError:
                break
            for x, y, d, t in zip(arr.x, arr.y, arr.d, arr.t):
                streams.setdefault((int(x), int(y)), []).append(
                    (int(d), int(t))
                )
        return streams

    scan = run("scan")
    resident = run("resident")
    assert set(scan) == set(resident)
    for key in sorted(scan):
        assert scan[key] == resident[key], (
            key, scan[key][:6], resident[key][:6]
        )


def test_compact_plan_matches_dense_and_scatter():
    """Fast-tier pin for the compact resident feed: the compact planner
    mutates identical chain state to the dense planner (one shared math
    path), and the device-side plane scatter (build_dvs_planes)
    reproduces the host stack_lanes interleave bit-for-bit. The full
    engine e2e parity pins are slow-tier (compile-heavy)."""
    import jax.numpy as jnp

    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR

    w, h = 14, 10
    n = w * h
    rng = np.random.default_rng(23)
    n_ev = 260
    ts = np.sort(rng.integers(5, 4000, n_ev)).astype(np.uint32)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ps = rng.integers(0, 2, n_ev).astype(np.uint8)
    lt1 = np.full(n, 2, np.uint32)
    ln1 = np.full(n, np.log1p(128.0 / 255.0), np.float64)
    lt2, ln2 = lt1.copy(), ln1.copy()

    compact = B.plan_dvs_batch_compact(
        ts, xs, ys, ps, w, n, lt1, ln1, 0.02, 20
    )
    lanes = B.plan_dvs_batch(ts, xs, ys, ps, w, n, lt2, ln2, 0.02, 20)
    np.testing.assert_array_equal(lt1, lt2)
    np.testing.assert_array_equal(ln1, ln2)
    L = len(lanes)
    assert compact.n_lanes == L and L >= 2

    gi, gf, gt, gm, ti, tf, tt, tm = B.stack_lanes(lanes, L)
    T = 2 * L
    want_inten = np.zeros((T, n), np.float32)
    want_tsp = np.zeros((T, n), np.float32)
    want_fvw = np.zeros((T, n), np.int32)
    want_inten[0::2] = gi
    want_inten[1::2] = ti
    want_tsp[0::2] = gt
    want_tsp[1::2] = tt
    want_fvw[0::2] = gf | (gm.astype(np.int32) << 8)
    want_fvw[1::2] = tf | (tm.astype(np.int32) << 8)

    inten, tsp, fvw = FR.build_dvs_planes(
        T, n, jnp.asarray(compact.pix), jnp.asarray(compact.lane),
        jnp.asarray(compact.gap_on), jnp.asarray(compact.gap_fv),
        jnp.asarray(compact.gap_int), jnp.asarray(compact.gap_time),
        jnp.asarray(compact.tick_on), jnp.asarray(compact.tick_fv),
        jnp.asarray(compact.tick_int), jnp.asarray(compact.tick_time),
    )
    np.testing.assert_array_equal(np.asarray(inten), want_inten)
    np.testing.assert_array_equal(np.asarray(tsp), want_tsp)
    np.testing.assert_array_equal(np.asarray(fvw), want_fvw)


def test_davis_compact_plan_matches_dense_and_scatter():
    """DAVIS twin of test_compact_plan_matches_dense_and_scatter."""
    import jax.numpy as jnp

    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR

    w, h = 14, 10
    n = w * h
    rng = np.random.default_rng(31)
    n_ev = 240
    ts = np.sort(rng.integers(100, 9000, n_ev)).astype(np.int64)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ons = rng.integers(0, 2, n_ev).astype(bool)
    lt1 = np.zeros(n, np.int64)
    ln1 = np.full(n, np.log1p(0.5), np.float64)
    lt2, ln2 = lt1.copy(), ln1.copy()

    compact = B.plan_davis_events_compact(
        ts, xs, ys, ons, w, n, lt1, ln1, 0.15, 255, 1.5
    )
    lanes = B.plan_davis_events(
        ts, xs, ys, ons, w, n, lt2, ln2, 0.15, 255, 1.5
    )
    np.testing.assert_array_equal(lt1, lt2)
    np.testing.assert_array_equal(ln1, ln2)
    # empty (all-inactive) lanes stay as zero rows on both paths
    L = len(lanes)
    assert compact.n_lanes == L and L >= 2

    fi_d, dt_d, fv_d, f8_d, m_d = B.stack_davis_lanes(lanes, L)
    want_fvw = f8_d | (m_d.astype(np.int32) << 8)

    fi, dt, fv, fvw = FR.build_davis_planes(
        L, n, jnp.asarray(compact.pix), jnp.asarray(compact.lane),
        jnp.asarray(compact.active), jnp.asarray(compact.first_int),
        jnp.asarray(compact.dt_ticks), jnp.asarray(compact.fval),
        jnp.asarray(compact.fv8),
    )
    np.testing.assert_array_equal(np.asarray(fi), fi_d)
    np.testing.assert_array_equal(np.asarray(dt), dt_d)
    np.testing.assert_array_equal(np.asarray(fv), fv_d)
    np.testing.assert_array_equal(np.asarray(fvw), want_fvw)


def test_native_dvs_planner_matches_numpy():
    """The C++ chain walk (ops/native/dvs_plan.cpp) must reproduce the
    numpy reference planner BIT-exactly: every compact-plan field, the
    lane-major row order, and the mutated last_t/last_ln chain state —
    across the drop rule (t < last_t), tick-only events (t == lt+1),
    gap+tick events, and both mid-clamp branches."""
    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops.native_dvs_plan import plan_dvs_native

    w, h = 23, 17
    n = w * h
    rng = np.random.default_rng(41)
    n_ev = 3000
    ts = np.sort(rng.integers(0, 2500, n_ev)).astype(np.uint32)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ps = rng.integers(0, 2, n_ev).astype(np.uint8)
    lt1 = rng.integers(0, 900, n).astype(np.uint32)  # some events drop
    # extreme ln values exercise the mid clamp on both branches
    ln1 = rng.uniform(-1.0, 1.2, n)
    ln1[rng.random(n) < 0.05] = 5.0
    lt2, ln2 = lt1.copy(), ln1.copy()

    theta = 0.3  # big step: frequent clamp crossings
    got = plan_dvs_native(ts, xs, ys, ps, w, lt1, ln1, theta, 20)
    if got is None:
        pytest.skip("native planner unavailable (no g++)")
    want = B.plan_dvs_batch_compact_np(
        ts, xs, ys, ps, w, n, lt2, ln2, theta, 20
    )
    for name, g, e in zip(want._fields, got, want):
        np.testing.assert_array_equal(g, e, err_msg=f"field {name}")
        assert g.dtype == e.dtype, (name, g.dtype, e.dtype)
    np.testing.assert_array_equal(lt1, lt2)
    np.testing.assert_array_equal(ln1, ln2)

    # empty batch
    e0 = plan_dvs_native(
        np.zeros(0, np.uint32), np.zeros(0, np.uint16),
        np.zeros(0, np.uint16), np.zeros(0, np.uint8), w, lt1, ln1,
        theta, 20,
    )
    assert e0 is not None and len(e0.pix) == 0


def test_native_davis_planner_matches_numpy():
    """DAVIS twin: the multiplicative ln step, the dt_us==t /
    negative-dt drop rule, unconditional last_t update, and both
    clamp_u8 branches, bit-exact vs the numpy reference."""
    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops.native_dvs_plan import plan_davis_native

    w, h = 19, 13
    n = w * h
    rng = np.random.default_rng(43)
    n_ev = 2500
    ts = np.sort(rng.integers(1, 30000, n_ev)).astype(np.int64)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ons = rng.integers(0, 2, n_ev).astype(bool)
    lt1 = np.zeros(n, np.int64)
    lt1[rng.random(n) < 0.3] = 50_000  # negative-dt drops
    # zeros keep dt_us == t (the uninitialized-pixel skip)
    ln1 = rng.uniform(0.01, 1.4, n)
    ln1[rng.random(n) < 0.05] = 2.5  # high-side clamp
    ln1[rng.random(n) < 0.05] = 1e-9  # low-side clamp via shrink
    lt2, ln2 = lt1.copy(), ln1.copy()

    got = plan_davis_native(
        ts, xs, ys, ons, w, lt1, ln1, 0.6, 255, 1.5
    )
    if got is None:
        pytest.skip("native planner unavailable (no g++)")
    want = B.plan_davis_events_compact_np(
        ts, xs, ys, ons, w, n, lt2, ln2, 0.6, 255, 1.5
    )
    for name, g, e in zip(want._fields, got, want):
        np.testing.assert_array_equal(g, e, err_msg=f"field {name}")
        assert g.dtype == e.dtype, (name, g.dtype, e.dtype)
    np.testing.assert_array_equal(lt1, lt2)
    np.testing.assert_array_equal(ln1, ln2)


def test_packed8_carrier_reconstructs_plan_fields():
    """The 8-byte/event factored carrier (pack_dvs_plan8 +
    unpack_dvs_carrier8) must reconstruct every device-consumed field
    bit-identically to the planner's own arrays: gap_int as the defining
    f32 product, gap_time from the exact i32 gap_n * ref product, fvs and
    tick_int via the shared dictionary. Gap-side fields of tick-only rows
    are don't-cares (the plane scatter drops them), so gap comparisons
    mask on gap_on. Time offsets are large so gap_n exercises the split
    hi/lo field."""
    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR

    w, h = 23, 11
    n = w * h
    rng = np.random.default_rng(31)
    n_ev = 700
    # large spread -> gap_n well past 2^20 (the lo-field boundary)
    ts = np.sort(rng.integers(5, 9_000_000, n_ev)).astype(np.uint32)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ps = rng.integers(0, 2, n_ev).astype(np.uint8)
    lt = np.full(n, 2, np.uint32)
    ln = np.full(n, np.log1p(128.0 / 255.0), np.float64)
    ref = 20
    plan = B.plan_dvs_batch_compact(ts, xs, ys, ps, w, n, lt, ln, 0.02, ref)
    E = len(plan.pix)
    assert E > 0 and int(np.where(plan.gap_on, plan.gap_n, 0).max()) > (1 << 20)

    E_pad = E + 29
    out = FR.pack_dvs_plan8(plan, E_pad, n, ref)
    assert out is not None
    packed, pb = out
    assert packed.shape == (2, E_pad + FR.DICT_CAP)
    assert pb == int(n - 1).bit_length()

    import jax.numpy as jnp

    fields = FR.unpack_dvs_carrier8(jnp.asarray(packed), pb, ref)
    pix, lane, gap_on, gap_fv, gap_int, gap_time, tick_on, tick_fv, \
        tick_int = (np.asarray(f)[:E] for f in fields)
    np.testing.assert_array_equal(pix, plan.pix)
    np.testing.assert_array_equal(lane, plan.lane)
    np.testing.assert_array_equal(gap_on, plan.gap_on)
    np.testing.assert_array_equal(tick_on, plan.tick_on)
    g = plan.gap_on
    np.testing.assert_array_equal(gap_fv[g], plan.gap_fv[g])
    np.testing.assert_array_equal(
        gap_int[g].view(np.int32), plan.gap_int[g].view(np.int32)
    )
    np.testing.assert_array_equal(
        gap_time[g].view(np.int32), plan.gap_time[g].view(np.int32)
    )
    t = plan.tick_on
    np.testing.assert_array_equal(tick_fv[t], plan.tick_fv[t])
    np.testing.assert_array_equal(
        tick_int[t].view(np.int32), plan.tick_int[t].view(np.int32)
    )
    # padding rows are inert: no gap/tick flags -> scatter drops them
    pad_on = np.asarray(fields[2])[E:] | np.asarray(fields[6])[E:]
    assert not pad_on.any()


def test_packed_carriers_roundtrip_and_masked_parity():
    """The single-upload i32 carriers (pack_dvs_plan / pack_davis_plan /
    the (4, N) masked-call carrier) must decode in-graph to exactly the
    arrays the unpacked paths ship, and the packed/const masked-interval
    dispatches must produce identical states and events to the unpacked
    one (each device_put is a full RTT on a high-latency link, so the
    production sources ship one carrier per call)."""
    import jax
    import jax.numpy as jnp

    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR
    from adder_tpu.ops import integrate as I
    from adder_tpu.core.types import Mode, TimeMode

    w, h = 23, 11
    n = w * h
    rng = np.random.default_rng(47)
    n_ev = 500
    ts = np.sort(rng.integers(5, 3000, n_ev)).astype(np.uint32)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ps = rng.integers(0, 2, n_ev).astype(np.uint8)
    lt = np.full(n, 2, np.uint32)
    ln = np.full(n, np.log1p(128.0 / 255.0), np.float64)
    plan = B.plan_dvs_batch_compact(ts, xs, ys, ps, w, n, lt, ln, 0.02, 20)

    # carrier round-trip: pack -> in-graph unpack == the unpacked fields
    # (20-byte/event dense layout: meta word, fv word, 3 f32-bit rows)
    E_pad = len(plan.pix) + 13
    packed = jnp.asarray(FR.pack_dvs_plan(plan, E_pad))
    bf = lambda r: jax.lax.bitcast_convert_type(packed[r], jnp.float32)
    E = len(plan.pix)
    meta = np.asarray(packed[0])
    np.testing.assert_array_equal((meta & 0xFFFFF)[:E], plan.pix)
    np.testing.assert_array_equal(((meta >> 20) & 0x7F)[:E], plan.lane)
    np.testing.assert_array_equal(
        (((meta >> 27) & 1) != 0)[:E], plan.gap_on
    )
    np.testing.assert_array_equal(
        (((meta >> 28) & 1) != 0)[:E], plan.tick_on
    )
    fvs = np.asarray(packed[1])
    np.testing.assert_array_equal((fvs & 0xFF)[:E], plan.gap_fv)
    np.testing.assert_array_equal(((fvs >> 8) & 0xFF)[:E], plan.tick_fv)
    np.testing.assert_array_equal(np.asarray(bf(2))[:E], plan.gap_int)
    np.testing.assert_array_equal(np.asarray(bf(3))[:E], plan.gap_time)
    np.testing.assert_array_equal(np.asarray(bf(4))[:E], plan.tick_int)
    assert not (((meta >> 27) & 1) != 0)[E:].any()  # padding is inert
    assert not (((meta >> 28) & 1) != 0)[E:].any()

    # davis carrier
    lt_d = np.zeros(n, np.int64)
    ln_d = np.full(n, np.log1p(0.5), np.float64)
    dplan = B.plan_davis_events_compact(
        ts.astype(np.int64), xs, ys, ps.astype(bool), w, n, lt_d, ln_d,
        0.15, 255, 1.5,
    )
    dp = jnp.asarray(FR.pack_davis_plan(dplan, len(dplan.pix) + 5))
    Ed = len(dplan.pix)
    bfd = lambda r: jax.lax.bitcast_convert_type(dp[r], jnp.float32)
    dmeta = np.asarray(dp[0])
    np.testing.assert_array_equal((dmeta & 0xFFFFF)[:Ed], dplan.pix)
    np.testing.assert_array_equal(((dmeta >> 20) & 0x7F)[:Ed], dplan.lane)
    np.testing.assert_array_equal(
        (((dmeta >> 27) & 1) != 0)[:Ed], dplan.active
    )
    np.testing.assert_array_equal(np.asarray(bfd(2))[:Ed], dplan.first_int)
    np.testing.assert_array_equal(np.asarray(bfd(3))[:Ed], dplan.dt_ticks)
    np.testing.assert_array_equal(np.asarray(bfd(4))[:Ed], dplan.fval)
    np.testing.assert_array_equal(np.asarray(dp[1])[:Ed], dplan.fv8)

    # masked-interval: unpacked vs packed vs const, identical state+events
    p = I.TranscodeParams(
        mode=int(Mode.Continuous), time_mode=int(TimeMode.AbsoluteT),
        ref_time=20, delta_t_max=40, c_thresh_max=10,
        c_increase_velocity=1,
    )
    st0 = I.init_state(n, depth=8)
    take = 1 << (n - 1).bit_length()
    inten = np.full(n, 128.0 * 20, np.float32)
    fv = np.full(n, 128, np.int32)
    tme = np.full(n, 20.0, np.float32)
    mask = np.ones(n, bool)

    f_u = B.make_masked_interval_compact(p, take)
    st_u, pix_u, t_u, n_u = f_u(
        st0, jnp.asarray(inten), jnp.asarray(fv), jnp.asarray(tme),
        jnp.asarray(mask),
    )
    pk = np.zeros((4, n), np.int32)
    pk[0] = inten.view(np.int32)
    pk[1] = fv
    pk[2] = tme.view(np.int32)
    pk[3] = mask
    f_p = B.make_masked_interval_compact_packed(p, take)
    st_p, pix_p, t_p, n_p = f_p(st0, jnp.asarray(pk))
    f_c = B.make_masked_interval_const(p, take, n, n, 128.0 * 20, 128, 20.0)
    st_c, [(pix_c, t_c, n_c)] = f_c(st0)
    assert int(n_u) == int(n_p) == int(n_c)
    k = int(n_u)
    np.testing.assert_array_equal(np.asarray(pix_u)[:k], np.asarray(pix_p)[:k])
    np.testing.assert_array_equal(np.asarray(pix_u)[:k], np.asarray(pix_c)[:k])
    np.testing.assert_array_equal(np.asarray(t_u)[:k], np.asarray(t_p)[:k])
    np.testing.assert_array_equal(np.asarray(t_u)[:k], np.asarray(t_c)[:k])
    for a, b in zip(jax.tree.leaves(st_u), jax.tree.leaves(st_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st_u), jax.tree.leaves(st_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_masked_interval_const_reps_and_void():
    """One reps=2 const masked call == two chained reps=1 calls (state and
    per-rep events), and the compact=False (void) variant chains the same
    state while skipping compaction entirely."""
    import jax

    n = 64
    p = K.TranscodeParams(
        mode=int(Mode.Continuous), time_mode=int(TimeMode.AbsoluteT),
        ref_time=20, delta_t_max=40, c_thresh_max=10,
        c_increase_velocity=1,
    )
    st0 = K.init_state(n, depth=8)
    take = 1 << (n - 1).bit_length()
    f1 = B.make_masked_interval_const(p, take, n, n, 128.0 * 20, 128, 20.0)
    st_a, [(pix_a, t_a, n_a)] = f1(st0)
    st_b, [(pix_b, t_b, n_b)] = f1(st_a)

    f2 = B.make_masked_interval_const(
        p, take, n, n, 128.0 * 20, 128, 20.0, reps=2
    )
    st_r, [(pix_1, t_1, n_1), (pix_2, t_2, n_2)] = f2(st0)
    assert int(n_1) == int(n_a) and int(n_2) == int(n_b)
    k1, k2 = int(n_a), int(n_b)
    np.testing.assert_array_equal(np.asarray(pix_1)[:k1], np.asarray(pix_a)[:k1])
    np.testing.assert_array_equal(np.asarray(t_1)[:k1], np.asarray(t_a)[:k1])
    np.testing.assert_array_equal(np.asarray(pix_2)[:k2], np.asarray(pix_b)[:k2])
    np.testing.assert_array_equal(np.asarray(t_2)[:k2], np.asarray(t_b)[:k2])
    for a, b in zip(jax.tree.leaves(st_r), jax.tree.leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    f_void = B.make_masked_interval_const(
        p, take, n, n, 128.0 * 20, 128, 20.0, reps=2, compact=False
    )
    st_v, rep_outs = f_void(st0)
    assert all(int(nv) == 0 and pv.shape == (0,) for pv, _, nv in rep_outs)
    for a, b in zip(jax.tree.leaves(st_v), jax.tree.leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # packed variant: compact=False chains the same state too
    inten = np.full(n, 128.0 * 20, np.float32)
    pk = np.zeros((4, n), np.int32)
    pk[0] = inten.view(np.int32)
    pk[1] = 128
    pk[2] = np.full(n, 20.0, np.float32).view(np.int32)
    pk[3] = 1
    fp = B.make_masked_interval_compact_packed(p, take, compact=False)
    st_pv, pix_pv, _, n_pv = fp(st0, jnp.asarray(pk))
    assert int(n_pv) == 0 and pix_pv.shape == (0,)
    for a, b in zip(jax.tree.leaves(st_pv), jax.tree.leaves(st_a)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_native_pack8_matches_numpy_twin():
    """The fused native planner+pack (adder_plan_dvs_pack8) must produce,
    per 64-aligned lane group, a carrier whose UNPACKED fields are
    bit-identical to the classic plan_dvs_batch_compact + pack_dvs_plan8
    pipeline (dictionary insertion order differs from np.unique's sorted
    order, so carrier bytes legitimately differ — the kernel only sees
    the unpacked fields), and must advance the chain state (last_t /
    last_ln / val_cache) identically."""
    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR
    from adder_tpu.ops.native_dvs_plan import plan_dvs_pack8_native

    w, h = 23, 11
    n = w * h
    rng = np.random.default_rng(7)
    n_ev = 4000
    # large spread exercises the split gap_n hi/lo field
    ts = np.sort(rng.integers(5, 9_000_000, n_ev)).astype(np.uint32)
    xs = rng.integers(0, w, n_ev).astype(np.uint16)
    ys = rng.integers(0, h, n_ev).astype(np.uint16)
    ps = rng.integers(0, 2, n_ev).astype(np.uint8)
    theta, ref = 0.02, 20
    lt1 = np.full(n, 2, np.uint32)
    ln1 = np.full(n, np.log1p(128.0 / 255.0), np.float64)
    vc1 = np.full(n, np.nan, np.float64)
    lt2, ln2, vc2 = lt1.copy(), ln1.copy(), vc1.copy()

    pp = plan_dvs_pack8_native(
        ts, xs, ys, ps, w, n, lt1, ln1, theta, ref, val_cache=vc1
    )
    if pp is None:
        pytest.skip("native planner unavailable (no g++)")
    plan = B.plan_dvs_batch_compact(
        ts, xs, ys, ps, w, n, lt2, ln2, theta, ref, val_cache=vc2
    )
    # chain state parity (NaN-aware equality for the exp memo)
    np.testing.assert_array_equal(lt1, lt2)
    np.testing.assert_array_equal(ln1, ln2)
    np.testing.assert_array_equal(vc1, vc2)
    assert pp.n_lanes == plan.n_lanes
    assert len(pp.row0) == len(plan.pix)

    import jax.numpy as jnp

    for g0 in range(0, pp.n_lanes, 64):
        g1 = min(pp.n_lanes, g0 + 64)
        g = plan.lane_slice(g0, g1)
        r0, r1 = int(pp.lane_off[g0]), int(pp.lane_off[g1])
        E = r1 - r0
        assert E == len(g.pix)
        # per-lane gap/tick active counts drive capacity sizing
        for k in range(g0, g1):
            sel = g.lane == (k - g0)
            assert int(pp.gap_cnt[k]) == int(g.gap_on[sel].sum())
            assert int(pp.tick_cnt[k]) == int(g.tick_on[sel].sum())
        E_pad = E + 13
        out = FR.pack_dvs_plan8(g, E_pad, n, ref)
        assert out is not None
        packed_np, pb = out
        assert pb == pp.pb
        packed8 = np.zeros((2, E_pad + FR.DICT_CAP), np.uint32)
        packed8[0, :E] = pp.row0[r0:r1]
        packed8[1, :E] = pp.row1[r0:r1]
        nd = len(pp.dict0)
        packed8[0, E_pad : E_pad + nd] = pp.dict0
        packed8[1, E_pad : E_pad + nd] = pp.dict1
        fa = FR.unpack_dvs_carrier8(
            jnp.asarray(packed8.view(np.int32)), pp.pb, ref
        )
        fb = FR.unpack_dvs_carrier8(jnp.asarray(packed_np), pb, ref)
        fa = [np.asarray(f)[:E] for f in fa]
        fb = [np.asarray(f)[:E] for f in fb]
        # native rows are lane-major; the classic slice is event-order.
        # (pix, lane) is unique per window (lane = occurrence index), so
        # sorting both by it aligns the rows.
        oa = np.lexsort((fa[0], fa[1]))
        ob = np.lexsort((fb[0], fb[1]))
        names = (
            "pix", "lane", "gap_on", "gap_fv", "gap_int", "gap_time",
            "tick_on", "tick_fv", "tick_int",
        )
        ga, ta = fa[2][oa], fa[6][oa]
        np.testing.assert_array_equal(ga, fb[2][ob], err_msg="gap_on")
        np.testing.assert_array_equal(ta, fb[6][ob], err_msg="tick_on")
        for idx, name in enumerate(names):
            if name in ("gap_on", "tick_on"):
                continue
            m = ga if name.startswith("gap") else (
                ta if name.startswith("tick") else slice(None)
            )
            va, vb = fa[idx][oa], fb[idx][ob]
            if va.dtype == np.float32:
                va, vb = va.view(np.int32), vb.view(np.int32)
            np.testing.assert_array_equal(va[m], vb[m], err_msg=name)


def test_fused_native_pack8_restores_chain_on_infeasible():
    """When the window doesn't fit the factored layout the wrapper must
    return None with the chain state (last_t / last_ln / val_cache)
    EXACTLY as it was, so the classic fallback replays from a pristine
    chain (the C++ walk advances state mid-stream before bailing)."""
    from adder_tpu.ops.native_dvs_plan import plan_dvs_pack8_native

    w, h = 5, 4
    n = w * h
    n_ev = 300
    ts = np.arange(10, 10 + 2 * n_ev, 2, dtype=np.uint32)
    xs = np.full(n_ev, 2, np.uint16)  # one hot pixel -> lane overflow
    ys = np.full(n_ev, 1, np.uint16)
    ps = (np.arange(n_ev) % 2).astype(np.uint8)
    lt = np.full(n, 2, np.uint32)
    ln = np.full(n, np.log1p(128.0 / 255.0), np.float64)
    vc = np.full(n, np.nan, np.float64)
    lt0, ln0, vc0 = lt.copy(), ln.copy(), vc.copy()
    pp = plan_dvs_pack8_native(
        ts, xs, ys, ps, w, n, lt, ln, 0.02, 20, val_cache=vc, lane_cap=8
    )
    from adder_tpu.ops import native_dvs_plan as NP

    if NP._get_lib() is None:
        pytest.skip("native planner unavailable (no g++)")
    assert pp is None
    np.testing.assert_array_equal(lt, lt0)
    np.testing.assert_array_equal(ln, ln0)
    np.testing.assert_array_equal(vc, vc0)
