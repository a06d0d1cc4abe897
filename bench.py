"""Headline benchmark: 1080p framed -> ADDER transcode throughput on TPU.

Prints one JSON line per metric; the LAST line is the headline
{"metric", "value", "unit", "vs_baseline"} the driver records.

Baseline (BASELINE.md): the driver-set north star is 10x realtime 1080p
mono transcode per chip = 10 * 1920*1080*24 px/s = 497.7 Mpx/s.
vs_baseline = achieved Mpx/s / 497.7.

Measured loops:
- device (headline): the T-resident fused Pallas chunk
  (ops/fused_resident.py — pixel state VMEM-resident across the chunk,
  per-slot in-kernel event compaction, events landing compacted in device
  memory), timed with device-resident input frames and a hard sync
  (device_get of the event count; block_until_ready is unreliable through
  the test-harness tunnel). The reference's criterion bench config
  (framed_to_adder_hd.rs): lossless c_thresh 0/0, delta_t_max = 24*ref,
  DeltaT.
- e2e: the same chunks fed from HOST frames through Video.submit/collect
  with events fetched, reassembled to reference order, and ingested into
  the Empty encoder (the reference's no-IO bench semantics,
  codec/empty/stream.rs:9-63). Through the test harness this includes the
  tunnel's ~35-60 MB/s h2d and ~10 MB/s d2h artifacts (locally attached
  chips move GB/s), so it is reported as its own line, not the headline.
- color: device throughput at 1080p 3-channel (n = H*W*3).
- parity: the compiled-TPU resident kernel's assembled event stream vs
  the CPU XLA chunk path on a small plane, byte-compared — a recorded
  gate that the Mosaic kernel matches the reference semantics on real
  hardware.
- dvs device: the resident DVS engine's integration rate over
  pre-planned lane batches (chained dispatches, one sync) — the device
  analogue of the mono loop for event-camera input.
- dvs e2e: the full host-driven Prophesee source (windowed consume ->
  encoder), which on this harness is bounded by per-window tunnel RTTs
  and the 1-core host, not the kernel.
"""

import json
import sys
import time

import numpy as np

BASELINE = 10 * 1920 * 1080 * 24 / 1e6  # 10x realtime 1080p24, Mpx/s

# every metric emitted during the run, in order — re-emitted as one
# compact trailing block so the driver's stdout-tail capture cannot lose
# early sections (round-4 artifact lost the parity gate, color, and
# featureless-e2e lines to tail truncation)
_ALL_METRICS = []


def _emit(metric, value, unit, vs=None):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if vs is not None:
        rec["vs_baseline"] = round(vs, 3)
    _ALL_METRICS.append(rec)
    print(json.dumps(rec), flush=True)


def _emit_trailing_summary(headline_metric):
    """Re-emit every metric compactly, headline LAST (the driver parses
    the final JSON line as the headline record)."""
    print("# == trailing summary: all metrics re-emitted ==", flush=True)
    head = [r for r in _ALL_METRICS if r["metric"] == headline_metric]
    rest = [r for r in _ALL_METRICS if r["metric"] != headline_metric]
    for rec in rest + head[-1:]:
        print(json.dumps(rec, separators=(",", ":")), flush=True)


def _scene(H, W, n, T_total, seed=7):
    rng = np.random.default_rng(seed)
    x = np.arange(W, dtype=np.float32)[None, :]
    y = np.arange(H, dtype=np.float32)[:, None]
    background = (
        128 + 60 * np.sin(x / 97.0) + 30 * np.cos(y / 53.0)
    ).astype(np.float32)
    frames = np.zeros((T_total, n), dtype=np.uint8)
    n_blobs = 6
    cx0 = rng.uniform(0, W, n_blobs)
    cy0 = rng.uniform(0, H, n_blobs)
    vx = rng.uniform(-25, 25, n_blobs)
    vy = rng.uniform(-15, 15, n_blobs)
    for t in range(T_total):
        img = background.copy()
        for b in range(n_blobs):
            cx = (cx0[b] + vx[b] * t) % W
            cy = (cy0[b] + vy[b] * t) % H
            r2 = (x - cx) ** 2 + (y - cy) ** 2
            img += 90.0 * np.exp(-r2 / (2 * 60.0**2))
        frames[t, : H * W] = (
            np.clip(img, 0, 255).astype(np.uint8).reshape(-1)
        )
    return frames


def _bench_params(ops):
    from adder_tpu.core.types import Mode, PixelMultiMode, TimeMode

    # the reference's own criterion bench config (framed_to_adder_hd.rs:24-39)
    return ops.TranscodeParams(
        mode=int(Mode.FramePerfect),
        multi_mode=int(PixelMultiMode.Collapse),
        time_mode=int(TimeMode.DeltaT),
        ref_time=255,
        delta_t_max=255 * 24,
        c_thresh_max=0,
        c_increase_velocity=1,
    )


def _device_loop(jax, jnp, ops, fr, H, W, channels, n_chunks=4, T=64,
                 kernel="group"):
    """kernel='group': the static-segment compactor (the production
    Empty-output/void path — events stay on device, like the reference's
    EmptyOutput bench); 'logshift': the running-offset compactor used by
    event-fetching pipelines."""
    BLOCK = 8192  # fewer grid steps; state+staging fit VMEM comfortably
    npx = H * W * channels
    n = ((npx + BLOCK - 1) // BLOCK) * BLOCK
    frames = _scene(H, W * channels, n, T * n_chunks)
    p = _bench_params(ops)
    # ~0.1 events/px/interval scene; 1/px/interval cap keeps the buffer
    # zero-init + t16 finish passes small (asserted below)
    cap = n * T
    if kernel == "group":
        fn = fr.make_group_chunk_resident(
            p, 1 << 20, 4, pallas_block=BLOCK, n_real=npx, depth=6,
        )
        total_idx = 3
    else:
        fn = fr.make_fused_chunk_resident(
            p, cap, 4, pallas_block=BLOCK, n_real=npx, depth=6,
            emit_running=False,
        )
        total_idx = 6
    state = ops.set_initial_d(
        ops.init_state(n, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    chunks = [
        jax.device_put(jnp.asarray(frames[i * T : (i + 1) * T]))
        for i in range(n_chunks)
    ]
    outs = fn(state, chunks[0], jnp.float32(255.0), run0)
    int(jax.device_get(outs[total_idx]))  # warmup: compile + initial burst
    state = outs[0]
    # pipelined: chain the remaining chunks with no intermediate sync so
    # dispatch and the tunnel's d2h RTT amortize over the whole run; one
    # hard sync (device_get of the last chunk's event count) at the end
    totals = []
    t0 = time.perf_counter()
    for c in chunks[1:]:
        outs = fn(state, c, jnp.float32(255.0), run0)
        state = outs[0]
        totals.append(outs[total_idx])
    int(jax.device_get(totals[-1]))  # hard sync
    dt = (time.perf_counter() - t0) / ((n_chunks - 1) * T)
    for tot in jax.device_get(totals):
        assert int(tot) <= cap, "event capacity overflow in bench"
    return npx / dt / 1e6


def _e2e_loop(jax, jnp, H=1080, W=1920, n_chunks=2, T=16, features=False):
    """Host frames -> Video submit/collect -> events -> Empty encoder.
    features=True additionally runs per-interval FAST-9/16 detection
    (device fast_mask_jax batches + host DBSCAN; ref video.rs:883-1112) —
    the recorded features-on throughput the round-3 verdict asked for."""
    from adder_tpu.core.types import (
        Mode, PixelMultiMode, PlaneSize, TimeMode,
    )
    from adder_tpu.transcoder.video import Video

    frames = _scene(H, W, H * W, T * n_chunks)
    shaped = frames.reshape(-1, H, W, 1)

    video = Video(PlaneSize(W, H, 1), Mode.FramePerfect)
    video.time_parameters(255 * 24, 255, 255 * 24, TimeMode.DeltaT)
    video.update_quality_manual(0, 0, 1, 0, 0)
    if features:
        video.update_detect_features(True)

    def run():
        # pipelined submit: up to two chunks in flight so device compute
        # and event fetch overlap the next chunk's h2d
        t0 = time.perf_counter()
        for i in range(n_chunks):
            video.submit_chunk(shaped[i * T : (i + 1) * T])
        video.flush()
        return time.perf_counter() - t0

    # warm pass on the SAME video: compiles + sticky capacity steps stay
    # learned, so the timed pass reuses the warm executables (a fresh
    # Video would re-pay capacity-step compiles inside the timed region)
    run()
    # decomposed per-stage trace for the timed pass (submit = h2d +
    # dispatch, control_fetch = sync RTT, event_fetch = d2h, assemble +
    # encode = host) — the artifact that separates harness tax from real
    # pipeline serialization
    from adder_tpu.utils import tracing

    was = tracing.enabled()
    tracing.set_enabled(True)
    tracing.reset()
    dt = run() / n_chunks
    tag = " features-on" if features else ""
    print(f"# e2e{tag} stage trace (timed pass):", file=sys.stderr)
    for line in tracing.summary_table().splitlines():
        print(f"#   {line}", file=sys.stderr)
    tracing.set_enabled(was)
    # best-of-2: tunnel congestion swings host-driven sections 2-3x
    dt = min(dt, run() / n_chunks)
    return H * W * T / dt / 1e6


def _parity_check(jax, jnp, ops, fr):
    """Compiled-TPU resident kernel vs CPU XLA chunk: assembled event
    stream byte-compare (skipped silently to False on failure)."""
    H, W, T = 64, 256, 4
    BLOCK = 4096
    n = ((H * W + BLOCK - 1) // BLOCK) * BLOCK
    frames = _scene(H, W, n, T, seed=3)
    p = _bench_params(ops)
    cap = ops.K_SLOTS * n * T
    cpu = jax.devices("cpu")[0]
    try:
        dev = jax.devices()[0]
    except Exception:
        dev = cpu
    state0 = ops.set_initial_d(
        ops.init_state(n, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)

    # reference: CPU XLA path (depth-8 state)
    state0_cpu = jax.device_put(
        ops.set_initial_d(
            ops.init_state(n), jnp.asarray(frames[0].astype(np.int32))
        ),
        cpu,
    )
    with jax.default_device(cpu):
        fx = ops.make_transcode_chunk(p, cap, ops.K_SLOTS)
        ox = fx(
            state0_cpu, jax.device_put(jnp.asarray(frames), cpu),
            jnp.float32(255.0), jax.device_put(run0, cpu),
        )
        tot_x = int(ox[6])
        ref_p = np.asarray(ox[1][:tot_x])
        ref_t = np.asarray(ox[2][:tot_x])

    frz = fr.make_fused_chunk_resident(
        p, cap, 4, pallas_block=BLOCK, n_real=H * W, depth=6,
        emit_running=False,
    )
    og = frz(
        jax.device_put(state0, dev),
        jax.device_put(jnp.asarray(frames), dev),
        jnp.float32(255.0), jax.device_put(run0, dev),
    )
    tot_g = int(jax.device_get(og[6]))
    gp, gt = fr.assemble_resident_events(
        np.asarray(og[1][:tot_g]), np.asarray(og[2][:tot_g]),
        np.asarray(og[10]),
    )
    ok = (
        tot_x == tot_g
        and np.array_equal(ref_p, gp)
        and np.array_equal(ref_t, gt)
    )

    # the group (static-segment) compactor on real hardware vs the same
    # CPU XLA reference — the headline kernel's recorded parity gate
    fgrp = fr.make_group_chunk_resident(
        p, 1 << 16, 4, pallas_block=BLOCK, n_real=H * W, depth=6,
    )
    oh = fgrp(
        jax.device_put(state0, dev),
        jax.device_put(jnp.asarray(frames), dev),
        jnp.float32(255.0), jax.device_put(run0, dev),
    )
    tail_used = int(jax.device_get(oh[4]))
    hp, ht = fr.assemble_group_events(
        np.asarray(oh[1]), np.asarray(oh[2]), np.asarray(oh[7]), BLOCK,
        tail_used,
    )
    ok_grp = (
        int(jax.device_get(oh[3])) == tot_x
        and np.array_equal(ref_p, hp)
        and np.array_equal(ref_t, ht)
    )
    return ok and ok_grp


def _dvs_loop(n_events=100_000, W=346, H=260, span=200_000):
    """Synthetic Prophesee RAW -> ADDER via the batched device path
    (the DVS default; ref serial loop: prophesee.rs:116-297). Host-driven:
    includes host lane planning and (on this harness) the tunnel's
    transfer tax — a conservative lower bound for locally attached chips."""
    import struct
    import tempfile

    from adder_tpu.codec.encoder import EncoderOptions, EncoderType
    from adder_tpu.core.types import PixelMultiMode, SourceCamera, TimeMode
    from adder_tpu.transcoder.prophesee import Prophesee

    rng = np.random.default_rng(2)
    # ~0.2 s of stream: the source consumes 1/60 s windows, and each window
    # costs one device dispatch + sync (a full tunnel RTT on this harness),
    # so the window count — not the event count — bounds throughput here.
    # The workload is kept small: on a 1-core bench host the sticky-scan
    # compiles dominate and the section must stay time-bounded.
    t = np.sort(rng.integers(1000, span, n_events)).astype(np.uint32)
    x = rng.integers(0, W, n_events)
    y = rng.integers(0, H, n_events)
    pol = rng.integers(0, 2, n_events)
    words = (
        (pol.astype(np.uint64) << 28)
        | (y.astype(np.uint64) << 14)
        | x.astype(np.uint64)
    )
    rec = np.empty(n_events * 2, np.uint32)
    rec[0::2] = t
    rec[1::2] = words.astype(np.uint32)
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(f"% Height {H}\n% Width {W}\n".encode())
        f.write(bytes([0, 8]))
        f.write(rec.tobytes())
        path = f.name

    STICKIES = (
        "_scan_take", "_scan_lpad", "_res_cap", "_res_lpad", "_res_epad",
        "_mask_take",
    )

    def run(p, n_ev, seeds=None, view_fps=60, void=False):
        src = Prophesee(20, p, batched=True, view_fps=view_fps)
        src.write_out(
            SourceCamera.Dvs, TimeMode.AbsoluteT, PixelMultiMode.Collapse,
            None, EncoderType.Empty, EncoderOptions.default(src.plane), None,
        )
        # void: the Empty encoder discards everything anyway — skip the
        # event materialization, matching the mono loop's no-IO
        # device-resident convention (reference EmptyOutput semantics)
        src.void_events = void
        # seed the sticky compile shapes so the timed pass reuses the
        # executables the warm pass built
        for k, v in (seeds or {}).items():
            if v:
                setattr(src, k, v)
        t0 = time.perf_counter()
        try:
            while True:
                src.consume()
        except EOFError:
            pass
        if void:
            import jax

            # void mode defers all syncs; device_get is the hard sync
            # (block_until_ready is unreliable through the tunnel)
            jax.device_get(src._dev_state.length[:1])
        return time.perf_counter() - t0, src

    def seeds_of(src):
        return {k: getattr(src, k, 0) for k in STICKIES}

    _, warm = run(path, n_events)  # compiles at the sticky shapes
    # best-of-2: the tunnel's throughput varies minute to minute; the
    # faster pass is the truer code measurement
    dt, _ = run(path, n_events, seeds_of(warm))
    dt2, _ = run(path, n_events, seeds_of(warm))
    windowed = n_events / min(dt, dt2) / 1e6

    # offline bulk mode: one big window (view_fps=1), void output — the
    # integration-rate analogue of the mono device loop, including host
    # lane planning and compact uploads. Steady-state scale: the
    # bootstrap + EOF flush + final sync are FIXED costs (~75 ms on this
    # harness); 1.2M events measures throughput, not those constants,
    # matching the mono loop's convention.
    #
    # Decomposition on this harness (r05 traces): the wall is the carrier
    # h2d TRANSFER — 20 B/event over a ~35 MB/s tunnel is a ~1.75 Mev/s
    # ceiling by arithmetic alone — plus the native planner (~5-9 Mev/s
    # host) ahead of it. The device side (scatter + T-resident sub-steps)
    # measures ~15 Mev/s at these exact shapes when carriers are
    # pre-staged, i.e. the gap vs `prophesee_dvs_device_integrate` is the
    # tunnel's transfer tax, not kernel or scheduling slack; on a locally
    # attached chip (GB/s h2d) the same code is planner-bound.
    n_bulk = 1_200_000
    rng2 = np.random.default_rng(7)
    t2 = np.sort(rng2.integers(1000, 1_200_000, n_bulk)).astype(np.uint32)
    x2 = rng2.integers(0, W, n_bulk)
    y2 = rng2.integers(0, H, n_bulk)
    p2 = rng2.integers(0, 2, n_bulk)
    w2 = (
        (p2.astype(np.uint64) << 28)
        | (y2.astype(np.uint64) << 14)
        | x2.astype(np.uint64)
    )
    rec2 = np.empty(n_bulk * 2, np.uint32)
    rec2[0::2] = t2
    rec2[1::2] = w2.astype(np.uint32)
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(f"% Height {H}\n% Width {W}\n".encode())
        f.write(bytes([0, 8]))
        f.write(rec2.tobytes())
        bulk_path = f.name
    _, warm2 = run(bulk_path, n_bulk, seeds_of(warm), view_fps=1, void=True)
    dt_a, _ = run(bulk_path, n_bulk, seeds_of(warm2), view_fps=1, void=True)
    dt_b, _ = run(bulk_path, n_bulk, seeds_of(warm2), view_fps=1, void=True)
    bulk = n_bulk / min(dt_a, dt_b) / 1e6

    # packed-path device rate at the bulk run's EXACT shapes, carriers
    # pre-staged (device_put outside the timed region): the same
    # engine+scatter the bulk e2e dispatches, minus the tunnel's h2d tax —
    # the apples-to-apples ceiling for the bulk number above.
    import jax
    import jax.numpy as jnp

    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR
    from adder_tpu.ops import integrate as I

    n = warm2.plane.volume()
    ns = warm2._res_nstate
    last_t = np.zeros(n, np.uint32)
    last_ln = np.full(n, float(np.log1p(128.0 / 255.0)), np.float64)
    plan = B.plan_dvs_batch_compact(
        t2, x2, y2, p2, W, n, last_t, last_ln, 0.02, 20
    )
    L_pad = max(4, -(-plan.n_lanes // 4) * 4)
    T, E = 2 * L_pad, len(plan.pix)
    E_pad = max(1024, -(-E // 8192) * 8192)
    cap = 1 << max(16, (max(64, E * 2) - 1).bit_length())
    carrier = jax.device_put(jnp.asarray(FR.pack_dvs_plan(plan, E_pad)))
    fn = FR.make_dvs_chunk_resident_packed(
        warm2._tp(), cap, T, ns, warm2._res_block, depth=16
    )
    st = I.init_state(ns, depth=16)
    outs = fn(st, carrier)
    assert int(jax.device_get(outs[3])) <= cap
    t0 = time.perf_counter()
    s, reps = st, 3
    for _ in range(reps):
        outs = fn(s, carrier)
        s = outs[0]
    jax.device_get(outs[3])
    packed_dev = E * reps / (time.perf_counter() - t0) / 1e6
    return windowed, bulk, packed_dev


def _dvs_device_loop(jax, jnp, n_events=600_000, W=346, H=260, windows=4):
    """Device integration rate of the batched DVS path in bulk-transcode
    batches (Prophesee view_fps lowered, the offline-file mode): lanes are
    planned host-side up front (the planner is numpy; on a locally attached
    host it overlaps the device), then the T-resident DVS kernel's
    dispatches (ops/fused_resident.make_dvs_chunk_resident — the production
    'resident' engine) chain with no intermediate sync — the DVS analogue
    of the mono/color device loops. Ref serial loop: prophesee.rs:116-297."""
    from adder_tpu.core.types import Mode, TimeMode
    from adder_tpu.ops import dvs_batch as B
    from adder_tpu.ops import fused_resident as FR
    from adder_tpu.ops import integrate as I

    rng = np.random.default_rng(5)
    n = W * H
    BLOCK = 4096
    ns = ((n + BLOCK - 1) // BLOCK) * BLOCK
    t = np.sort(rng.integers(1000, 400_000, n_events)).astype(np.uint32)
    x = rng.integers(0, W, n_events)
    y = rng.integers(0, H, n_events)
    pol = rng.integers(0, 2, n_events)
    # mirrors Prophesee._tp(): Continuous, AbsoluteT, dtm = 2*ref
    # (ref: prophesee.rs:70-76)
    p = I.TranscodeParams(
        mode=int(Mode.Continuous),
        time_mode=int(TimeMode.AbsoluteT),
        ref_time=255,
        delta_t_max=510,
        c_thresh_max=10,
        c_increase_velocity=1,
    )
    DEPTH = 16
    last_t = np.zeros(n, np.uint32)
    last_ln = np.full(n, float(np.log1p(128.0 / 255.0)), np.float64)
    bounds = np.linspace(0, n_events, windows + 1).astype(np.int64)
    planes = []  # (intensity, tspan, fvw) f32 stacks per window
    lane_events = []  # events actually carried by each window's kept lanes
    lpad = 0
    for w in range(windows):
        a, b = bounds[w], bounds[w + 1]
        lanes = B.plan_dvs_batch(
            t[a:b], x[a:b], y[a:b], pol[a:b], W, n, last_t, last_ln,
            0.02, p.ref_time,
        )
        kept = lanes[:64]  # one <=64-lane group per dispatch
        # credit only the events the kept lanes actually carry (a window
        # that plans >64 lanes drops the tail from this loop's numerator)
        carried = int(sum(int(ln.tick_mask.sum()) for ln in kept))
        lane_events.append(carried)
        lanes = kept
        lpad = max(lpad, 1 << (len(lanes) - 1).bit_length())
        planes.append(lanes)
    T = 2 * lpad
    cap = 1 << (8 * (n_events // windows) - 1).bit_length()
    stacked = []
    for lanes in planes:
        gi, gf, gt, gm, ti, tf, tt, tm = B.stack_lanes(lanes, lpad)
        inten = np.zeros((T, ns), np.float32)
        tsp = np.zeros((T, ns), np.float32)
        fvw = np.zeros((T, ns), np.int32)
        inten[0::2, :n] = gi
        inten[1::2, :n] = ti
        tsp[0::2, :n] = gt
        tsp[1::2, :n] = tt
        fvw[0::2, :n] = gf | (gm.astype(np.int32) << 8)
        fvw[1::2, :n] = tf | (tm.astype(np.int32) << 8)
        stacked.append(
            tuple(
                jax.device_put(jnp.asarray(a)) for a in (inten, tsp, fvw)
            )
        )
    fn = FR.make_dvs_chunk_resident(p, cap, BLOCK, depth=DEPTH)
    st = I.init_state(ns, depth=DEPTH)
    outs = fn(st, *stacked[0])
    assert int(jax.device_get(outs[3])) <= cap
    st = outs[0]
    t0 = time.perf_counter()
    totals = []
    for s in stacked[1:]:
        outs = fn(st, *s)
        st = outs[0]
        totals.append(outs[3])
    int(jax.device_get(totals[-1]))
    dt = time.perf_counter() - t0
    for tot in jax.device_get(totals):
        assert int(tot) <= cap, "dvs event capacity overflow in bench"
    done = int(sum(lane_events[1:]))  # window 0 was the warmup
    return done / dt / 1e6


_NYC = "/root/reference/adder-codec-rs/tests/samples/nyc_source_v2.adder"


def _nyc_events():
    from adder_tpu.codec.decoder import open_file_decoder

    t0 = time.perf_counter()
    dec = open_file_decoder(_NYC)
    events = dec.digest_all()
    return dec, events, time.perf_counter() - t0


def _framer_loop():
    """Reconstruction throughput (BASELINE config 'ADDER->framed'; ref
    decode-side harness: bin/decode_benchmark.rs:28-32): digest the
    reference nyc fixture, then host-frame it. Returns
    (digest Mev/s, framer Mev/s, frames reconstructed)."""
    from adder_tpu.framer.driver import FramerBuilder

    dec, events, digest_dt = _nyc_events()
    m = dec.meta
    fps = m.tps / max(m.ref_interval, 1)
    fs = (
        FramerBuilder(m.plane)
        .time_parameters(m.tps, m.ref_interval, m.delta_t_max, fps)
        .codec_meta(m.codec_version, m.time_mode)
        .source_info(dec.get_source_type(), m.source_camera)
        .finish()
    )
    t0 = time.perf_counter()
    fs.ingest_event_array(events)
    n_frames = 0
    while fs.is_frame_0_filled():
        fs.pop_next_frame()
        n_frames += 1
    frame_dt = time.perf_counter() - t0

    # device framer (framer/device.py — the accelerator reconstruction
    # path; ref decode_benchmark.rs drives the host one)
    from adder_tpu.framer.device import DeviceFramer

    db = (
        FramerBuilder(m.plane)
        .time_parameters(m.tps, m.ref_interval, m.delta_t_max, fps)
        .codec_meta(m.codec_version, m.time_mode)
        .source_info(dec.get_source_type(), m.source_camera)
    )
    # warm pass: a full ingest+drain (compiles the batch step AND every
    # pop/recycle op shape — a prefix warm leaves the drain ops cold and
    # times ~30 s of XLA compiles on a 1-core host)
    df = DeviceFramer(db)
    df.ingest_event_array(events)
    df.drain()
    # decomposed stage trace on the timed pass: pack/dispatch are host+h2d,
    # sync_fetch and pop_d2h are the link RTTs, convert is host math —
    # the record that separates harness tax from compute (r04 verdict #1)
    from adder_tpu.utils import tracing

    was = tracing.enabled()
    tracing.set_enabled(True)
    tracing.reset()
    df = DeviceFramer(db)
    t0 = time.perf_counter()
    df.ingest_event_array(events)
    dev_frames = len(df.drain())
    dev_dt = time.perf_counter() - t0
    print("# device framer stage trace (timed pass):")
    for line in tracing.summary_table().splitlines():
        print(f"#   {line}")
    tracing.set_enabled(was)
    return (
        len(events) / digest_dt / 1e6,
        len(events) / frame_dt / 1e6,
        n_frames,
        len(events) / dev_dt / 1e6,
        dev_frames,
    )


def _nyc_absolute_t(events):
    """nyc fixture is DeltaT; the ADU pipeline spans absolute time —
    telescope per-pixel deltas to absolute t (same as the compression
    suite's fixture prep)."""
    from adder_tpu.core.types import EventArray

    pix = events.y.astype(np.int64) * 320 + events.x.astype(np.int64)
    order = np.argsort(pix, kind="stable")
    t_abs = events.t.astype(np.uint64).copy()
    spix = pix[order]
    st = events.t[order].astype(np.uint64)
    seg = np.ones(len(spix), bool)
    seg[1:] = spix[1:] != spix[:-1]
    tot = np.cumsum(st)
    base = np.maximum.accumulate(np.where(seg, tot - st, 0))
    t_abs[order] = (tot - base).astype(np.uint64)
    ev = EventArray(
        events.x, events.y, events.c, events.d, t_abs.astype(np.uint32)
    )
    return ev[np.argsort(ev.t, kind="stable")]


def _expected_survivors(ev, ref_interval: int, adu_interval: int):
    """EXACT survivor mask of the compressed stream path, vectorized.

    Replays the ADU rotation (one rotation per triggering event —
    compressed.py ingest_event_array) and the cube ingest drop rule
    (event_cube.rs:127-141: drop when the pixel already kept >1 events and
    t does not advance). The first two stream events of a (pixel, ADU)
    group are always kept, and a dropped event never raises the group's
    running max, so for rank >= 2: keep iff t > cummax(previous t)."""
    n = len(ev)
    t = ev.t.astype(np.int64)
    span = ref_interval * max(adu_interval, 1)
    adu = np.empty(n, np.int64)
    start_t, i, k = 0, 0, 0
    while i < n:
        # first event past the span (order-agnostic, like the real ingest
        # loop — the stream need not be globally t-sorted)
        rel = np.flatnonzero(t[i:] > start_t + span)
        cut = i + int(rel[0]) if len(rel) else n
        adu[i:cut] = k
        if cut >= n:
            break
        adu[cut] = k + 1  # the trigger lands in the NEW adu
        start_t += span
        i, k = cut + 1, k + 1
    pix = (
        ev.y.astype(np.int64) * 65536 + ev.x.astype(np.int64)
    ) * 4 + np.where(ev.c == 255, 0, ev.c).astype(np.int64)
    group = adu * (1 << 34) + pix
    order = np.argsort(group, kind="stable")
    g = group[order]
    ts = t[order]
    new_seg = np.empty(n, bool)
    new_seg[:1] = True
    new_seg[1:] = g[1:] != g[:-1]
    seg_id = np.cumsum(new_seg) - 1
    first = np.flatnonzero(new_seg)
    rank = np.arange(n) - first[seg_id]
    # segmented cummax: a per-segment ramp keeps maxima from crossing
    # segment boundaries (t values are < 2^40 here)
    ramp = seg_id.astype(np.int64) * (1 << 40)
    cm = np.maximum.accumulate(ts + ramp) - ramp
    prev_cm = np.empty(n, np.int64)
    prev_cm[0] = -(1 << 62)
    prev_cm[1:] = cm[:-1]
    prev_cm[new_seg] = -(1 << 62)
    keep_sorted = (rank < 2) | (ts > prev_cm)
    keep = np.empty(n, bool)
    keep[order] = keep_sorted
    return keep


def _compression_loop():
    """Source-modeled entropy coding throughput (BASELINE config
    'compressed .adder'; ref: compressed/stream.rs): encode + decode Mev/s
    and size ratio vs raw, for the reference-compatible addec (CABAC) and
    the TPU-plan addrn (interleaved rANS) codecs, on the nyc fixture.
    Asserts the EXACT survivor multiset (no blanket tolerance) and prints
    the native ingest/transform/entropy stage breakdown."""
    import ctypes
    import io
    import os

    from adder_tpu.codec.compressed import _get_lib
    from adder_tpu.codec.decoder import Decoder
    from adder_tpu.codec.encoder import Encoder, EncoderOptions
    from adder_tpu.core.types import TimeMode

    dec, events, _ = _nyc_events()
    ev = _nyc_absolute_t(events)
    meta = dec.meta
    meta.adu_interval = 10
    meta.codec_version = 3
    meta.time_mode = TimeMode.AbsoluteT
    raw_bytes = len(events) * 9
    keep = _expected_survivors(ev, meta.ref_interval, 10)
    want = ev[np.flatnonzero(keep)]
    want_key = np.lexsort((want.d, want.c, want.x, want.y))
    lib = _get_lib()
    lib.adder_entropy_stats.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int
    ]
    stats = (ctypes.c_uint64 * 6)()
    out = {}
    for entropy in ("cabac", "rans"):
        lib.adder_entropy_stats(stats, 1)  # reset
        buf = io.BytesIO()
        t0 = time.perf_counter()
        enc = Encoder.new_compressed(
            meta, buf, EncoderOptions.default(meta.plane), entropy=entropy
        )
        enc.ingest_event_array(ev)
        enc.close_writer()
        enc_dt = time.perf_counter() - t0
        lib.adder_entropy_stats(stats, 0)
        print(
            f"# {entropy} native stage breakdown: "
            f"ingest {stats[0]/1e6:.1f} ms, transform {stats[1]/1e6:.1f} ms, "
            f"entropy {stats[2]/1e6:.1f} ms over {stats[3]} ADUs "
            f"({stats[5]} coded symbols; cabac reports transform+entropy "
            f"fused under entropy: the model adapts per symbol)"
        )
        data = buf.getvalue()
        buf2 = io.BytesIO(data)
        t0 = time.perf_counter()
        back = Decoder(buf2).digest_all()
        dec_dt = time.perf_counter() - t0
        # EXACT survivor multiset: decode returns cube-raster order, t is
        # lossy-quantized; (x, y, c, d) must match the replayed drop rule
        assert len(back) == len(want), (len(back), len(want))
        back_key = np.lexsort((back.d, back.c, back.x, back.y))
        for f in ("x", "y", "c", "d"):
            assert np.array_equal(
                getattr(back, f)[back_key], getattr(want, f)[want_key]
            ), f"survivor field {f} mismatch"
        out[entropy] = (
            len(ev) / enc_dt / 1e6,
            len(back) / dec_dt / 1e6,
            len(data) / raw_bytes,
        )

    # ADU worker-pool scaling (stream.rs:264-319 spawns per-ADU threads):
    # only measurable where a second core exists — on 1-core hosts the
    # pool is bypassed (see CompressedOutput) and this stays absent
    if (os.cpu_count() or 1) > 1:

        def timed_encode(workers: str) -> float:
            os.environ["ADDER_TPU_ADU_WORKERS"] = workers
            try:
                best = 1e9
                for _ in range(2):
                    buf = io.BytesIO()
                    t0 = time.perf_counter()
                    enc = Encoder.new_compressed(
                        meta, buf, EncoderOptions.default(meta.plane),
                        entropy="rans",
                    )
                    enc.ingest_event_array(ev)
                    enc.close_writer()
                    best = min(best, time.perf_counter() - t0)
                return len(ev) / best / 1e6
            finally:
                os.environ.pop("ADDER_TPU_ADU_WORKERS", None)

        one = timed_encode("0")
        pooled = timed_encode(str(min(4, os.cpu_count())))
        out["pool_scaling"] = (one, pooled, pooled / max(one, 1e-9))
    return out


def _adder_to_dvs_loop(tmp_dir):
    """ADDER->DVS conversion + round trip (BASELINE config e; ref:
    adder-to-dvs/src/main.rs:477): conversion rate on the nyc fixture,
    and an EVENT-DOMAIN round trip — synthetic DVS raw -> Prophesee
    transcode -> .adder -> adder_to_dvs at the same theta -> per-pixel
    polarity-count precision/recall vs the input events. (A frame-PSNR
    round trip is ill-posed: DVS streams carry temporal contrast from an
    unknown absolute level, so reconstructions differ by design.)
    Precision ~1 means the conversion invents essentially nothing;
    recall measures the representation's temporal quantization on an
    adversarially random stream (polarity flips inside one ADDER
    integration span cancel). Returns
    (convert Mev/s, n_dvs_events, precision, recall)."""
    import io
    import os

    from adder_tpu.codec.encoder import EncoderOptions, EncoderType
    from adder_tpu.core.types import (
        PixelMultiMode, SourceCamera, TimeMode,
    )
    from adder_tpu.models.adder_to_dvs import adder_to_dvs
    from adder_tpu.transcoder.prophesee import (
        Prophesee, decode_events_np, parse_header,
    )

    # conversion rate on the reference nyc fixture (real content; the
    # synthetic blob scene is too smooth to cross the DVS theta)
    t0 = time.perf_counter()
    with open(os.path.join(tmp_dir, "nyc.dvs.raw"), "wb") as f:
        nyc_stats = adder_to_dvs(_NYC, f, output_mode="binary",
                                 theta=0.01, max_events=60000)
    conv_dt = time.perf_counter() - t0
    rate = 60000 / conv_dt / 1e6

    def round_trip(tag, t, x, y, p, W, H):
        """DVS raw -> Prophesee transcode -> .adder -> adder_to_dvs at the
        same theta -> per-pixel polarity-count precision/recall."""
        n_ev = len(t)
        w = (
            (p.astype(np.uint64) << 28)
            | (y.astype(np.uint64) << 14)
            | x.astype(np.uint64)
        )
        rec = np.empty(n_ev * 2, np.uint32)
        rec[0::2] = t
        rec[1::2] = w.astype(np.uint32)
        raw = os.path.join(tmp_dir, f"rt_{tag}.raw")
        with open(raw, "wb") as f:
            f.write(f"% Height {H}\n% Width {W}\n".encode())
            f.write(bytes([0, 8]))
            f.write(rec.tobytes())

        a_path = os.path.join(tmp_dir, f"rt_{tag}.adder")
        src = Prophesee(20, raw, batched=True, view_fps=1)  # bulk windows
        theta = src.camera_theta
        src.write_out(
            SourceCamera.Dvs, TimeMode.AbsoluteT, PixelMultiMode.Collapse,
            None, EncoderType.Raw, EncoderOptions.default(src.plane),
            open(a_path, "wb"),
        )
        while True:
            try:
                src.consume()
            except EOFError:
                break
        src.end_write_stream().close()

        out = io.BytesIO()
        stats = adder_to_dvs(a_path, out, output_mode="binary", theta=theta)
        data = out.getvalue()
        bod, _, _, _ = parse_header(io.BytesIO(data))
        _, x2, y2, p2 = decode_events_np(data[bod:])

        def keyed(xa, ya, pa):
            k = (
                ya.astype(np.int64) * W + xa.astype(np.int64)
            ) * 2 + pa.astype(np.int64)
            return np.bincount(k, minlength=W * H * 2)

        ca, cb = keyed(x, y, p), keyed(x2, y2, p2)
        matched = np.minimum(ca, cb).sum()
        precision = float(matched / max(cb.sum(), 1))
        recall = float(matched / max(ca.sum(), 1))
        return precision, recall, stats["n_dvs_events"]

    # (a) adversarially RANDOM stream: per-pixel polarity flips land inside
    # one ADDER integration span and cancel by representation — recall here
    # measures temporal quantization, not conversion quality
    W, H, n_ev = 64, 48, 20000
    rng = np.random.default_rng(3)
    t = np.sort(rng.integers(1000, 120_000, n_ev)).astype(np.uint32)
    x = rng.integers(0, W, n_ev)
    y = rng.integers(0, H, n_ev)
    p = rng.integers(0, 2, n_ev)
    precision, recall, n_rt = round_trip("rand", t, x, y, p, W, H)

    # (b) STRUCTURED scene (r04 verdict item 6): a vertical edge sweeping
    # right — pixel x brightens when the edge arrives at t = 1000 + x*P and
    # darkens when it leaves E ticks later. A real edge is a BURST of
    # same-polarity events (8 x theta = 0.16 log contrast — single events
    # at theta = 0.02 sit below ADDER's D-quantization resolution and
    # vanish in ANY converter); bursts are same-polarity (accumulate — only
    # opposite polarities can cancel) and arrival/departure are separated
    # by E >> delta_t_max so nothing cancels inside one integration span.
    # High recall here demonstrates the random stream's recall loss is
    # representation quantization, not a conversion bug.
    P, E, BURST, STEP = 400, 12_000, 8, 4
    cols = np.arange(W, dtype=np.int64)
    base_on = 1000 + cols * P  # (W,)
    burst = np.arange(BURST, dtype=np.int64) * STEP  # (BURST,)
    # per (col, row, burst-step) event grids, ON then OFF
    ts_on = (base_on[:, None, None] + burst[None, None, :]).repeat(H, axis=1)
    ts_off = ts_on + E
    xg = np.broadcast_to(cols[:, None, None], ts_on.shape)
    yg = np.broadcast_to(
        np.arange(H, dtype=np.int64)[None, :, None], ts_on.shape
    )
    t_s = np.concatenate([ts_on.ravel(), ts_off.ravel()])
    x_s = np.concatenate([xg.ravel(), xg.ravel()])
    y_s = np.concatenate([yg.ravel(), yg.ravel()])
    half = ts_on.size
    p_s = np.concatenate(
        [np.ones(half, np.int64), np.zeros(half, np.int64)]
    )
    o = np.argsort(t_s, kind="stable")
    prec_s, rec_s, _ = round_trip(
        "edge", t_s[o].astype(np.uint32), x_s[o], y_s[o], p_s[o], W, H
    )

    n_total = n_rt + nyc_stats["n_dvs_events"]
    return rate, n_total, precision, recall, prec_s, rec_s


def main():
    import jax
    import jax.numpy as jnp

    from adder_tpu.ops import fused_resident as fr
    from adder_tpu.ops import integrate as ops

    start = time.perf_counter()

    def _mark(name):
        print(
            f"# bench section {name} done at t+{time.perf_counter() - start:.0f}s",
            file=sys.stderr, flush=True,
        )

    try:
        parity = _parity_check(jax, jnp, ops, fr)
    except Exception:
        parity = False
    _emit("tpu_vs_cpu_event_parity", 1.0 if parity else 0.0, "bool")
    _mark("parity")

    try:
        color = _device_loop(jax, jnp, ops, fr, 1080, 1920, 3, n_chunks=3, T=64)
        _emit("framed_to_adder_1080p_color_transcode", color, "Mch-px/s")
    except Exception as e:
        print(f"# color bench failed: {e}", file=sys.stderr)
    _mark("color")

    try:
        e2e = _e2e_loop(jax, jnp)
        _emit(
            "framed_to_adder_1080p_e2e_tunnel", e2e, "Mpx/s", e2e / BASELINE
        )
    except Exception as e:
        print(f"# e2e bench failed: {e}", file=sys.stderr)
    _mark("e2e")

    # features-on e2e (round-3 verdict item 4: FAST detection must not
    # serialize the pipeline — target within ~2x of features-off)
    if time.perf_counter() - start < 1500:
        try:
            e2e_f = _e2e_loop(jax, jnp, features=True)
            _emit(
                "framed_to_adder_1080p_e2e_features", e2e_f, "Mpx/s",
                e2e_f / BASELINE,
            )
        except Exception as e:
            print(f"# e2e features bench failed: {e}", file=sys.stderr)
        _mark("e2e_features")

    # host-driven sections already cost minutes on a slow bench host;
    # protect the headline by skipping DVS when the budget is nearly gone
    if time.perf_counter() - start < 1500:
        try:
            dvsd = _dvs_device_loop(jax, jnp)
            _emit("prophesee_dvs_device_integrate", dvsd, "Mev/s")
        except Exception as e:
            print(f"# dvs device bench failed: {e}", file=sys.stderr)
        _mark("dvs_device")
        try:
            dvs, dvs_bulk, dvs_packed = _dvs_loop()
            _emit("prophesee_to_adder_dvs_transcode", dvs, "Mev/s")
            _emit("prophesee_to_adder_dvs_transcode_bulk", dvs_bulk, "Mev/s")
            _emit("prophesee_dvs_packed_device", dvs_packed, "Mev/s")
        except Exception as e:
            print(f"# dvs bench failed: {e}", file=sys.stderr)
        _mark("dvs")
    else:
        print("# dvs bench skipped: time budget", file=sys.stderr)

    # reconstruction + compression + adder-to-dvs surface (BASELINE
    # configs c/d/e; round-3 verdict items 3 and 8)
    if time.perf_counter() - start < 2000:
        try:
            dig, frm, n_frames, dev_frm, n_dev = _framer_loop()
            _emit("adder_decode_digest", dig, "Mev/s")
            _emit("adder_to_framed_reconstruct", frm, "Mev/s")
            _emit("adder_to_framed_reconstruct_device", dev_frm, "Mev/s")
            print(f"# framer reconstructed {n_frames} frames "
                  f"(device path: {n_dev})", file=sys.stderr)
        except Exception as e:
            print(f"# framer bench failed: {e}", file=sys.stderr)
        _mark("framer")
        try:
            comp = _compression_loop()
            scaling = comp.pop("pool_scaling", None)
            for name, (enc_r, dec_r, ratio) in comp.items():
                tag = "addec" if name == "cabac" else "addrn"
                _emit(f"compressed_{tag}_encode", enc_r, "Mev/s")
                _emit(f"compressed_{tag}_decode", dec_r, "Mev/s")
                _emit(f"compressed_{tag}_ratio_vs_raw", ratio, "x")
            if scaling is not None:
                _emit("compressed_adu_pool_speedup", scaling[2], "x")
                import os as _osmod

                print(
                    f"# ADU pool scaling: inline {scaling[0]:.2f} -> "
                    f"pooled {scaling[1]:.2f} Mev/s on "
                    f"{_osmod.cpu_count()} cores",
                    file=sys.stderr,
                )
        except Exception as e:
            print(f"# compression bench failed: {e}", file=sys.stderr)
        _mark("compression")
        try:
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                rate, n_dvs, prec, rec, prec_s, rec_s = _adder_to_dvs_loop(td)
            _emit("adder_to_dvs_convert", rate, "Mev/s")
            _emit("adder_to_dvs_roundtrip_event_precision", prec, "frac")
            _emit("adder_to_dvs_roundtrip_event_recall", rec, "frac")
            _emit("adder_to_dvs_structured_precision", prec_s, "frac")
            _emit("adder_to_dvs_structured_recall", rec_s, "frac")
            print(f"# adder_to_dvs emitted {n_dvs} DVS events",
                  file=sys.stderr)
        except Exception as e:
            print(f"# adder-to-dvs bench failed: {e}", file=sys.stderr)
        _mark("dvs_roundtrip")
    else:
        print("# framer/compression bench skipped: time budget",
              file=sys.stderr)

    try:
        mono_ls = _device_loop(
            jax, jnp, ops, fr, 1080, 1920, 1, kernel="logshift"
        )
        _emit(
            "framed_to_adder_1080p_mono_logshift", mono_ls, "Mpx/s",
            mono_ls / BASELINE,
        )
    except Exception as e:
        print(f"# mono logshift bench failed: {e}", file=sys.stderr)
    _mark("mono_logshift")

    # T=128 chunks: the counts vector holds one lane per interval (the
    # kernel's T cap), and the bigger chunk amortizes dispatch + sync
    # (+5% over T=64 measured on the v5 chip)
    mono = _device_loop(
        jax, jnp, ops, fr, 1080, 1920, 1, n_chunks=3, T=128, kernel="group"
    )
    _emit(
        "framed_to_adder_1080p_mono_transcode", mono, "Mpx/s",
        mono / BASELINE,
    )
    _mark("mono")
    _emit_trailing_summary("framed_to_adder_1080p_mono_transcode")


if __name__ == "__main__":
    sys.exit(main())
