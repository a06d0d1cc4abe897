"""Headline benchmark: 1080p framed -> ADDER transcode throughput on TPU.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the driver-set north star is 10x realtime 1080p
mono transcode per chip = 10 * 1920*1080*24 px/s = 497.7 Mpx/s.
vs_baseline = achieved Mpx/s / 497.7.

Measured loop: the fused Pallas chunk (ops/fused_kernel.py — interval
integration + in-kernel event compaction + DMA to the chunk event buffer;
events land compacted in device memory, bit-identical to the reference
semantics), timed with device-resident input frames and a hard sync
(device_get of the event count; block_until_ready is unreliable through
the test-harness tunnel). The reference's criterion bench config
(framed_to_adder_hd.rs): lossless c_thresh 0/0, delta_t_max = 24*ref,
DeltaT.

Input frames are device-resident because the harness tunnel moves
host->device at ~35-60 MB/s (measured: 0.5-0.9 s for one 16-frame 1080p
chunk — 2-4x the compute), which is a harness artifact: locally attached
chips ingest at GB/s. End-to-end through the tunnel (host frames +
submit/collect) measures ~36 Mpx/s; the device number below is the
chip-throughput figure. Device->host event fetch is likewise excluded
(~10 MB/s tunnel), matching the reference's EmptyOutput no-IO bench mode.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adder_tpu.core.types import Mode, PixelMultiMode, TimeMode
    from adder_tpu.ops import integrate as ops

    H, W, T = 1080, 1920, 16
    n_chunks = 6
    BLOCK = 4096
    n = ((H * W + BLOCK - 1) // BLOCK) * BLOCK
    rng = np.random.default_rng(7)

    # synthetic video with realistic activity: static textured background
    # with several moving bright blobs (~5-10% of pixels change per frame)
    x = np.arange(W, dtype=np.float32)[None, :]
    y = np.arange(H, dtype=np.float32)[:, None]
    background = (
        128 + 60 * np.sin(x / 97.0) + 30 * np.cos(y / 53.0)
    ).astype(np.float32)
    frames = np.zeros((T * n_chunks, n), dtype=np.uint8)
    n_blobs = 6
    cx0 = rng.uniform(0, W, n_blobs)
    cy0 = rng.uniform(0, H, n_blobs)
    vx = rng.uniform(-25, 25, n_blobs)
    vy = rng.uniform(-15, 15, n_blobs)
    for t in range(T * n_chunks):
        img = background.copy()
        for b in range(n_blobs):
            cx = (cx0[b] + vx[b] * t) % W
            cy = (cy0[b] + vy[b] * t) % H
            r2 = (x - cx) ** 2 + (y - cy) ** 2
            img += 90.0 * np.exp(-r2 / (2 * 60.0**2))
        frames[t, : H * W] = (
            np.clip(img, 0, 255).astype(np.uint8).reshape(-1)
        )

    # the reference's own criterion bench config (framed_to_adder_hd.rs:24-39)
    p = ops.TranscodeParams(
        mode=int(Mode.FramePerfect),
        multi_mode=int(PixelMultiMode.Collapse),
        time_mode=int(TimeMode.DeltaT),
        ref_time=255,
        delta_t_max=255 * 24,
        c_thresh_max=0,
        c_increase_velocity=1,
    )
    cap = n * T
    # depth-6 arenas: the production default (Video), reference SmallVec
    # inline capacity; depth overflow falls back to deep graphs in Video
    fn = ops.make_fused_chunk(
        p, cap, 4, pallas_block=BLOCK, n_real=H * W, depth=6,
        emit_running=False,
    )

    state = ops.set_initial_d(
        ops.init_state(n, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    chunks = [
        jax.device_put(jnp.asarray(frames[i * T : (i + 1) * T]))
        for i in range(n_chunks)
    ]

    # warmup: compile + the scene's initial burst
    outs = fn(state, chunks[0], jnp.float32(255.0), run0)
    int(jax.device_get(outs[6]))
    state = outs[0]

    # steady state; the tunnel RTT is jittery, so report the median
    times = []
    for c in chunks[1:]:
        t0 = time.perf_counter()
        outs = fn(state, c, jnp.float32(255.0), run0)
        total = int(jax.device_get(outs[6]))  # hard sync
        times.append((time.perf_counter() - t0) / T)
        state = outs[0]
        assert total <= cap, "event capacity overflow in bench"
    dt = float(np.median(times))

    mpx_s = H * W / dt / 1e6
    baseline = 10 * 1920 * 1080 * 24 / 1e6  # 10x realtime 1080p24
    print(
        json.dumps(
            {
                "metric": "framed_to_adder_1080p_mono_transcode",
                "value": round(mpx_s, 2),
                "unit": "Mpx/s",
                "vs_baseline": round(mpx_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
