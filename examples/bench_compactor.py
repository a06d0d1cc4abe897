#!/usr/bin/env python
"""Micro-benchmark: logshift vs static-segment (group) compactor in the
T-resident kernel, on real accelerator hardware (the round-4 compaction
attempt's measurement harness). Mirrors bench.py's mono device loop:
device-resident frames, chained chunks, one hard sync."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from adder_tpu.core.types import Mode, PixelMultiMode, TimeMode
    from adder_tpu.ops import fused_resident as fr
    from adder_tpu.ops import integrate as ops

    H, W, T, n_chunks = 1080, 1920, 64, 4
    BLOCK = 8192
    npx = H * W
    n = ((npx + BLOCK - 1) // BLOCK) * BLOCK
    p = ops.TranscodeParams(
        mode=int(Mode.FramePerfect),
        multi_mode=int(PixelMultiMode.Collapse),
        time_mode=int(TimeMode.DeltaT),
        ref_time=255, delta_t_max=255 * 24,
        c_thresh_max=0, c_increase_velocity=1,
    )
    rng = np.random.default_rng(7)
    x = np.arange(W, dtype=np.float32)[None, :]
    y = np.arange(H, dtype=np.float32)[:, None]
    bg = (128 + 60 * np.sin(x / 97.0) + 30 * np.cos(y / 53.0)).astype(
        np.float32
    )
    frames = np.zeros((T * n_chunks, n), np.uint8)
    cx0 = rng.uniform(0, W, 6)
    cy0 = rng.uniform(0, H, 6)
    vx = rng.uniform(-25, 25, 6)
    vy = rng.uniform(-15, 15, 6)
    for t in range(T * n_chunks):
        img = bg.copy()
        for b in range(6):
            cx = (cx0[b] + vx[b] * t) % W
            cy = (cy0[b] + vy[b] * t) % H
            r2 = (x - cx) ** 2 + (y - cy) ** 2
            img += 90.0 * np.exp(-r2 / (2 * 60.0**2))
        frames[t, :npx] = np.clip(img, 0, 255).astype(np.uint8).reshape(-1)

    state0 = ops.set_initial_d(
        ops.init_state(n, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    chunks = [
        jax.device_put(jnp.asarray(frames[i * T : (i + 1) * T]))
        for i in range(n_chunks)
    ]

    def loop(fn, total_idx):
        outs = fn(state0, chunks[0], jnp.float32(255.0), run0)
        int(jax.device_get(outs[total_idx]))  # warmup compile + sync
        st = outs[0]
        totals = []
        t0 = time.perf_counter()
        for c in chunks[1:]:
            outs = fn(st, c, jnp.float32(255.0), run0)
            st = outs[0]
            totals.append(outs[total_idx])
        int(jax.device_get(totals[-1]))
        dt = (time.perf_counter() - t0) / ((n_chunks - 1) * T)
        return dt, [int(v) for v in jax.device_get(totals)]

    cap = n * T
    ref_fn = fr.make_fused_chunk_resident(
        p, cap, 4, pallas_block=BLOCK, n_real=npx, depth=6,
        emit_running=False,
    )
    dt_ref, tot_ref = loop(ref_fn, 6)
    print(
        f"logshift: {dt_ref*1e3:.3f} ms/interval "
        f"({npx/dt_ref/1e6:.1f} Mpx/s), totals {tot_ref}"
    )

    grp_fn = fr.make_group_chunk_resident(
        p, tail_cap=1 << 20, pack=4, pallas_block=BLOCK, n_real=npx,
        depth=6,
    )
    dt_g, tot_g = loop(grp_fn, 3)
    print(
        f"group:    {dt_g*1e3:.3f} ms/interval "
        f"({npx/dt_g/1e6:.1f} Mpx/s), totals {tot_g}"
    )
    print(f"speedup: {dt_ref/dt_g:.3f}x")


if __name__ == "__main__":
    main()
