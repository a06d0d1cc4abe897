"""Stage-by-stage cost split of the T-resident fused kernel on hardware.

debug_stage: 4 = state+interval core only | 2 = + slot scan (no packing)
| 1 = + packing/counts | 0 = full (+ per-slot compaction + DMA).
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from adder_tpu.core.types import Mode, PixelMultiMode, TimeMode
    from adder_tpu.ops import fused_resident as fr
    from adder_tpu.ops import integrate as ops

    H, W, T = 1080, 1920, 16
    BLOCK = int(os.environ.get("PROFILE_BLOCK", 4096))
    DEPTH = int(os.environ.get("PROFILE_DEPTH", 6))
    n = ((H * W + BLOCK - 1) // BLOCK) * BLOCK
    rng = np.random.default_rng(7)

    x = np.arange(W, dtype=np.float32)[None, :]
    y = np.arange(H, dtype=np.float32)[:, None]
    background = (
        128 + 60 * np.sin(x / 97.0) + 30 * np.cos(y / 53.0)
    ).astype(np.float32)
    n_chunks = 3
    frames = np.zeros((T * n_chunks, n), dtype=np.uint8)
    for t in range(T * n_chunks):
        img = background + 90.0 * np.exp(
            -((x - (t * 20) % W) ** 2 + (y - 500) ** 2) / (2 * 60.0**2)
        )
        frames[t, : H * W] = np.clip(img, 0, 255).astype(np.uint8).reshape(-1)

    p = ops.TranscodeParams(
        mode=int(Mode.FramePerfect),
        multi_mode=int(PixelMultiMode.Collapse),
        time_mode=int(TimeMode.DeltaT),
        ref_time=255,
        delta_t_max=255 * 24,
        c_thresh_max=0,
        c_increase_velocity=1,
    )
    cap = 4 * n * T

    stages = [int(s) for s in (sys.argv[1:] or [4, 2, 1, 0])]
    results = {}
    for stage in stages:
        fn = fr.make_fused_chunk_resident(
            p, cap, 4, pallas_block=BLOCK, n_real=H * W, depth=DEPTH,
            emit_running=False, debug_stage=stage,
        )
        state = ops.set_initial_d(
            ops.init_state(n, depth=DEPTH),
            jnp.asarray(frames[0].astype(np.int32)),
        )
        run0 = jnp.zeros((n,), jnp.uint8)
        chunks = [
            jax.device_put(jnp.asarray(frames[i * T : (i + 1) * T]))
            for i in range(n_chunks)
        ]
        outs = fn(state, chunks[0], jnp.float32(255.0), run0)
        int(jax.device_get(outs[6]))
        state = outs[0]
        times = []
        for c in chunks[1:]:
            for _ in range(3):
                t0 = time.perf_counter()
                outs = fn(state, c, jnp.float32(255.0), run0)
                int(jax.device_get(outs[6]))  # hard sync
                times.append((time.perf_counter() - t0) / T)
        ms = float(np.median(times)) * 1e3
        results[stage] = ms
        pmax = int(jax.device_get(outs[9]))
        print(f"stage {stage}: {ms:.3f} ms/interval "
              f"({H*W/(ms/1e3)/1e6:.1f} Mpx/s) "
              f"depth_ovf={bool(pmax >> 16)} pack_max={pmax & 0xFFFF}",
              flush=True)

    order = sorted(results)
    for a, b in zip(order, order[1:]):
        print(f"delta stage {b}->{a}: {results[a]-results[b]:+.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
