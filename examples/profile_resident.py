"""Profile the T-resident fused kernel per stage at bench shapes.

Usage: python examples/profile_resident.py [T] [BLOCK] [stages...]
Stages: 0 full | 1 skip compaction+DMA | 2 also skip slot packing |
4 state+core only. Prints ms/interval per stage (median over chunks).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    stages = [int(s) for s in sys.argv[3:]] or [4, 2, 1, 0]

    import jax
    import jax.numpy as jnp

    from adder_tpu.ops import fused_resident as fr
    from adder_tpu.ops import integrate as ops

    sys.path.insert(0, ".")
    from bench import _bench_params, _scene

    H, W = 1080, 1920
    npx = H * W
    n = ((npx + BLOCK - 1) // BLOCK) * BLOCK
    n_chunks = 4
    frames = _scene(H, W, n, T * n_chunks)
    p = _bench_params(ops)
    cap = n * T
    state0 = ops.set_initial_d(
        ops.init_state(n, depth=6), jnp.asarray(frames[0].astype(np.int32))
    )
    run0 = jnp.zeros((n,), jnp.uint8)
    chunks = [
        jax.device_put(jnp.asarray(frames[i * T : (i + 1) * T]))
        for i in range(n_chunks)
    ]

    for stage in stages:
        fn = fr.make_fused_chunk_resident(
            p, cap, 4, pallas_block=BLOCK, n_real=npx, depth=6,
            emit_running=False, debug_stage=stage,
        )
        t_c = time.perf_counter()
        outs = fn(state0, chunks[0], jnp.float32(255.0), run0)
        int(jax.device_get(outs[6]))
        compile_s = time.perf_counter() - t_c
        state = outs[0]
        totals = []
        t0 = time.perf_counter()
        for c in chunks[1:]:
            outs = fn(state, c, jnp.float32(255.0), run0)
            state = outs[0]
            totals.append(outs[6])
        int(jax.device_get(totals[-1]))
        dt = (time.perf_counter() - t0) / ((n_chunks - 1) * T)
        print(
            f"stage {stage}: {dt*1e3:.3f} ms/interval "
            f"({npx/dt/1e6:.1f} Mpx/s)  [compile+warm {compile_s:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
