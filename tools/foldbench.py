#!/usr/bin/env python
"""Ablate the virtual-channel time-fold: front kernel fold=1 vs fold=G at
small channel counts, honest-synced (pre-warmed jitted scalar fetch), plus
the whole-chain block time.  Run ALONE on the tunnel."""

import os
import sys
import time

import numpy as np

C = int(os.environ.get("FB_CHANNELS", "16"))
K = int(os.environ.get("FB_BLOCKS", "32"))
N = int(os.environ.get("FB_FRAMES", "32768"))
FS = 2_048_000
STEPS = int(os.environ.get("FB_STEPS", "30"))
PROTECT = float(os.environ.get("FB_PROTECT", "30000"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from pebblesdr_tpu.ops import decimator, mixer
    from pebblesdr_tpu.ops import pallas_kernels as pk

    plan = decimator.build_plan(FS, PROTECT)
    f = plan.factor
    h = decimator.compose_response(plan)
    d = len(h) - 1
    d_rows = ((d + 7) // 8) * 8
    sub = 2048
    wt = jnp.asarray(np.ascontiguousarray(
        pk.build_composed_w(h, f, sub, d_rows - d).T))
    print(f"# plan factor {f}, D {d}, d_rows {d_rows}", file=sys.stderr)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(K * N, 2 * C)).astype(np.float32)
    splits = [mixer.split_freq(250_000.0, FS)] * C
    hi = jnp.asarray(np.array([s[0] for s in splits]))
    lo = jnp.asarray(np.array([s[1] for s in splits]))
    x_d = jax.jit(lambda b: b + 0)(jnp.asarray(x))
    sync = jax.jit(lambda y: jnp.sum(jnp.abs(y)))

    def bench(fold, sub_v=sub):
        wt_v = wt if sub_v == sub else jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, f, sub_v, d_rows - d).T))
        x_in = (x_d if fold == 1
                else jax.jit(lambda b: b + 0)(
                    jnp.asarray(pk.fold_plane_np(x, fold))))

        @jax.jit
        def run(xin, dc, ph, tl):
            y, dc2, tl2, ph2, _ = pk.fused_front_packed(
                xin, dc, ph, hi, lo, tl, wt_v, f, d_rows, 0.9999,
                sub_block=sub_v, n_block=N, raw_rows=0, fold=fold)
            return y, dc2, tl2, ph2

        dc = jnp.zeros((1, 2 * C), jnp.float32)
        ph = jnp.zeros((C,), jnp.float32)
        tl = jnp.zeros((d_rows, 2 * C), jnp.float32)
        t0 = time.perf_counter()
        y, dc, tl, ph = run(x_in, dc, ph, tl)
        float(sync(y))
        print(f"# fold={fold} sub={sub_v} compile+warm "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                y, dc, tl, ph = run(x_in, dc, ph, tl)
            float(sync(y))
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        ms_blk = dt / (STEPS * K) * 1e3
        print(f"fold={fold} sub={sub_v}: {ms_blk:.4f} ms/block  windows "
              f"{['%.2f' % v for v in dts]}")
        return ms_blk

    # copy floor: same traffic, identity kernel approximated by jnp copy
    @jax.jit
    def copy_run(xin):
        return xin[::f] * 1.0001

    t0 = time.perf_counter()
    float(sync(copy_run(x_d)))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            o = copy_run(x_d)
        float(sync(o))
        dts.append(time.perf_counter() - t0)
    print(f"decimate-copy floor: {min(dts)/(STEPS*K)*1e3:.4f} ms/block")

    import itertools
    subs = [int(v) for v in os.environ.get("FB_SUBS", "2048").split(",")]
    folds = [int(v) for v in os.environ.get("FB_FOLDS", "1,2,4").split(",")]
    for sub_v, fold in itertools.product(subs, folds):
        if 2 * C * fold > 128 or K % fold:
            continue
        bench(fold, sub_v)


if __name__ == "__main__":
    main()
