#!/usr/bin/env python
"""Front-kernel v2 experiments: where do the 0.173 ms/block go, and which
structural changes win?  Honest-sync harness (see tools/truebench.py).

Variants:
  floor   : copy-only kernel (input planes -> decimated-size output) = DMA/grid floor
  v0      : current production kernel (pallas_kernels.fused_front_planes)
  v1      : precomputed fine-phasor table (no per-step 128xC cos/sin)
  v2      : v1 + lane-packed single dot (er|ei concat -> one [m, K]@[K, 2C] dot)
  sub=N   : sweep sub_block (TB_SUB env)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/kbench2.py [variants...]
"""

import functools
import math
import os
import sys
import time

import numpy as np

CHANNELS = int(os.environ.get("TB_CHANNELS", "64"))
FRAMES = int(os.environ.get("TB_FRAMES", "32768"))
BLOCKS = int(os.environ.get("TB_BLOCKS", "8"))
STEPS = int(os.environ.get("TB_STEPS", "40"))
SUB = int(os.environ.get("TB_SUB", "2048"))
FS = 2_048_000
TWO_PI = 2.0 * math.pi
DC_CHUNK = 512


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.ops import decimator
    from pebblesdr_tpu.ops import pallas_kernels as pk

    which = sys.argv[1:] or ["floor", "v0", "v1", "v2"]

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    h = decimator.compose_response(rx.plan)
    d = len(h) - 1
    d_rows = ((d + 7) // 8) * 8
    factor = rx.plan.factor

    t = np.arange(FRAMES) / FS
    env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
    iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)).astype(np.complex64)
    iq_ri = np.broadcast_to(
        np.stack([iq.real, iq.imag]).astype(np.float32)[None, :, :, None],
        (BLOCKS, 2, FRAMES, CHANNELS)).copy()
    iq_dev = jnp.asarray(iq_ri)
    f_hi = jnp.full((CHANNELS,), 0.1220703125, jnp.float32)  # exact in fp32
    f_lo = jnp.zeros((CHANNELS,), jnp.float32)

    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def measure(name, fn, carry, pick):
        s = carry
        s, out = fn(s, iq_dev)
        float(sync(pick(out)))
        s, out = fn(s, iq_dev)
        float(sync(pick(out)))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, out = fn(s, iq_dev)
        float(sync(pick(out)))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        msps = CHANNELS * FRAMES / (dt * 1e-3) / 1e6
        print(f"{name:>34s}: {dt:7.3f} ms/block  ({msps:7.0f} Msps)")
        return dt

    # ---------------- floor: copy-only ------------------------------------
    if "floor" in which:
        def floor_kernel(xr_ref, xi_ref, yr_ref, yi_ref):
            m = yr_ref.shape[0]
            yr_ref[:, :] = xr_ref[:m, :]
            yi_ref[:, :] = xi_ref[:m, :]

        def floor_call(xr, xi, sub):
            n, c = xr.shape
            nsub = n // sub
            m_sub = sub // factor
            return pl.pallas_call(
                floor_kernel, grid=(nsub,),
                in_specs=[pl.BlockSpec((sub, c), lambda s: (s, 0)),
                          pl.BlockSpec((sub, c), lambda s: (s, 0))],
                out_specs=[pl.BlockSpec((m_sub, c), lambda s: (s, 0)),
                           pl.BlockSpec((m_sub, c), lambda s: (s, 0))],
                out_shape=[jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32),
                           jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32)],
            )(xr, xi)

        for sub in (2048, 4096, 8192):
            @jax.jit
            def floorfn(carry, iq_ri, _sub=sub):
                def body(c, blk):
                    yr, yi = floor_call(blk[0], blk[1], _sub)
                    return c, {"ya": jnp.abs(yr) + jnp.abs(yi)}
                return jax.lax.scan(body, carry, iq_ri)
            measure(f"floor copy-only sub={sub}", floorfn, 0.0,
                    lambda o: o["ya"])

    # ---------------- v0: production kernel -------------------------------
    def run_v0(sub, label):
        wt = jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, factor, sub, d_rows - d).T))

        def body(carry, blk):
            dc_ri, phase, tail = carry
            yr, yi, dc_ri, tail, phase, _, _ = pk.fused_front_planes(
                blk[0], blk[1], dc_ri, phase, f_hi, f_lo, tail, wt,
                factor, d_rows, 0.9999, sub_block=sub)
            return (dc_ri, phase, tail), {"ya": jnp.abs(yr) + jnp.abs(yi)}

        @jax.jit
        def fn(carry, iq_ri):
            return jax.lax.scan(body, carry, iq_ri)

        carry0 = (jnp.zeros((2, CHANNELS), jnp.float32),
                  jnp.zeros((CHANNELS,), jnp.float32),
                  jnp.zeros((2 * d_rows, CHANNELS), jnp.float32))
        measure(label, fn, carry0, lambda o: o["ya"])

    if "v0" in which:
        run_v0(2048, "v0 prod sub=2048")
        run_v0(4096, "v0 prod sub=4096")

    # ---------------- v1/v2 kernels ---------------------------------------
    def make_v12(sub, packed_dot):
        c_lanes = CHANNELS
        nchunk = sub // DC_CHUNK
        a_c = 0.9999 ** DC_CHUNK
        m_sub = sub // factor
        nq = sub // 128

        def kern(xr_ref, xi_ref, phase_ref, fhi_ref, flo_ref,
                 finr_ref, fini_ref, wt_ref, dc_in_ref, tail_in_ref,
                 yr_ref, yi_ref, dc_out_ref, tail_out_ref):
            s = pl.program_id(0)
            first = s == 0
            xr = xr_ref[:, :]
            xi = xi_ref[:, :]
            # DC blocker (chunked EWMA)
            mr = jnp.where(first, dc_in_ref[0:1, :], dc_out_ref[0:1, :])
            mi = jnp.where(first, dc_in_ref[1:2, :], dc_out_ref[1:2, :])
            xr3 = xr.reshape(nchunk, DC_CHUNK, c_lanes)
            xi3 = xi.reshape(nchunk, DC_CHUNK, c_lanes)
            mean_r = jnp.mean(xr3, axis=1)
            mean_i = jnp.mean(xi3, axis=1)
            ms_r, ms_i = [], []
            for k in range(nchunk):
                mr = a_c * mr + (1.0 - a_c) * mean_r[k:k + 1, :]
                mi = a_c * mi + (1.0 - a_c) * mean_i[k:k + 1, :]
                ms_r.append(mr)
                ms_i.append(mi)
            dc_out_ref[0:1, :] = mr
            dc_out_ref[1:2, :] = mi
            m_r = jnp.concatenate(ms_r, axis=0)[:, None, :]
            m_i = jnp.concatenate(ms_i, axis=0)[:, None, :]
            zr = (xr3 - m_r).reshape(sub, c_lanes)
            zi = (xi3 - m_i).reshape(sub, c_lanes)
            # NCO with precomputed fine table
            fhi = fhi_ref[0, :][None, :]
            flo = flo_ref[0, :][None, :]
            k0 = (s * sub).astype(jnp.float32)
            ph0 = jnp.mod(phase_ref[0, :][None, :]
                          + jnp.mod(k0 * fhi, 1.0) + k0 * flo, 1.0)
            q_idx = jax.lax.broadcasted_iota(
                jnp.int32, (nq, c_lanes), 0).astype(jnp.float32) * 128.0
            coarse = jnp.mod(ph0 + jnp.mod(q_idx * fhi, 1.0) + q_idx * flo, 1.0)
            cr_ = jnp.cos(TWO_PI * coarse)
            ci_ = jnp.sin(TWO_PI * coarse)
            fr_ = finr_ref[:, :]
            fi_ = fini_ref[:, :]
            or_ = (cr_[:, None, :] * fr_[None, :, :]
                   - ci_[:, None, :] * fi_[None, :, :])
            oi_ = (cr_[:, None, :] * fi_[None, :, :]
                   + ci_[:, None, :] * fr_[None, :, :])
            zr3 = zr.reshape(nq, 128, c_lanes)
            zi3 = zi.reshape(nq, 128, c_lanes)
            yr = (zr3 * or_ + zi3 * oi_).reshape(sub, c_lanes)
            yi = (zi3 * or_ - zr3 * oi_).reshape(sub, c_lanes)
            # composed FIR
            tl = jnp.where(first, tail_in_ref[:, :], tail_out_ref[:, :])
            er = jnp.concatenate([tl[:d_rows, :], yr], axis=0)
            ei = jnp.concatenate([tl[d_rows:, :], yi], axis=0)
            tail_out_ref[:d_rows, :] = er[-d_rows:, :]
            tail_out_ref[d_rows:, :] = ei[-d_rows:, :]
            wt = wt_ref[:, :]
            if packed_dot:
                e2 = jnp.concatenate([er, ei], axis=1)  # [K, 2C]
                y2 = jnp.dot(wt, e2, preferred_element_type=jnp.float32)
                yr_ref[:, :] = y2[:, :c_lanes]
                yi_ref[:, :] = y2[:, c_lanes:]
            else:
                yr_ref[:, :] = jnp.dot(wt, er,
                                       preferred_element_type=jnp.float32)
                yi_ref[:, :] = jnp.dot(wt, ei,
                                       preferred_element_type=jnp.float32)

        wt = jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, factor, sub, d_rows - d).T))
        r_idx = np.arange(128, dtype=np.float64)[:, None]
        fh = np.asarray(f_hi, np.float64)[None, :]
        fl = np.asarray(f_lo, np.float64)[None, :]
        fine = np.mod(np.mod(r_idx * fh, 1.0) + r_idx * fl, 1.0)
        finr = jnp.asarray(np.cos(TWO_PI * fine).astype(np.float32))
        fini = jnp.asarray(np.sin(TWO_PI * fine).astype(np.float32))

        def call(xr, xi, dc_ri, phase0, tail):
            n, c = xr.shape
            nsub = n // sub
            yr, yi, dc2, tail2 = pl.pallas_call(
                kern, grid=(nsub,),
                in_specs=[
                    pl.BlockSpec((sub, c), lambda s: (s, 0)),
                    pl.BlockSpec((sub, c), lambda s: (s, 0)),
                    pl.BlockSpec((1, c), lambda s: (0, 0)),
                    pl.BlockSpec((1, c), lambda s: (0, 0)),
                    pl.BlockSpec((1, c), lambda s: (0, 0)),
                    pl.BlockSpec((128, c), lambda s: (0, 0)),
                    pl.BlockSpec((128, c), lambda s: (0, 0)),
                    pl.BlockSpec((m_sub, d_rows + sub), lambda s: (0, 0)),
                    pl.BlockSpec((2, c), lambda s: (0, 0)),
                    pl.BlockSpec((2 * d_rows, c), lambda s: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((m_sub, c), lambda s: (s, 0)),
                    pl.BlockSpec((m_sub, c), lambda s: (s, 0)),
                    pl.BlockSpec((2, c), lambda s: (0, 0)),
                    pl.BlockSpec((2 * d_rows, c), lambda s: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32),
                    jax.ShapeDtypeStruct((nsub * m_sub, c), jnp.float32),
                    jax.ShapeDtypeStruct((2, c), jnp.float32),
                    jax.ShapeDtypeStruct((2 * d_rows, c), jnp.float32),
                ],
            )(xr, xi, phase0[None, :], f_hi[None, :], f_lo[None, :],
              finr, fini, wt, dc_ri, tail)
            phase2 = jnp.mod(phase0 + jnp.mod(n * f_hi, 1.0) + n * f_lo, 1.0)
            return yr, yi, dc2, tail2, phase2

        def body(carry, blk):
            dc_ri, phase, tail = carry
            yr, yi, dc_ri, tail, phase = call(blk[0], blk[1], dc_ri, phase,
                                              tail)
            return (dc_ri, phase, tail), {"ya": jnp.abs(yr) + jnp.abs(yi)}

        @jax.jit
        def fn(carry, iq_ri):
            return jax.lax.scan(body, carry, iq_ri)

        carry0 = (jnp.zeros((2, CHANNELS), jnp.float32),
                  jnp.zeros((CHANNELS,), jnp.float32),
                  jnp.zeros((2 * d_rows, CHANNELS), jnp.float32))
        return fn, carry0

    if "v1" in which:
        for sub in (2048, 4096):
            fn, c0 = make_v12(sub, packed_dot=False)
            measure(f"v1 fine-table sub={sub}", fn, c0, lambda o: o["ya"])
    if "v2" in which:
        for sub in (2048, 4096):
            fn, c0 = make_v12(sub, packed_dot=True)
            measure(f"v2 fine-table+packed sub={sub}", fn, c0,
                    lambda o: o["ya"])


if __name__ == "__main__":
    main()


def main2():
    """Extra floors: lane-packed [N, 128] input; pure-XLA strided read."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    which = sys.argv[1:]
    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    n, c2 = FRAMES, 2 * CHANNELS
    # generate on device: host->device over the tunnel is ~MB/s-slow
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (BLOCKS, n, c2), jnp.float32))()

    def measure(name, fn, arg):
        out = fn(arg); float(sync(out))
        out = fn(arg); float(sync(out))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(arg)
        float(sync(out))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        bw = BLOCKS and (n * c2 * 4) / (dt * 1e-3) / 1e9
        print(f"{name:>34s}: {dt:7.3f} ms/block  ({bw:6.0f} GB/s read)")

    if "floor128" in which:
        def fk(x_ref, y_ref):
            m = y_ref.shape[0]
            y_ref[:, :] = x_ref[:m, :]

        for sub in (2048, 4096, 8192):
            def call(xb, _sub=sub):
                nsub = n // _sub
                m_sub = _sub // 32
                return pl.pallas_call(
                    fk, grid=(nsub,),
                    in_specs=[pl.BlockSpec((_sub, c2), lambda s: (s, 0))],
                    out_specs=pl.BlockSpec((m_sub, c2), lambda s: (s, 0)),
                    out_shape=jax.ShapeDtypeStruct((nsub * m_sub, c2),
                                                   jnp.float32),
                )(xb)

            @jax.jit
            def fn(x):
                def body(c, xb):
                    y = call(xb)
                    return c, jnp.abs(y)
                _, ya = jax.lax.scan(body, 0.0, x)
                return ya
            measure(f"floor128 packed sub={sub}", fn, x)

    if "floorxla" in which:
        @jax.jit
        def fn(x):
            def body(c, xb):
                return c, jnp.abs(xb[::32, :])
            _, ya = jax.lax.scan(body, 0.0, x)
            return ya
        measure("floor XLA strided slice", fn, x)

        @jax.jit
        def fn2(x):
            def body(c, xb):
                return c, jnp.abs(jnp.sum(xb.reshape(n // 32, 32, c2), axis=1))
            _, ya = jax.lax.scan(body, 0.0, x)
            return ya
        measure("floor XLA reshape-sum", fn2, x)


if __name__ == "__main__" and (set(sys.argv[1:]) & {"floor128", "floorxla"}):
    main2()


def main3():
    """v3: full fused front on a single lane-packed [N, 2C] plane."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.ops import decimator
    from pebblesdr_tpu.ops import pallas_kernels as pk

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    h = decimator.compose_response(rx.plan)
    d = len(h) - 1
    d_rows = ((d + 7) // 8) * 8
    factor = rx.plan.factor
    c = CHANNELS

    f_hi = jnp.full((c,), 0.1220703125, jnp.float32)
    f_lo = jnp.zeros((c,), jnp.float32)
    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (BLOCKS, FRAMES, 2 * c), jnp.float32))()

    def make_v3(sub):
        nchunk = sub // DC_CHUNK
        a_c = 0.9999 ** DC_CHUNK
        m_sub = sub // factor
        nq = sub // 128

        def kern(x_ref, phase_ref, fhi_ref, flo_ref, finr_ref, fini_ref,
                 wt_ref, dc_in_ref, tail_in_ref,
                 y_ref, dc_out_ref, tail_out_ref):
            s = pl.program_id(0)
            first = s == 0
            xx = x_ref[:, :]                       # [sub, 2C]
            # DC blocker: packed lanes are independent
            m = jnp.where(first, dc_in_ref[0:1, :], dc_out_ref[0:1, :])
            x3 = xx.reshape(nchunk, DC_CHUNK, 2 * c)
            means = jnp.mean(x3, axis=1)           # [nchunk, 2C]
            ms = []
            for k in range(nchunk):
                m = a_c * m + (1.0 - a_c) * means[k:k + 1, :]
                ms.append(m)
            dc_out_ref[0:1, :] = m
            mm = jnp.concatenate(ms, axis=0)[:, None, :]
            z = (x3 - mm).reshape(sub, 2 * c)
            zr = z[:, :c]
            zi = z[:, c:]
            # NCO (precomputed fine phasors)
            fhi = fhi_ref[0, :][None, :]
            flo = flo_ref[0, :][None, :]
            k0 = (s * sub).astype(jnp.float32)
            ph0 = jnp.mod(phase_ref[0, :][None, :]
                          + jnp.mod(k0 * fhi, 1.0) + k0 * flo, 1.0)
            q_idx = jax.lax.broadcasted_iota(
                jnp.int32, (nq, c), 0).astype(jnp.float32) * 128.0
            coarse = jnp.mod(ph0 + jnp.mod(q_idx * fhi, 1.0) + q_idx * flo,
                             1.0)
            cr_ = jnp.cos(TWO_PI * coarse)
            ci_ = jnp.sin(TWO_PI * coarse)
            fr_ = finr_ref[:, :]
            fi_ = fini_ref[:, :]
            or_ = (cr_[:, None, :] * fr_[None, :, :]
                   - ci_[:, None, :] * fi_[None, :, :])
            oi_ = (cr_[:, None, :] * fi_[None, :, :]
                   + ci_[:, None, :] * fr_[None, :, :])
            zr3 = zr.reshape(nq, 128, c)
            zi3 = zi.reshape(nq, 128, c)
            yr = (zr3 * or_ + zi3 * oi_).reshape(sub, c)
            yi = (zi3 * or_ - zr3 * oi_).reshape(sub, c)
            ypk = jnp.concatenate([yr, yi], axis=1)  # [sub, 2C]
            # composed FIR, one packed dot
            tl = jnp.where(first, tail_in_ref[:, :], tail_out_ref[:, :])
            e2 = jnp.concatenate([tl, ypk], axis=0)  # [d_rows+sub, 2C]
            tail_out_ref[:, :] = e2[-d_rows:, :]
            y_ref[:, :] = jnp.dot(wt_ref[:, :], e2,
                                  preferred_element_type=jnp.float32)

        wt = jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, factor, sub, d_rows - d).T))
        r_idx = np.arange(128, dtype=np.float64)[:, None]
        fh = np.asarray(f_hi, np.float64)[None, :]
        fl = np.asarray(f_lo, np.float64)[None, :]
        fine = np.mod(np.mod(r_idx * fh, 1.0) + r_idx * fl, 1.0)
        finr = jnp.asarray(np.cos(TWO_PI * fine).astype(np.float32))
        fini = jnp.asarray(np.sin(TWO_PI * fine).astype(np.float32))

        def call(xpk, dc, phase0, tail):
            n = xpk.shape[0]
            nsub = n // sub
            y, dc2, tail2 = pl.pallas_call(
                kern, grid=(nsub,),
                in_specs=[
                    pl.BlockSpec((sub, 2 * c), lambda s: (s, 0)),
                    pl.BlockSpec((1, c), lambda s: (0, 0)),
                    pl.BlockSpec((1, c), lambda s: (0, 0)),
                    pl.BlockSpec((1, c), lambda s: (0, 0)),
                    pl.BlockSpec((128, c), lambda s: (0, 0)),
                    pl.BlockSpec((128, c), lambda s: (0, 0)),
                    pl.BlockSpec((m_sub, d_rows + sub), lambda s: (0, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((d_rows, 2 * c), lambda s: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((m_sub, 2 * c), lambda s: (s, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((d_rows, 2 * c), lambda s: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nsub * m_sub, 2 * c), jnp.float32),
                    jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
                    jax.ShapeDtypeStruct((d_rows, 2 * c), jnp.float32),
                ],
            )(xpk, phase0[None, :], f_hi[None, :], f_lo[None, :],
              finr, fini, wt, dc, tail)
            phase2 = jnp.mod(phase0 + jnp.mod(n * f_hi, 1.0) + n * f_lo, 1.0)
            return y, dc2, tail2, phase2

        def body(carry, blk):
            dc, phase, tail = carry
            y, dc, tail, phase = call(blk, dc, phase, tail)
            return (dc, phase, tail), jnp.abs(y)

        @jax.jit
        def fn(carry, xs):
            return jax.lax.scan(body, carry, xs)

        carry0 = (jnp.zeros((1, 2 * c), jnp.float32),
                  jnp.zeros((c,), jnp.float32),
                  jnp.zeros((d_rows, 2 * c), jnp.float32))
        return fn, carry0

    def measure(name, fn, carry):
        s, out = fn(carry, x)
        float(sync(out))
        s, out = fn(carry, x)
        float(sync(out))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, out = fn(carry, x)
        float(sync(out))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        msps = CHANNELS * FRAMES / (dt * 1e-3) / 1e6
        print(f"{name:>34s}: {dt:7.3f} ms/block  ({msps:7.0f} Msps)")

    for sub in (2048, 4096):
        fn, c0 = make_v3(sub)
        measure(f"v3 packed-plane sub={sub}", fn, c0)


if __name__ == "__main__" and "v3" in sys.argv[1:]:
    main3()


def main4():
    """v4: fully-packed VPU path (pltpu.roll, packed phasor tables);
    v5: v4 + K-tiled dot (two [m/2, K'] dots instead of one [m, K])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
    from pebblesdr_tpu.demod.modes import DemodMode
    from pebblesdr_tpu.ops import decimator
    from pebblesdr_tpu.ops import pallas_kernels as pk

    cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=FRAMES,
                         channels=CHANNELS, mode=DemodMode.AM, agc_stride=16)
    rx = Receiver(cfg)
    h = decimator.compose_response(rx.plan)
    d = len(h) - 1
    d_rows = ((d + 7) // 8) * 8
    factor = rx.plan.factor
    c = CHANNELS

    f_hi_np = np.full((c,), 0.1220703125, np.float64)
    f_lo_np = np.zeros((c,), np.float64)
    sync = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (BLOCKS, FRAMES, 2 * c), jnp.float32))()

    def make(sub, ktiles):
        nchunk = sub // DC_CHUNK
        a_c = 0.9999 ** DC_CHUNK
        m_sub = sub // factor
        nq = sub // 128
        kfull = d_rows + sub

        def kern(x_ref, phase2_ref, fhi2_ref, flo2_ref,
                 fr1_ref, fi1_ref, fi2_ref, fr2_ref,
                 wt_ref, dc_in_ref, tail_in_ref,
                 y_ref, dc_out_ref, tail_out_ref):
            s = pl.program_id(0)
            first = s == 0
            xx = x_ref[:, :]                       # [sub, 2C]
            m = jnp.where(first, dc_in_ref[0:1, :], dc_out_ref[0:1, :])
            x3 = xx.reshape(nchunk, DC_CHUNK, 2 * c)
            means = jnp.mean(x3, axis=1)
            ms = []
            for k in range(nchunk):
                m = a_c * m + (1.0 - a_c) * means[k:k + 1, :]
                ms.append(m)
            dc_out_ref[0:1, :] = m
            mm = jnp.concatenate(ms, axis=0)[:, None, :]
            z = (x3 - mm).reshape(sub, 2 * c)
            # NCO: everything packed on 2C lanes
            fhi = fhi2_ref[0, :][None, :]
            flo = flo2_ref[0, :][None, :]
            k0 = (s * sub).astype(jnp.float32)
            ph0 = jnp.mod(phase2_ref[0, :][None, :]
                          + jnp.mod(k0 * fhi, 1.0) + k0 * flo, 1.0)
            q_idx = jax.lax.broadcasted_iota(
                jnp.int32, (nq, 2 * c), 0).astype(jnp.float32) * 128.0
            coarse = jnp.mod(ph0 + jnp.mod(q_idx * fhi, 1.0) + q_idx * flo,
                             1.0)
            cr2 = jnp.cos(TWO_PI * coarse)          # [nq, 2C]
            ci2 = jnp.sin(TWO_PI * coarse)
            fr1 = fr1_ref[:, :]
            fi1 = fi1_ref[:, :]
            fi2v = fi2_ref[:, :]
            fr2v = fr2_ref[:, :]
            a = (cr2[:, None, :] * fr1[None, :, :]
                 - ci2[:, None, :] * fi1[None, :, :])   # [nq,128,2C]
            b = (cr2[:, None, :] * fi2v[None, :, :]
                 + ci2[:, None, :] * fr2v[None, :, :])
            zsw = pltpu.roll(z, c, 1)               # [zi | zr]
            z3 = z.reshape(nq, 128, 2 * c)
            zs3 = zsw.reshape(nq, 128, 2 * c)
            ypk = (z3 * a + zs3 * b).reshape(sub, 2 * c)
            tl = jnp.where(first, tail_in_ref[:, :], tail_out_ref[:, :])
            e2 = jnp.concatenate([tl, ypk], axis=0)
            tail_out_ref[:, :] = e2[-d_rows:, :]
            if ktiles == 1:
                y_ref[:, :] = jnp.dot(wt_ref[:, :], e2,
                                      preferred_element_type=jnp.float32)
            else:
                mt = m_sub // ktiles
                span = d_rows + mt * factor        # rows touched per tile
                span = ((span + 7) // 8) * 8
                for ti in range(ktiles):
                    base = ti * mt * factor
                    y_ref[ti * mt:(ti + 1) * mt, :] = jnp.dot(
                        wt_ref[ti * mt:(ti + 1) * mt, base:base + span],
                        e2[base:base + span, :],
                        preferred_element_type=jnp.float32)

        wt = jnp.asarray(np.ascontiguousarray(
            pk.build_composed_w(h, factor, sub, d_rows - d).T))
        r_idx = np.arange(128, dtype=np.float64)[:, None]
        fine = np.mod(np.mod(r_idx * f_hi_np[None, :], 1.0)
                      + r_idx * f_lo_np[None, :], 1.0)
        fr = np.cos(TWO_PI * fine)
        fi = np.sin(TWO_PI * fine)
        # osc = conj phasor; mix: yr = zr*or + zi*oi ; yi = zi*or - zr*oi
        # packed: y = z*A + roll(z, C)*B, A = [or|or], B = [oi|-oi]
        fr1 = jnp.asarray(np.concatenate([fr, fr], 1).astype(np.float32))
        fi1 = jnp.asarray(np.concatenate([fi, fi], 1).astype(np.float32))
        fi2 = jnp.asarray(np.concatenate([fi, -fi], 1).astype(np.float32))
        fr2 = jnp.asarray(np.concatenate([fr, -fr], 1).astype(np.float32))
        fhi2 = jnp.asarray(np.concatenate([f_hi_np, f_hi_np]
                                          ).astype(np.float32))
        flo2 = jnp.asarray(np.concatenate([f_lo_np, f_lo_np]
                                          ).astype(np.float32))

        def call(xpk, dc, phase2, tail):
            n = xpk.shape[0]
            nsub = n // sub
            y, dc2, tail2 = pl.pallas_call(
                kern, grid=(nsub,),
                in_specs=[
                    pl.BlockSpec((sub, 2 * c), lambda s: (s, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((128, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((128, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((128, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((128, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((m_sub, kfull), lambda s: (0, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((d_rows, 2 * c), lambda s: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((m_sub, 2 * c), lambda s: (s, 0)),
                    pl.BlockSpec((1, 2 * c), lambda s: (0, 0)),
                    pl.BlockSpec((d_rows, 2 * c), lambda s: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nsub * m_sub, 2 * c), jnp.float32),
                    jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
                    jax.ShapeDtypeStruct((d_rows, 2 * c), jnp.float32),
                ],
            )(xpk, phase2[None, :], fhi2[None, :], flo2[None, :],
              fr1, fi1, fi2, fr2, wt, dc, tail)
            phase2n = jnp.mod(phase2 + jnp.mod(n * fhi2, 1.0) + n * flo2, 1.0)
            return y, dc2, tail2, phase2n

        def body(carry, blk):
            dc, phase2, tail = carry
            y, dc, tail, phase2 = call(blk, dc, phase2, tail)
            return (dc, phase2, tail), jnp.abs(y)

        @jax.jit
        def fn(carry, xs):
            return jax.lax.scan(body, carry, xs)

        carry0 = (jnp.zeros((1, 2 * c), jnp.float32),
                  jnp.zeros((2 * c,), jnp.float32),
                  jnp.zeros((d_rows, 2 * c), jnp.float32))
        return fn, carry0

    def measure(name, fn, carry):
        s, out = fn(carry, x)
        float(sync(out))
        s, out = fn(carry, x)
        float(sync(out))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, out = fn(carry, x)
        float(sync(out))
        dt = (time.perf_counter() - t0) / (STEPS * BLOCKS) * 1e3
        msps = CHANNELS * FRAMES / (dt * 1e-3) / 1e6
        print(f"{name:>34s}: {dt:7.3f} ms/block  ({msps:7.0f} Msps)")

    for sub in (2048, 4096):
        for kt in (1, 2, 4):
            fn, c0 = make(sub, kt)
            measure(f"v4 roll-packed sub={sub} kt={kt}", fn, c0)


if __name__ == "__main__" and "v4" in sys.argv[1:]:
    main4()
