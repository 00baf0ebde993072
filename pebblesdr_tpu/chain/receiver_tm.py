"""Time-major receive chain prototype: [time, channels] end-to-end.

The round-2 architecture (TODO.md #1) proven in prototype form: every array
keeps channels on the minor (lane) dimension and time on the major axis, so

  * the fused Pallas downconvert runs with NO boundary transposes,
  * every filter/transform in the demod-rate tail is one left-matmul with a
    static operator ([K, L] @ [L, C] rides the MXU),
  * scans (AGC release, EWMAs) are cummax/cumsum along the major axis.

Scope: AM chain (DC removal -> mix+cascade (Pallas) -> FastFIR (DFT matmul)
-> S-meter/squelch -> AGC -> AM demod -> resample), numerically matched
against the channel-major Receiver in tests.  The full mode surface stays on
chain.receiver until round 2 promotes this layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core import db as dbu
from pebblesdr_tpu.core.block import pytree_dataclass
from pebblesdr_tpu.demod.modes import MODE_INFO, DemodMode
from pebblesdr_tpu.ops import agc as agc_mod
from pebblesdr_tpu.ops import decimator, fastfir, fir, mixer, resampler
from pebblesdr_tpu.ops import pallas_kernels as pk
from pebblesdr_tpu.ops import signalstrength, spectrum


@pytree_dataclass
class TmState:
    phase: jax.Array        # [C] mixer phase
    dc: jax.Array           # [1, C] complex chunk-DC estimate (re/im as c64)
    decim_tails: Any        # list of [2*(T-1), C] f32
    ff_r: jax.Array         # [B, C] FastFIR overlap (re)
    ff_i: jax.Array         # [B, C] (im)
    agc_att: jax.Array      # [1, C]
    agc_dec: jax.Array      # [1, C]
    agc_wtail: jax.Array    # [W-1, C]
    agc_delay_r: jax.Array  # [D, C]
    agc_delay_i: jax.Array  # [D, C]
    am_dc: jax.Array        # [1, C]
    am_tail: jax.Array      # [T-1, C]
    rs_tail: jax.Array      # [K, C]


class TimeMajorReceiver:
    def __init__(self, sample_rate: int, frames: int, channels: int,
                 interpret: bool | None = None, sub_block: int = 512):
        self.fs = sample_rate
        self.n = frames
        self.c = channels
        info = MODE_INFO[DemodMode.AM]
        self.plan = decimator.build_plan(sample_rate, info.max_output_bw)
        assert frames % self.plan.factor == 0
        self.rate = int(self.plan.rate_out)
        self.blk = frames // self.plan.factor
        self.taps_tuple = pk.plan_taps_tuple(self.plan)
        self.sub_block = sub_block
        self.interpret = (jax.devices()[0].platform == "cpu"
                          if interpret is None else interpret)

        # FastFIR operators: forward DFT + inverse DFT as [2B, 2B] matrices
        b = self.blk
        k = np.arange(2 * b)
        f_fwd = np.exp(-2j * np.pi * np.outer(k, k) / (2 * b))
        f_inv = np.exp(+2j * np.pi * np.outer(k, k) / (2 * b)) / (2 * b)
        self._fwd_r = jnp.asarray(f_fwd.real.astype(np.float32))
        self._fwd_i = jnp.asarray(f_fwd.imag.astype(np.float32))
        self._inv_r = jnp.asarray(f_inv.real.astype(np.float32))
        self._inv_i = jnp.asarray(f_inv.imag.astype(np.float32))

        # zoom power operator (fftshifted, windowed) for S-meter/squelch
        wz, cgz = spectrum.make_window(b)
        kk = np.arange(b)
        fz = np.exp(-2j * np.pi * np.outer(np.fft.fftshift(kk), kk) / b)
        fz = fz * wz[None, :] / (b * cgz)
        self._zoom_r = jnp.asarray(fz.real.astype(np.float32))
        self._zoom_i = jnp.asarray(fz.imag.astype(np.float32))

        # AGC config
        self.agc_cfg = agc_mod.AGCConfig.make(self.rate, "med")

        # AM post-detect LP as a left operator [M, L]
        am_taps = fir.design_lowpass_kaiser(info.default_filter / 2.0,
                                            self.rate, atten_db=50.0)
        self.am_t = len(am_taps)
        bmat = np.zeros((b, b + self.am_t - 1), np.float32)
        for out_i in range(b):
            for j in range(self.am_t):
                bmat[out_i, out_i + self.am_t - 1 - j] = am_taps[j]
        self._am_op = jnp.asarray(bmat)

        # resampler as a left operator [M_out, K+B]
        self.rs_plan = resampler.plan(self.rate, 48000, b)
        self._rs_op = jnp.asarray(self.rs_plan.dense.T.copy())
        self.audio_blk = self.rs_plan.n_out

        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    # ------------------------------------------------------------------ state

    def init_state(self) -> TmState:
        c, b = self.c, self.blk
        cfg = self.agc_cfg
        floor = float(np.log10(agc_mod.MIN_CONSTANT))
        return TmState(
            phase=jnp.zeros((c,), jnp.float32),
            dc=jnp.zeros((1, c), jnp.complex64),
            decim_tails=[jnp.zeros((2 * (len(t) - 1), c), jnp.float32)
                         for t in self.taps_tuple],
            ff_r=jnp.zeros((b, c), jnp.float32),
            ff_i=jnp.zeros((b, c), jnp.float32),
            agc_att=jnp.full((1, c), floor, jnp.float32),
            agc_dec=jnp.full((1, c), floor, jnp.float32),
            agc_wtail=jnp.full((cfg.window - 1, c), floor, jnp.float32),
            agc_delay_r=jnp.zeros((cfg.delay, c), jnp.float32),
            agc_delay_i=jnp.zeros((cfg.delay, c), jnp.float32),
            am_dc=jnp.zeros((1, c), jnp.float32),
            am_tail=jnp.zeros((self.am_t - 1, c), jnp.float32),
            rs_tail=jnp.zeros((self.rs_plan.taps, c), jnp.float32),
        )

    def make_params(self, tune_hz, lo_hz=-6000.0, hi_hz=6000.0):
        tunes = np.broadcast_to(np.asarray(tune_hz, np.float64), (self.c,))
        splits = [mixer.split_freq(t, self.fs) for t in tunes]
        mask_c = fastfir.design_mask(lo_hz, hi_hz, self.rate, self.blk)
        band, noise = signalstrength.band_masks(lo_hz, hi_hz, self.rate, self.blk)
        return {
            "fhi": jnp.asarray(np.stack([s[0] for s in splits])),
            "flo": jnp.asarray(np.stack([s[1] for s in splits])),
            "mask_r": jnp.asarray(mask_c.real.astype(np.float32))[:, None],
            "mask_i": jnp.asarray(mask_c.imag.astype(np.float32))[:, None],
            "sm_band": jnp.asarray(band)[:, None],
            "sm_noise": jnp.asarray(noise)[:, None],
        }

    # ------------------------------------------------------------------- step

    def step(self, state, params, xr_t, xi_t):
        """xr_t/xi_t: [N, C] float32 time-major IQ planes."""
        return self._step(state, params, xr_t, xi_t)

    def _step_impl(self, state: TmState, params, xr_t, xi_t):
        n, c = xr_t.shape
        b = self.blk

        # --- chunked DC removal (axis 0) ------------------------------------
        chunk = 512
        xr3 = xr_t.reshape(n // chunk, chunk, c)
        xi3 = xi_t.reshape(n // chunk, chunk, c)
        means = jnp.mean(xr3, axis=1) + 1j * jnp.mean(xi3, axis=1)  # [K, C]
        a_c = 0.9999 ** chunk

        def ewma_axis0(carry, seq):
            def f(m_prev, mk):
                m = a_c * m_prev + (1 - a_c) * mk
                return m, m
            last, ms = jax.lax.scan(f, carry[0], seq)
            return last[None, :], ms

        dc_last, dcs = ewma_axis0(state.dc, means)
        xr_t = (xr3 - dcs.real[:, None, :]).reshape(n, c)
        xi_t = (xi3 - dcs.imag[:, None, :]).reshape(n, c)

        # --- fused Pallas mix + cascade (no transposes) ----------------------
        yr, yi, new_tails = pk.fused_downconvert_planes(
            xr_t, xi_t, state.phase, params["fhi"], params["flo"],
            list(state.decim_tails), self.taps_tuple,
            sub_block=self.sub_block, interpret=self.interpret)
        nf = jnp.float32(n)
        new_phase = jnp.mod(state.phase + jnp.mod(nf * params["fhi"], 1.0)
                            + nf * params["flo"], 1.0)

        # --- zoom power -> S-meter/squelch (one complex matmul) --------------
        zr = self._zoom_r @ yr - self._zoom_i @ yi
        zi = self._zoom_r @ yi + self._zoom_i @ yr
        power = zr * zr + zi * zi                       # [B, C] fftshifted
        power = jax.lax.optimization_barrier(power)
        nb = jnp.maximum(jnp.sum(params["sm_band"]), 1.0)
        nn = jnp.maximum(jnp.sum(params["sm_noise"]), 1.0)
        sig = jnp.sum(power * params["sm_band"], axis=0) / nb
        noi = jnp.sum(power * params["sm_noise"], axis=0) / nn
        snr_db = dbu.power_to_db(sig) - dbu.power_to_db(noi)

        # --- FastFIR overlap-save via DFT matmuls ----------------------------
        er = jnp.concatenate([state.ff_r, yr], axis=0)  # [2B, C]
        ei = jnp.concatenate([state.ff_i, yi], axis=0)
        sr = self._fwd_r @ er - self._fwd_i @ ei
        si = self._fwd_r @ ei + self._fwd_i @ er
        mr, mi = params["mask_r"], params["mask_i"]
        fr = sr * mr - si * mi
        fi = sr * mi + si * mr
        or_ = self._inv_r @ fr - self._inv_i @ fi
        oi = self._inv_r @ fi + self._inv_i @ fr
        xr_b = or_[b:, :]
        xi_b = oi[b:, :]

        # --- AGC (axis-0 cummax forms) ---------------------------------------
        cfg = self.agc_cfg
        logmag = jnp.log10(jnp.sqrt(xr_b * xr_b + xi_b * xi_b)
                           + agc_mod.MIN_CONSTANT)
        ext = jnp.concatenate([state.agc_wtail, logmag], axis=0)
        # van Herk along axis 0
        w = cfg.window
        l = ext.shape[0]
        nblk = -(-l // w)
        pad = nblk * w - l
        padded = jnp.pad(ext, ((0, pad), (0, 0)), constant_values=-np.inf)
        blocks = padded.reshape(nblk, w, c)
        pre = jax.lax.cummax(blocks, axis=1).reshape(nblk * w, c)
        suf = jax.lax.cummax(blocks[:, ::-1, :], axis=1)[:, ::-1, :].reshape(nblk * w, c)
        m_out = l - w + 1
        peak = jnp.maximum(suf[:m_out], pre[w - 1:w - 1 + m_out])  # [B, C]
        new_wtail = ext[-(w - 1):, :]
        decay_ms, _ = agc_mod.MODES[cfg.mode]
        d = 0.43429448 / max(decay_ms / 1000.0, 1e-3) / cfg.sample_rate
        tilt = d * jnp.arange(b, dtype=jnp.float32)[:, None]
        pp = peak.at[0, :].set(jnp.maximum(peak[0], state.agc_dec[0] - d))
        env = jax.lax.cummax(pp + tilt, axis=0) - tilt
        new_dec = env[-1:, :]
        att_coef = 1.0 - float(np.exp(-1.0 / max(cfg.sample_rate
                                                 * agc_mod.ATTACK_RISE_TIMECONST, 1.0)))
        a = 1.0 - att_coef
        kk = jnp.arange(b, dtype=jnp.float32)[:, None]
        a_pow = jnp.exp(kk * float(np.log(a)))
        a_inv = jnp.exp(-kk * float(np.log(a)))
        seed = a * state.agc_att
        level = a_pow * (seed + jnp.cumsum(att_coef * env * a_inv, axis=0))
        new_att = level[-1:, :]
        knee = cfg.threshold_db / 20.0
        log_gain = jnp.where(level > knee, -level, -knee)
        gain = jnp.power(10.0, log_gain) * agc_mod.AGC_OUTSCALE
        fullr = jnp.concatenate([state.agc_delay_r, xr_b], axis=0)
        fulli = jnp.concatenate([state.agc_delay_i, xi_b], axis=0)
        xr_g = fullr[:b, :] * gain
        xi_g = fulli[:b, :] * gain
        new_del_r = fullr[b:, :]
        new_del_i = fulli[b:, :]

        # --- AM demod: magnitude -> DC block -> LP matmul --------------------
        # chunked piecewise-constant DC estimate, matching demod/am.py's
        # dc_removal_chunked(chunk=256) so both layouts agree bit-for-bit
        mag = jnp.sqrt(xr_g * xr_g + xi_g * xi_g)
        alpha = 0.9999
        chunk_am = 256
        if b % chunk_am == 0:
            mag3 = mag.reshape(b // chunk_am, chunk_am, c)
            am_means = jnp.mean(mag3, axis=1)               # [K, C]
            a_am = alpha ** chunk_am

            def am_ewma(m_prev, mk):
                m = a_am * m_prev + (1 - a_am) * mk
                return m, m

            am_last, am_m = jax.lax.scan(am_ewma, state.am_dc[0], am_means)
            new_am_dc = am_last[None, :]
            audio = (mag3 - am_m[:, None, :]).reshape(b, c)
        else:
            kk2 = jnp.arange(b, dtype=jnp.float32)[:, None]
            ap = jnp.exp(kk2 * float(np.log(alpha)))
            ai = jnp.exp(-kk2 * float(np.log(alpha)))
            m_seed = alpha * state.am_dc
            m_est = ap * (m_seed + jnp.cumsum((1 - alpha) * mag * ai, axis=0))
            new_am_dc = m_est[-1:, :]
            audio = mag - m_est
        ext_a = jnp.concatenate([state.am_tail, audio], axis=0)  # [B+T-1, C]
        audio = self._am_op @ ext_a
        new_am_tail = ext_a[-(self.am_t - 1):, :]

        # --- resample ---------------------------------------------------------
        ext_r = jnp.concatenate([state.rs_tail, audio], axis=0)
        audio48 = self._rs_op @ ext_r
        new_rs_tail = ext_r[-self.rs_plan.taps:, :]

        new_state = TmState(
            phase=new_phase, dc=dc_last, decim_tails=new_tails,
            ff_r=yr, ff_i=yi, agc_att=new_att, agc_dec=new_dec,
            agc_wtail=new_wtail, agc_delay_r=new_del_r, agc_delay_i=new_del_i,
            am_dc=new_am_dc, am_tail=new_am_tail, rs_tail=new_rs_tail)
        out = {"audio": audio48, "snr_db": snr_db,
               "signal_db": dbu.power_to_db(sig)}
        return new_state, out
