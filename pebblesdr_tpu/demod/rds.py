"""RDS (Radio Data System) decode: 57 kHz BPSK subcarrier -> PS/RadioText.

Capability parity with the reference RDS path (demod_wfm.cpp:297-353 device
side; rdsdecode.{h,cpp} + rbdsconstants.h host side):
  * 57 kHz subcarrier downconvert + decimate (CDownConvert :297),
  * subcarrier recovery (RDS PLL) — here a Costas loop for BPSK,
  * matched filter + symbol-rate sampling + differential decode (:301-353),
  * 26-bit block syndrome check with offset words A/B/C/C'/D, group sync,
    and group assembly into PI / PTY / PS name / RadioText
    (checkBlock :708+, processNewRdsBit :583+, CRdsDecode).

TPU/host split: everything through soft symbol values is jit'd JAX
(RdsDemod.process); bit slicing, block sync, and text assembly are a small
host state machine (RdsBlockDecoder / RdsGroupDecoder) — bit-level control
flow XLA has no business compiling.

Rate plan: composite (e.g. 512 kHz) -> mix -57 kHz -> halfband cascade to
16 kHz -> polyphase resample to 19 kHz = EXACTLY 16 samples per RDS symbol
(1187.5 baud * 16 = 19000), so symbol timing is a static reshape + argmax
over 16 phases instead of the reference's per-sample bit-sync resonator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.core.block import pytree_dataclass, static_field
from pebblesdr_tpu.ops import decimator, fir, pll, resampler

RDS_CARRIER_HZ = 57000.0
RDS_BAUD = 1187.5
SPS = 16  # samples per symbol at 19 kHz


@pytree_dataclass
class RdsConfig:
    composite_rate: float = static_field()
    plan: object = static_field()           # decimator plan composite->16k
    rs_plan: object = static_field()        # 16k -> 19k resampler
    pll: pll.PLLConfig = static_field()
    mf_taps: np.ndarray = static_field()    # biphase matched filter @19k
    n_sym: int = static_field()             # symbols per block

    @staticmethod
    def make(composite_rate: float, block: int) -> "RdsConfig":
        plan = decimator.build_plan(composite_rate, 4800.0, sample_rate_out=16000)
        assert plan.rate_out == 16000.0, plan.rate_out
        n16 = block // plan.factor
        rs = resampler.plan(16000, 19000, n16, taps=16)
        n19 = rs.n_out
        assert n19 % SPS == 0, (n19, "block must yield whole RDS symbols")
        # biphase (Manchester) matched filter: +half, -half of a symbol
        half = SPS // 2
        mf = np.concatenate([np.ones(half), -np.ones(half)]) / SPS
        cfg_pll = pll.make_pll_config(19000.0, bw_hz=30.0, zeta=0.707,
                                      center_hz=0.0, range_hz=100.0,
                                      detector="costas")
        return RdsConfig(composite_rate=composite_rate, plan=plan, rs_plan=rs,
                         pll=cfg_pll, mf_taps=mf, n_sym=n19 // SPS)


@pytree_dataclass
class RdsState:
    decim: tuple
    resamp: jax.Array
    pll: pll.PLLState
    mf_tail: jax.Array
    phase_acc: jax.Array   # [C, SPS] EWMA of |mf| per symbol phase (timing)


def rds_init(cfg: RdsConfig, channels: int) -> RdsState:
    return RdsState(
        decim=decimator.state_init(cfg.plan, channels),
        resamp=resampler.state_init(cfg.rs_plan, channels, jnp.complex64),
        pll=pll.pll_init(cfg.pll, channels),
        mf_tail=fir.fir_tail_init(channels, len(cfg.mf_taps), jnp.float32),
        phase_acc=jnp.zeros((channels, SPS), jnp.float32),
    )


def rds_process(cfg: RdsConfig, state: RdsState, rds_baseband: jax.Array):
    """rds_baseband: [C, N] complex64 (composite already mixed by -57 kHz).

    Returns (state', soft [C, n_sym] float32 soft symbol values, timing_phase
    [C] int32) — sign(soft) are the biphase symbols; host does the rest.
    """
    st_d, x = decimator.apply(cfg.plan, state.decim, rds_baseband)      # 16 k
    st_r, x = resampler.apply(cfg.rs_plan, state.resamp, x)             # 19 k
    st_p, phases, _ = pll.pll_run(cfg.pll, state.pll, x)                # carrier
    coherent = (x * jnp.exp(-1j * phases.astype(jnp.complex64))).real   # BPSK
    taps = jnp.asarray(cfg.mf_taps, jnp.float32)
    mf, mf_tail = fir.fir_apply_real_signal(coherent, taps, state.mf_tail)
    c, n19 = mf.shape
    sym = mf.reshape(c, cfg.n_sym, SPS)
    # symbol-timing: EWMA the mean |mf| per intra-symbol phase, sample at max
    acc = 0.9 * state.phase_acc + 0.1 * jnp.mean(jnp.abs(sym), axis=1)
    best = jnp.argmax(acc, axis=-1)                                      # [C]
    soft = jnp.take_along_axis(sym, best[:, None, None], axis=-1)[..., 0]
    new_state = RdsState(decim=st_d, resamp=st_r, pll=st_p, mf_tail=mf_tail,
                         phase_acc=acc)
    return new_state, soft, best.astype(jnp.int32)


# ---------------------------------------------------------------- host side

# parity-check generator g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1 (CENELEC EN 50067)
_G = 0b10110111001
_OFFSETS = {
    "A": 0b0011111100,
    "B": 0b0110011000,
    "C": 0b0101101000,
    "Cp": 0b1101010000,
    "D": 0b0110110100,
}
_BLOCK_SEQ = ["A", "B", "C", "D"]  # C may be C' in B-version groups


def _syndrome(block26: int) -> int:
    """10-bit syndrome of a 26-bit block (information*2^10 + checkword)."""
    reg = block26
    for i in range(25, 9, -1):
        if reg & (1 << i):
            reg ^= _G << (i - 10)
    return reg & 0x3FF


def _expected_offset(name: str) -> int:
    return _OFFSETS[name]


@dataclasses.dataclass
class RdsBlockDecoder:
    """Bits -> synced 26-bit blocks -> 4-block groups (checkBlock/
    processNewRdsBit capability).  Differential decode included."""

    synced: bool = False
    _bits: int = 0
    _nbits: int = 0
    _last_raw: int = 0
    _block_idx: int = 0
    _group: list = dataclasses.field(default_factory=list)
    groups: list = dataclasses.field(default_factory=list)
    block_errors: int = 0
    blocks_ok: int = 0

    def feed_symbols(self, symbols: np.ndarray) -> None:
        """symbols: [n] biphase symbol signs (+-1 or bool).  RDS data is
        differentially encoded: bit = sym[k] XOR sym[k-1]."""
        raw = (np.asarray(symbols) > 0).astype(np.uint8)
        for s in raw:
            bit = int(s ^ self._last_raw)
            self._last_raw = int(s)
            self._push_bit(bit)

    def _push_bit(self, bit: int) -> None:
        self._bits = ((self._bits << 1) | bit) & ((1 << 26) - 1)
        self._nbits += 1
        if not self.synced:
            if self._nbits >= 26:
                for i, name in enumerate(_BLOCK_SEQ):
                    if _syndrome(self._bits) == _expected_offset(name):
                        self.synced = True
                        self._block_idx = i
                        self._take_block(name)
                        return
            return
        if self._nbits >= 26:
            self._nbits = 0
            name = _BLOCK_SEQ[self._block_idx]
            syn = _syndrome(self._bits)
            if name == "C" and syn == _expected_offset("Cp"):
                name = "Cp"
            if syn == _expected_offset(name):
                self._take_block(name)
            else:
                self.block_errors += 1
                self._group = []
                self._block_idx = (self._block_idx + 1) % 4
                if self.block_errors % 16 == 0:
                    self.synced = False  # resync after sustained errors

    def _take_block(self, name: str) -> None:
        info = self._bits >> 10
        self.blocks_ok += 1
        self._nbits = 0
        if name == "A":
            self._group = [info]
        else:
            self._group.append(info)
        if len(self._group) == 4 and name in ("D",):
            self.groups.append(tuple(self._group))
            self._group = []
        self._block_idx = (self._block_idx + 1) % 4


_PTY_NAMES_RBDS = [
    "None", "News", "Information", "Sports", "Talk", "Rock", "Classic Rock",
    "Adult Hits", "Soft Rock", "Top 40", "Country", "Oldies", "Soft",
    "Nostalgia", "Jazz", "Classical", "R&B", "Soft R&B", "Language",
    "Religious Music", "Religious Talk", "Personality", "Public", "College",
    "Spanish Talk", "Spanish Music", "Hip-Hop", "", "", "Weather",
    "Emergency Test", "Emergency",
]


@dataclasses.dataclass
class RdsGroupDecoder:
    """Groups -> station data (CRdsDecode capability: PI, PTY, PS name,
    RadioText, callsign from PI for RBDS)."""

    pi: int = 0
    pty: int = 0
    ps: list = dataclasses.field(default_factory=lambda: [" "] * 8)
    rt: list = dataclasses.field(default_factory=lambda: [" "] * 64)

    def decode(self, group: tuple[int, int, int, int]) -> None:
        a, b, c, d = group
        self.pi = a
        gtype = (b >> 12) & 0xF
        version_b = (b >> 11) & 1
        self.pty = (b >> 5) & 0x1F
        if gtype == 0:  # PS name
            seg = b & 0x3
            self.ps[2 * seg] = chr((d >> 8) & 0xFF)
            self.ps[2 * seg + 1] = chr(d & 0xFF)
        elif gtype == 2:  # RadioText
            seg = b & 0xF
            if version_b:
                self.rt[2 * seg] = chr((d >> 8) & 0xFF)
                self.rt[2 * seg + 1] = chr(d & 0xFF)
            else:
                self.rt[4 * seg] = chr((c >> 8) & 0xFF)
                self.rt[4 * seg + 1] = chr(c & 0xFF)
                self.rt[4 * seg + 2] = chr((d >> 8) & 0xFF)
                self.rt[4 * seg + 3] = chr(d & 0xFF)

    @property
    def ps_name(self) -> str:
        return "".join(self.ps)

    @property
    def radiotext(self) -> str:
        return "".join(self.rt).rstrip()

    @property
    def pty_name(self) -> str:
        return _PTY_NAMES_RBDS[self.pty] if self.pty < 32 else ""

    @property
    def callsign(self) -> str:
        """RBDS PI -> US callsign (rbdsconstants.h capability, K/W stations)."""
        pi = self.pi
        if 0x1000 <= pi <= 0x994F:
            if pi < 0x54A8:
                first, n = "K", pi - 0x1000
            else:
                first, n = "W", pi - 0x54A8
            c1, rem = divmod(n, 26 * 26)
            c2, c3 = divmod(rem, 26)
            return first + chr(65 + c1) + chr(65 + c2) + chr(65 + c3)
        return ""


def encode_group(a: int, b: int, c: int, d: int, version_b=False) -> list[int]:
    """Test helper: build the 104-bit differential-ready block bitstream for
    one group (information + checkwords + offsets)."""
    out_bits = []
    names = ["A", "B", "Cp" if version_b else "C", "D"]
    for info, name in zip((a, b, c, d), names):
        block = info << 10
        check = _syndrome(block) ^ _expected_offset(name)
        block |= check
        # verify
        assert _syndrome(block) == _expected_offset(name)
        out_bits.extend((block >> i) & 1 for i in range(25, -1, -1))
    return out_bits
