"""RDS decode tests: block coding roundtrip + full signal path through the
WFM receiver (composite synthesis -> FM -> chain -> PS name recovery)."""

import numpy as np
import pytest

from pebblesdr_tpu.demod import rds


def make_ps_groups(pi, ps_text, repeats=8):
    """0A groups carrying an 8-char PS name."""
    assert len(ps_text) == 8
    bits = []
    for _ in range(repeats):
        for seg in range(4):
            b = (0 << 12) | (0 << 11) | (5 << 5) | seg  # group 0A, PTY 5
            c = 0xE0E0  # AF codes (none)
            d = (ord(ps_text[2 * seg]) << 8) | ord(ps_text[2 * seg + 1])
            bits.extend(rds.encode_group(pi, b, c, d))
    return bits


def differential_encode(bits):
    out = []
    last = 0
    for b in bits:
        last = last ^ b
        out.append(last)
    return out


class TestBlockCoding:
    def test_syndrome_of_valid_block_matches_offset(self):
        bits = rds.encode_group(0x54A8, 0x0408, 0xE0E0, 0x4142)
        # reconstruct first block
        block = 0
        for b in bits[:26]:
            block = (block << 1) | b
        assert rds._syndrome(block) == rds._OFFSETS["A"]

    def test_block_decoder_syncs_and_groups(self):
        bits = make_ps_groups(0x54A8, "PEBBLES ", repeats=4)
        # prepend junk bits to force a mid-stream sync
        bits = [1, 0, 1, 1, 0, 0, 1] + bits
        diff = differential_encode(bits)
        symbols = np.asarray(diff) * 2 - 1
        dec = rds.RdsBlockDecoder()
        dec.feed_symbols(symbols)
        assert dec.synced
        assert len(dec.groups) >= 3
        assert dec.block_errors == 0

    def test_group_decoder_ps_and_pty(self):
        bits = make_ps_groups(0x54A8, "KPBL-FM ", repeats=3)
        dec = rds.RdsBlockDecoder()
        dec.feed_symbols(np.asarray(differential_encode(bits)) * 2 - 1)
        g = rds.RdsGroupDecoder()
        for grp in dec.groups:
            g.decode(grp)
        assert g.ps_name == "KPBL-FM "
        assert g.pi == 0x54A8
        assert g.pty == 5

    def test_callsign_from_pi(self):
        g = rds.RdsGroupDecoder()
        g.pi = 0x54A8  # first W station
        assert g.callsign == "WAAA"
        g.pi = 0x1000
        assert g.callsign == "KAAA"

    def test_radiotext_2a(self):
        text = "HELLO FROM THE TPU SDR FRAMEWORK"
        bits = []
        for seg in range(8):
            b = (2 << 12) | (5 << 5) | seg
            chunk = text[4 * seg:4 * seg + 4].ljust(4)
            c = (ord(chunk[0]) << 8) | ord(chunk[1])
            d = (ord(chunk[2]) << 8) | ord(chunk[3])
            bits.extend(rds.encode_group(0x1234, b, c, d))
        dec = rds.RdsBlockDecoder()
        dec.feed_symbols(np.asarray(differential_encode(bits)) * 2 - 1)
        g = rds.RdsGroupDecoder()
        for grp in dec.groups:
            g.decode(grp)
        assert text in g.radiotext


class TestRdsSignalPath:
    def test_full_chain_recovers_ps(self):
        """Synthesize an FM composite with a real RDS BPSK subcarrier, run the
        WFM receiver with rds=True, decode PS via the host state machine."""
        import jax.numpy as jnp

        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode

        FS, N = 2_048_000, 32768
        cfg = ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                             mode=DemodMode.FMS, rds=True)
        rx = Receiver(cfg)

        bits = make_ps_groups(0x54A8, "PEBBLES ", repeats=24)
        diff = differential_encode(bits)
        # biphase waveform at 1187.5 baud on the 57 kHz subcarrier
        sym = np.asarray(diff, np.float64) * 2 - 1
        sps = FS / rds.RDS_BAUD  # samples per symbol at device rate
        n_total = 40 * N
        t = np.arange(n_total) / FS
        sym_idx = np.minimum((t * rds.RDS_BAUD).astype(np.int64), len(sym) - 1)
        frac = t * rds.RDS_BAUD - sym_idx
        biphase = sym[sym_idx] * np.where(frac < 0.5, 1.0, -1.0)
        # composite: mono tone + pilot + RDS at 57 kHz
        comp = (0.3 * np.sin(2 * np.pi * 1000.0 * t)
                + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
                + 0.06 * biphase * np.cos(2 * np.pi * 57000.0 * t))
        phase = 2 * np.pi * np.cumsum(75000.0 * comp) / FS
        iq = (0.5 * np.exp(1j * (2 * np.pi * 300_000.0 * t + phase))).astype(np.complex64)

        state = rx.init_state()
        params = rx.default_params(300_000.0)
        block_dec = rds.RdsBlockDecoder()
        for i in range(40):
            state, out = rx.step(state, params, jnp.asarray(iq[None, i * N:(i + 1) * N]))
            block_dec.feed_symbols(np.asarray(out["rds_soft"])[0])
        assert block_dec.synced
        assert len(block_dec.groups) >= 4, (block_dec.blocks_ok, block_dec.block_errors)
        g = rds.RdsGroupDecoder()
        for grp in block_dec.groups:
            g.decode(grp)
        assert g.ps_name == "PEBBLES "
        assert g.callsign == "WAAA"
