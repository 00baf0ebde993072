"""OpenHPSDR / Metis protocol-1 tests: frame codec, C&C commands,
client<->server end-to-end over loopback, and discovery (SURVEY.md §2.3
HPSDRDevice network personality)."""

import struct

import numpy as np
import pytest

from pebblesdr_tpu.io import hpsdr
from pebblesdr_tpu.io.sources import SyntheticSource


class TestFrameCodec:
    def test_frame_roundtrip(self):
        rng = np.random.default_rng(0)
        iq = (rng.uniform(-0.9, 0.9, 63)
              + 1j * rng.uniform(-0.9, 0.9, 63)).astype(np.complex64)
        mic = rng.uniform(-0.9, 0.9, 63).astype(np.float32)
        ctrl = bytes([0x00, 0x01, 0x02, 0x03, 0x04])
        frame = hpsdr.encode_frame(iq, ctrl, mic)
        assert len(frame) == 512
        assert frame[:3] == b"\x7f\x7f\x7f"
        c, iq2, mic2 = hpsdr.decode_frame(frame)
        assert c == ctrl
        # 24-bit quantization
        np.testing.assert_allclose(iq2.real, iq.real, atol=2 / 8388607)
        np.testing.assert_allclose(iq2.imag, iq.imag, atol=2 / 8388607)
        np.testing.assert_allclose(mic2, mic, atol=2 / 32767)

    def test_24bit_sign_extension(self):
        # -1.0 must survive: the MSB cast must be signed
        # (hpsdrdevice.cpp:512-517 note on the (signed char) cast)
        iq = np.full(63, -0.999 - 0.999j, np.complex64)
        _, back, _ = hpsdr.decode_frame(hpsdr.encode_frame(iq))
        assert np.all(back.real < -0.99) and np.all(back.imag < -0.99)

    def test_bad_sync_rejected(self):
        with pytest.raises(ValueError):
            hpsdr.decode_frame(b"\x00" * 512)

    def test_freq_command_wire_format(self):
        # C0=0x04, C1..C4 big-endian u32 Hz (hpsdrdevice.cpp:398-405)
        c0, c1c4 = hpsdr.freq_command(7_040_000.0)
        assert c0 == 0x04
        assert struct.unpack(">I", c1c4)[0] == 7_040_000

    def test_config_command_speed_bits(self):
        for rate, speed in ((48_000, 0), (96_000, 1), (192_000, 2),
                            (384_000, 3)):
            c0, c1c4 = hpsdr.config_command(rate)
            assert c0 == 0x00 and c1c4[0] == speed
        # C4 keeps duplex on (required by fw >= 2.5, SendConfig comment)
        assert hpsdr.config_command(48_000)[1][3] & hpsdr.C4_DUPLEX_ON


class TestEndToEnd:
    def test_control_and_stream(self):
        fs = 192_000
        src = SyntheticSource(fs, tones=((21_000.0, 0.5),))
        server = hpsdr.HpsdrServer(src, fw_version=29, board_id=0x02)
        server.start()
        try:
            client = hpsdr.HpsdrSource("127.0.0.1", server.port,
                                       sample_rate=fs,
                                       center_freq_hz=7_040_000.0)
            assert client.fw_version == 29 and client.board_id == 0x02
            # C&C landed on the served source (freq + speed)
            deadline = 50
            while src.get("center_freq_hz") != 7_040_000.0 and deadline:
                import time; time.sleep(0.02); deadline -= 1
            assert src.get("center_freq_hz") == 7_040_000.0
            assert src.get("sample_rate") == fs
            client.set_center_freq(14_100_000.0)
            deadline = 50
            while src.get("center_freq_hz") != 14_100_000.0 and deadline:
                import time; time.sleep(0.02); deadline -= 1
            assert src.get("center_freq_hz") == 14_100_000.0

            client.start()
            blk = client.read_block(4096)
            client.close()
            assert blk.shape == (4096,) and blk.dtype == np.complex64
            # the tone survives the 24-bit wire round trip
            t = np.arange(4096) / fs
            ref = np.exp(2j * np.pi * 21_000.0 * t)
            amp = np.abs(np.vdot(ref, blk)) / 4096
            assert amp == pytest.approx(0.5, rel=0.01)
            assert client.dropped_datagrams == 0
        finally:
            server.stop()

    def test_bandscope_stream(self):
        """start(bandscope=True) = command 0x03: the server streams EP4
        wideband frames alongside EP6 IQ; the client collects them and the
        spectrum helper shows the tone (the reference defines the endpoint
        but never consumes it — hpsdrnetwork.cpp:193 'not used yet')."""
        fs = 192_000
        src = SyntheticSource(fs, tones=((21_000.0, 0.5),))
        server = hpsdr.HpsdrServer(src, pace=False)
        server.start()
        try:
            client = hpsdr.HpsdrSource("127.0.0.1", server.port,
                                       sample_rate=fs,
                                       center_freq_hz=7_040_000.0)
            client.start(bandscope=True)
            client.read_block(16384)
            bs = client.read_bandscope()
            client.close()
            assert len(bs) >= 4096
            assert bs.dtype == np.float32
            spec = hpsdr.bandscope_spectrum(bs, bins=1024)
            assert spec.shape == (1024,)
            # tone at 21 kHz of the 96 kHz half-span -> bin 21/96*1024
            peak = int(np.argmax(spec))
            assert abs(peak - round(21_000 / (fs / 2) * 1024)) <= 2
        finally:
            server.stop()

    def test_bandscope_frame_roundtrip(self):
        rng = np.random.default_rng(1)
        s = rng.uniform(-0.9, 0.9, 256).astype(np.float32)
        back = hpsdr.decode_bandscope_frame(hpsdr.encode_bandscope_frame(s))
        np.testing.assert_allclose(back, s, atol=2 / 32767)

    def test_registry(self):
        from pebblesdr_tpu.io import registry
        assert "hpsdr" in registry.available()


class TestDiscovery:
    def test_loopback_discovery(self):
        src = SyntheticSource(100_000)
        server = hpsdr.HpsdrServer(src, fw_version=31, board_id=0x05)
        server.start()
        try:
            found = hpsdr.discover(timeout=1.0, target_host="127.0.0.1",
                                   port=server.port)
            assert any(d["fw_version"] == 31 and d["board_id"] == 0x05
                       and not d["sending"] for d in found)
        finally:
            server.stop()
