"""RFSpace SDR-IP (ASCP) protocol tests: framing, codec, client<->server
end-to-end over loopback, and UDP discovery (SURVEY.md §2.3 RFSpaceDevice)."""

import struct

import numpy as np
import pytest

from pebblesdr_tpu.io import sdr_ip
from pebblesdr_tpu.io.sources import SyntheticSource


class TestFraming:
    def test_header_roundtrip(self):
        for msg_type in range(8):
            for length in (2, 4, 100, 1028, 8191):
                msg = bytes([length & 0xFF,
                             ((length >> 8) & 0x1F) | (msg_type << 5)])
                t, n = sdr_ip.unpack_header(msg[0], msg[1])
                assert (t, n) == (msg_type, length)

    def test_pack_item(self):
        # set-frequency example from the reference: 20 MHz ->
        # [0A][00][20][00][00][00][2D][31][01][00] (rfspacedevice.cpp:261)
        msg = sdr_ip.pack_frequency(20_000_000.0)
        assert msg == bytes([0x0A, 0x00, 0x20, 0x00, 0x00,
                             0x00, 0x2D, 0x31, 0x01, 0x00])

    def test_cpx16_roundtrip(self):
        rng = np.random.default_rng(0)
        x = (rng.uniform(-0.9, 0.9, 256)
             + 1j * rng.uniform(-0.9, 0.9, 256)).astype(np.complex64)
        back = sdr_ip.decode_cpx16(sdr_ip.encode_cpx16(x))
        np.testing.assert_allclose(back.real, x.real, atol=1 / 32768)
        np.testing.assert_allclose(back.imag, x.imag, atol=1 / 32768)

    def test_swap_iq_on_wire(self):
        x = np.asarray([0.5 + 0.25j], np.complex64)
        raw = sdr_ip.encode_cpx16(x, swap_iq=True)
        q, i = struct.unpack("<hh", raw)
        assert i == pytest.approx(0.5 * 32768, abs=1)
        assert q == pytest.approx(0.25 * 32768, abs=1)


class TestEndToEnd:
    def test_control_and_stream(self):
        fs = 512_000
        src = SyntheticSource(fs, tones=((50_000.0, 0.5),))
        server = sdr_ip.SdrIpServer(src, name="SDR-IP", serial="XY99")
        server.start()
        try:
            client = sdr_ip.SdrIpSource("127.0.0.1", server.port,
                                        sample_rate=fs,
                                        center_freq_hz=14_100_000.0)
            assert client.target_name == "SDR-IP"
            assert client.serial == "XY99"
            # control items landed on the served source
            assert src.get("sample_rate") == fs
            assert src.get("center_freq_hz") == 14_100_000.0
            client.set_center_freq(7_040_000.0)
            assert src.get("center_freq_hz") == 7_040_000.0

            client.start()
            blk = client.read_block(4096)
            client.close()
            assert blk.shape == (4096,) and blk.dtype == np.complex64
            # the tone survives the int16 wire round trip: fit at 50 kHz
            t = np.arange(4096) / fs
            ref = np.exp(2j * np.pi * 50_000.0 * t)
            # unknown start phase: use magnitude of the correlation
            amp = np.abs(np.vdot(ref, blk)) / 4096
            assert amp == pytest.approx(0.5, rel=0.01)
            assert client.dropped_datagrams == 0
        finally:
            server.stop()


class TestDiscovery:
    def test_loopback_discovery(self):
        src = SyntheticSource(100_000)
        server = sdr_ip.SdrIpServer(src, name="SDR-IP", serial="SN42")
        try:
            server.enable_discovery(port=0)
            port = server._disc_sock.getsockname()[1]
            found = sdr_ip.discover(timeout=1.0, target_host="127.0.0.1",
                                    request_port=port)
            assert any(d["name"] == "SDR-IP" and d["serial"] == "SN42"
                       and d["port"] == server.port for d in found)
        finally:
            server.stop()
