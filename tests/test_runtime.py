"""Native C++ runtime: ring buffer semantics + wire decode parity."""

import threading

import numpy as np
import pytest

from pebblesdr_tpu import runtime
from pebblesdr_tpu.core import iqformat

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime not built")


class TestNativeRing:
    def test_produce_consume_order(self):
        ring = runtime.NativeRing(4, 16)
        for i in range(4):
            assert ring.write(bytes([i] * 16), timeout_ms=100)
        assert ring.filled == 4
        for i in range(4):
            got = ring.read(timeout_ms=100)
            assert got == bytes([i] * 16)
        assert ring.filled == 0

    def test_overrun_drops_oldest(self):
        ring = runtime.NativeRing(2, 4)
        assert ring.write(b"aaaa", timeout_ms=50)
        assert ring.write(b"bbbb", timeout_ms=50)
        # ring full: next write drops the oldest
        assert ring.write(b"cccc", timeout_ms=50, drop_oldest=True)
        assert ring.overruns == 1
        assert ring.read(timeout_ms=50) == b"bbbb"
        assert ring.read(timeout_ms=50) == b"cccc"

    def test_read_timeout(self):
        ring = runtime.NativeRing(2, 4)
        assert ring.read(timeout_ms=30) is None

    def test_threaded_stream(self):
        ring = runtime.NativeRing(8, 8)
        n = 200
        got = []

        def producer():
            for i in range(n):
                ring.write(i.to_bytes(8, "little"), timeout_ms=-1,
                           drop_oldest=False)

        def consumer():
            for _ in range(n):
                got.append(int.from_bytes(ring.read(timeout_ms=2000), "little"))

        tp = threading.Thread(target=producer)
        tc = threading.Thread(target=consumer)
        tp.start(); tc.start()
        tp.join(timeout=10); tc.join(timeout=10)
        assert got == list(range(n))
        assert ring.overruns == 0


class TestNativeDecode:
    @pytest.mark.parametrize("fmt", ["u8", "i8", "i16", "u16", "f32"])
    def test_matches_python_decoder(self, fmt):
        rng = np.random.default_rng(0)
        n = 1000
        if fmt == "u8":
            raw = rng.integers(0, 256, 2 * n, dtype=np.uint8)
        elif fmt == "i8":
            raw = rng.integers(-128, 128, 2 * n, dtype=np.int8)
        elif fmt == "i16":
            raw = rng.integers(-32768, 32768, 2 * n, dtype=np.int16)
        elif fmt == "u16":
            raw = rng.integers(0, 65536, 2 * n, dtype=np.uint16)
        else:
            raw = rng.normal(size=2 * n).astype(np.float32)
        planes = runtime.decode_iq_planes(raw.tobytes(), fmt)
        ref = iqformat.decode_iq_host(raw.tobytes(), fmt)
        np.testing.assert_allclose(planes[0], ref.real, atol=1e-6)
        np.testing.assert_allclose(planes[1], ref.imag, atol=1e-6)

    def test_swap_iq(self):
        raw = np.array([100, -200, 300, -400], dtype=np.int16)
        planes = runtime.decode_iq_planes(raw.tobytes(), "i16", swap_iq=True)
        np.testing.assert_allclose(planes[0] * 32768.0, [-200, -400])
        np.testing.assert_allclose(planes[1] * 32768.0, [100, 300])

    @pytest.mark.parametrize("fmt", ["i16", "i8", "u8"])
    def test_i16_passthrough_deinterleave(self, fmt):
        """deint_iq_planes_i16: integer wire -> INT16 planes (the native
        container the chain's i16 entry path dequantizes in-kernel) — must
        match the float decoder after in-kernel-style dequant."""
        rng = np.random.default_rng(1)
        n = 1000
        if fmt == "i16":
            raw = rng.integers(-32768, 32768, 2 * n, dtype=np.int16)
        elif fmt == "i8":
            raw = rng.integers(-128, 128, 2 * n, dtype=np.int8)
        else:
            raw = rng.integers(0, 256, 2 * n, dtype=np.uint8)
        planes = runtime.deint_iq_planes_i16(raw.tobytes(), fmt)
        assert planes.dtype == np.int16 and planes.shape == (2, n)
        ref = runtime.decode_iq_planes(raw.tobytes(), fmt)
        np.testing.assert_allclose(planes.astype(np.float32) / 32768.0,
                                   ref, atol=1e-6)
        # swap variant
        sw = runtime.deint_iq_planes_i16(raw.tobytes(), fmt, swap_iq=True)
        np.testing.assert_array_equal(sw[0], planes[1])

    def test_i16_passthrough_rejects_float(self):
        with pytest.raises(ValueError):
            runtime.deint_iq_planes_i16(b"\x00" * 8, "f32")


class TestNativeUdpPump:
    def _send(self, port, seq, payload_i16):
        import socket
        import struct

        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        pkt = (bytes([0x04, 0x84]) + struct.pack("<H", seq & 0xFFFF)
               + payload_i16.astype("<i2").tobytes())
        s.sendto(pkt, ("127.0.0.1", port))
        s.close()

    def test_blocks_and_decode(self):
        import time

        from pebblesdr_tpu import runtime

        if not runtime.available():
            import pytest
            pytest.skip("native runtime unavailable")
        pump = runtime.NativeUdpPump(port=0, header_bytes=4,
                                     seq_le16_offset=2, fmt="i16",
                                     block_samples=256, ring_buffers=8)
        try:
            # one datagram = 256 samples = exactly one block
            vals = (np.arange(512) - 256).astype(np.int16)
            self._send(pump.port, 0, vals)
            planes = pump.read_planes(timeout_ms=3000)
            assert planes is not None and planes.shape == (2, 256)
            np.testing.assert_allclose(planes[0],
                                       vals[0::2].astype(np.float32) / 32768.0,
                                       atol=1e-7)
            np.testing.assert_allclose(planes[1],
                                       vals[1::2].astype(np.float32) / 32768.0,
                                       atol=1e-7)
            assert pump.counters["datagrams"] == 1
        finally:
            pump.close()

    def test_sequence_gap_zero_fill(self):
        from pebblesdr_tpu import runtime

        if not runtime.available():
            import pytest
            pytest.skip("native runtime unavailable")
        pump = runtime.NativeUdpPump(port=0, header_bytes=4,
                                     seq_le16_offset=2, fmt="i16",
                                     block_samples=256, ring_buffers=16)
        try:
            ones = np.full(512, 16384, np.int16)
            self._send(pump.port, 0, ones)
            self._send(pump.port, 3, ones)  # drops seq 1, 2
            blocks = []
            for _ in range(4):
                b = pump.read_planes(timeout_ms=3000)
                assert b is not None
                blocks.append(b)
            assert pump.counters["dropped_datagrams"] == 2
            # block 0: real data; blocks 1-2: zero fill; block 3: real data
            assert np.all(np.abs(blocks[0][0] - 0.5) < 1e-3)
            assert np.all(blocks[1][0] == 0.0)
            assert np.all(blocks[2][0] == 0.0)
            assert np.all(np.abs(blocks[3][0] - 0.5) < 1e-3)
        finally:
            pump.close()

    def test_throughput_headroom(self):
        """The pump must drain datagrams far faster than SDR-IP's 2 Msps
        (~8 k datagrams/s): push 2000 datagrams as fast as the loopback
        allows, expect them all (no socket-buffer loss at an 8 MB rcvbuf)."""
        import socket
        import struct
        import time

        from pebblesdr_tpu import runtime

        if not runtime.available():
            import pytest
            pytest.skip("native runtime unavailable")
        pump = runtime.NativeUdpPump(port=0, header_bytes=4,
                                     seq_le16_offset=2, fmt="i16",
                                     block_samples=4096, ring_buffers=256)
        try:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            payload = np.zeros(512, "<i2").tobytes()
            n_dg = 2000
            t0 = time.perf_counter()
            for seq in range(n_dg):
                s.sendto(bytes([0x04, 0x84]) + struct.pack("<H", seq & 0xFFFF)
                         + payload, ("127.0.0.1", pump.port))
            send_dt = time.perf_counter() - t0
            s.close()
            # drain: 2000 datagrams x 256 samples = 125 blocks of 4096
            got = 0
            while got < n_dg * 256 // 4096:
                if pump.read_planes(timeout_ms=2000) is None:
                    break
                got += 1
            c = pump.counters
            assert c["datagrams"] + c["dropped_datagrams"] >= n_dg * 0.99, c
            rate = n_dg / send_dt
            assert rate > 8000, f"loopback only reached {rate:.0f} dg/s"
        finally:
            pump.close()
