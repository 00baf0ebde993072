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
