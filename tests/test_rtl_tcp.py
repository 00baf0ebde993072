"""rtl_tcp server<->client loopback (SdrGarage serve path, SURVEY.md §3.5)."""

import numpy as np

from pebblesdr_tpu.io import sources
from pebblesdr_tpu.io.rtl_tcp import (CMD_SET_FREQ, RtlTcpServer, RtlTcpSource)


class TestRtlTcpLoopback:
    def test_stream_and_commands(self):
        src = sources.SyntheticSource(1_024_000, tones=((100_000.0, 0.5),),
                                      noise_db=None)
        server = RtlTcpServer(src, port=0, block=4096)
        server.start()
        try:
            client = RtlTcpSource("127.0.0.1", server.port,
                                  sample_rate=1_024_000,
                                  center_freq_hz=100e6)
            blk = client.read_block(8192)
            assert blk.shape == (8192,)
            assert blk.dtype == np.complex64
            # u8 quantization of a 0.5-amplitude tone: power within ~1%
            assert abs(np.mean(np.abs(blk) ** 2) - 0.25) < 0.01
            # tone frequency survives the wire
            spec = np.abs(np.fft.fft(blk))
            peak = np.argmax(spec)
            f = peak / len(blk) * 1_024_000
            assert abs(f - 100_000.0) < 1_024_000 / 8192 * 2

            client.set_center_freq(7_000_000.0)
            # commands drain between block sends — poll until processed
            import time
            for _ in range(50):
                client.read_block(4096)
                if (CMD_SET_FREQ, 7_000_000) in server.commands:
                    break
                time.sleep(0.02)
            assert (CMD_SET_FREQ, 7_000_000) in server.commands
            assert src.info.center_freq_hz == 7_000_000.0
            client.close()
        finally:
            server.stop()
