"""RTTY and WWV modem roundtrips + feeder/checkpoint/settings utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.modem import rtty, wwv


class TestRtty:
    def test_roundtrip_clean(self):
        fs = 8000.0
        sig = rtty.encode_rtty("RYRY HELLO WORLD", fs)
        modem = rtty.RttyModem(fs)
        dec = rtty.RttyDecoder(frames_per_bit=modem.frames_per_bit)
        n = (len(sig) // modem.frame) * modem.frame
        marks = modem.detect(jnp.asarray(sig[None, :n]))
        dec.feed(np.asarray(marks)[0])
        assert "HELLO WORLD" in dec.text

    def test_figures_shift(self):
        fs = 8000.0
        sig = rtty.encode_rtty("ABC 123 XYZ", fs)
        modem = rtty.RttyModem(fs)
        dec = rtty.RttyDecoder(frames_per_bit=modem.frames_per_bit)
        n = (len(sig) // modem.frame) * modem.frame
        marks = modem.detect(jnp.asarray(sig[None, :n]))
        dec.feed(np.asarray(marks)[0])
        assert "ABC 123 XYZ" in dec.text

    def test_blockwise_feed(self):
        fs = 8000.0
        sig = rtty.encode_rtty("THE QUICK BROWN FOX", fs)
        modem = rtty.RttyModem(fs)
        dec = rtty.RttyDecoder(frames_per_bit=modem.frames_per_bit)
        blk = 16 * modem.frame
        n = (len(sig) // blk) * blk
        for i in range(0, n, blk):
            marks = modem.detect(jnp.asarray(sig[None, i:i + blk]))
            dec.feed(np.asarray(marks)[0])
        assert "QUICK BROWN FOX" in dec.text


class TestWwv:
    def test_decodes_time(self):
        fs = 8000.0
        audio = wwv.encode_wwv(minutes=37, hours=14, sample_rate=fs, seconds=100)
        modem = wwv.WwvModem(fs)
        dec = wwv.WwvDecoder()
        blk = 100 * modem.frame
        n = (len(audio) // blk) * blk
        for i in range(0, n, blk):
            p = modem.detect(jnp.asarray(audio[None, i:i + blk]))
            dec.feed(np.asarray(p)[0])
        assert dec.minutes == 37
        assert dec.hours == 14


class TestFeeder:
    def test_overlapped_reads(self):
        from pebblesdr_tpu.io.feeder import Feeder
        from pebblesdr_tpu.io.sources import SyntheticSource

        src = SyntheticSource(48_000, tones=((1000.0, 0.5),))
        f = Feeder(src, block=4800, channels=2, depth=3).start()
        blocks = []
        for i, blk in enumerate(f):
            blocks.append(blk)
            if i >= 4:
                break
        f.stop()
        assert blocks[0].shape == (4800, 4)  # [N, 2C] lane-packed
        assert blocks[0].dtype == np.float32


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        import jax

        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode
        from pebblesdr_tpu.utils import checkpoint

        rx = Receiver(ReceiverConfig(sample_rate=512_000, frames_per_buffer=8192,
                                     mode=DemodMode.AM))
        state = rx.init_state()
        params = rx.default_params(100_000.0)
        t = np.arange(8192) / 512_000
        iq = (0.4 * np.exp(2j * np.pi * 100_000 * t)).astype(np.complex64)[None]
        state, _ = rx.step(state, params, jnp.asarray(iq))

        p = str(tmp_path / "ck.npz")
        checkpoint.save_state(p, state, extra={"block": 1})
        restored, extra = checkpoint.load_state(p, rx.init_state())
        assert extra["block"] == 1
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mismatch_rejected(self, tmp_path):
        import pytest as _pytest

        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode
        from pebblesdr_tpu.utils import checkpoint

        rx1 = Receiver(ReceiverConfig(sample_rate=512_000, frames_per_buffer=8192,
                                      mode=DemodMode.AM))
        rx2 = Receiver(ReceiverConfig(sample_rate=512_000, frames_per_buffer=16384,
                                      mode=DemodMode.AM))
        p = str(tmp_path / "ck.npz")
        checkpoint.save_state(p, rx1.init_state())
        with _pytest.raises(ValueError):
            checkpoint.load_state(p, rx2.init_state())


class TestSettings:
    def test_roundtrip(self, tmp_path):
        from pebblesdr_tpu.utils.settings import Preset, Settings, load_presets_csv, save_presets_csv

        s = Settings(path=str(tmp_path / "s.json"))
        s.set("last_freq_hz", 7_100_000.0)
        s.device_settings("file")["path"] = "/tmp/x.wav"
        s.write()
        s2 = Settings(path=str(tmp_path / "s.json"))
        assert s2.get("last_freq_hz") == 7_100_000.0
        assert s2.device_settings("file")["path"] == "/tmp/x.wav"
        assert s2.get("frames_per_buffer") == 32768  # default preserved

        presets = [Preset("WWV", 10_000_000.0, "AM", "time station"),
                   Preset("40m", 7_000_000.0, "LSB", "", 7_000_000.0, 7_300_000.0)]
        pcsv = str(tmp_path / "p.csv")
        save_presets_csv(pcsv, presets)
        back = load_presets_csv(pcsv)
        assert back[0].name == "WWV" and back[0].freq_hz == 10_000_000.0
        assert back[1].hi_hz == 7_300_000.0


class TestHealth:
    def test_monitor_tracks_drops_and_rtf(self):
        import time as _time

        from pebblesdr_tpu.utils.health import HealthMonitor

        hm = HealthMonitor(sample_rate=48_000, frames_per_buffer=4800)
        for seq in [0, 1, 2, 5, 6]:  # blocks 3,4 dropped
            hm.block_done(seq=seq)
            _time.sleep(0.01)
        rep = hm.report()
        assert rep["dropped_blocks"] == 2
        assert not rep["healthy"]
        assert rep["realtime_factor"] > 1.0  # 4800 samples per 10ms >> realtime

    def test_metrics_export(self):
        from pebblesdr_tpu.utils.health import Metrics
        from pebblesdr_tpu.utils.perform import Perform

        m = Metrics(host_id=3)
        m.count("blocks", 5)
        m.gauge("snr_db", 42.5)
        p = Perform()
        with p.measure("step"):
            pass
        out = m.export(p)
        assert out["host"] == 3
        assert out["counters"]["blocks"] == 5.0
        assert out["gauges"]["snr_db"] == 42.5
        assert "step" in out["stages_ms"]
        import json as _json

        _json.loads(m.export_json())  # serializable
