import numpy as np
import pytest

from pebblesdr_tpu.io import sources, wav


class TestWav:
    def test_f32_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        iq = (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(np.complex64) * 0.3
        p = str(tmp_path / "t.wav")
        wav.write_iq_wav(p, iq, 250_000, fmt="f32", center_freq_hz=7_100_000.0,
                         demod_mode="LSB")
        back, info = wav.read_iq_wav(p)
        np.testing.assert_array_equal(back, iq)
        assert info.sample_rate == 250_000
        assert info.center_freq_hz == 7_100_000.0
        assert info.demod_mode == "LSB"
        assert info.num_samples == 1000

    def test_i16_roundtrip(self, tmp_path):
        iq = (np.linspace(-0.9, 0.9, 256) * (1 + 1j)).astype(np.complex64)
        p = str(tmp_path / "t16.wav")
        wav.write_iq_wav(p, iq, 48_000, fmt="i16")
        back, info = wav.read_iq_wav(p)
        assert info.fmt == "i16"
        np.testing.assert_allclose(back, iq, atol=1 / 16384)

    def test_audio_wav_stereo(self, tmp_path):
        audio = np.stack([np.sin(np.linspace(0, 20, 480)),
                          np.cos(np.linspace(0, 20, 480))]).astype(np.float32) * 0.5
        p = str(tmp_path / "a.wav")
        wav.write_audio_wav(p, audio, 48_000)
        with open(p, "rb") as f:
            buf = f.read()
        assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.wav")
        with open(p, "wb") as f:
            f.write(b"not a wav file at all")
        with pytest.raises(ValueError):
            wav.read_iq_wav(p)


class TestSources:
    def test_file_source_loops(self, tmp_path):
        iq = np.arange(100, dtype=np.complex64)
        p = str(tmp_path / "loop.wav")
        wav.write_iq_wav(p, iq, 48_000)
        src = sources.FileSource(p, loop=True)
        b1 = src.read_block(70)
        b2 = src.read_block(70)
        np.testing.assert_array_equal(b2[:30], iq[70:])
        np.testing.assert_array_equal(b2[30:], iq[:40])

    def test_file_source_no_loop_ends(self, tmp_path):
        iq = np.arange(100, dtype=np.complex64)
        p = str(tmp_path / "once.wav")
        wav.write_iq_wav(p, iq, 48_000)
        src = sources.FileSource(p, loop=False)
        assert src.read_block(60) is not None
        assert src.read_block(60) is None

    def test_synthetic_tone_power(self):
        src = sources.SyntheticSource(48_000, tones=((1000.0, 0.5),), noise_db=None)
        b = src.read_block(4800)
        assert np.mean(np.abs(b) ** 2) == pytest.approx(0.25, rel=1e-3)
        # block continuity: next block continues the phase
        b2 = src.read_block(4800)
        full = sources.SyntheticSource(48_000, tones=((1000.0, 0.5),), noise_db=None).read_block(9600)
        np.testing.assert_allclose(np.concatenate([b, b2]), full, atol=1e-5)

    def test_morse_envelope_timing(self):
        env = sources.morse_envelope("e", 20.0, 8000.0)  # '.' = 1 unit on
        unit = int(round(1.2 / 20.0 * 8000))
        assert env[:unit].all() and not env[unit:].any()
        # 'e' = dot + intra gap + char gap + word gap = 1 on, 7 off
        assert len(env) == 8 * unit

    def test_morsegen_keying(self):
        src = sources.MorseGenSource(8000, generators=(("e e", 20.0, 1000.0, 1.0),),
                                     noise_db=None)
        b = src.read_block(4000)
        mag = np.abs(b)
        assert mag.max() > 0.9
        assert (mag < 0.01).any()


class TestRegistry:
    def test_builtin_sources(self):
        from pebblesdr_tpu.io import registry

        names = registry.available()
        assert {"file", "synthetic", "morsegen", "rtl_tcp"} <= set(names)
        src = registry.create("synthetic", sample_rate=48_000,
                              tones=((1000.0, 0.5),))
        assert src.read_block(128).shape == (128,)

    def test_unknown_source(self):
        import pytest as _pytest

        from pebblesdr_tpu.io import registry

        with _pytest.raises(ValueError, match="unknown source"):
            registry.create("nonexistent")


class TestWaterfall:
    def test_rolls(self):
        import numpy as np

        from pebblesdr_tpu.ops.spectrum import Waterfall

        wf = Waterfall(n_pixels=64, depth=4)
        for level in [-100.0, -50.0, -20.0]:
            wf.push(np.full(2048, level, np.float32))
        img = wf.image
        assert img.shape == (4, 64)
        assert img[-1, 0] == -20.0
        assert img[-2, 0] == -50.0
        assert img[0, 0] == -160.0  # unfilled
