"""Interactive runtime control (serve/control.py): live retune/mode/filter/
AGC/squelch — params-only updates keep the compiled step, mode swaps rebuild,
and the CLI applies scripted key events between dispatches."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
from pebblesdr_tpu.demod.modes import DemodMode
from pebblesdr_tpu.serve.control import (ControlSurface, ScriptedKeys,
                                         parse_keys)

FS, N = 2_048_000, 32768


def make_surface(mode=DemodMode.AM, tune=250_000.0):
    rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                 mode=mode))
    return ControlSurface(rx, rx.default_params(tune), tune)


class TestKeyParsing:
    def test_arrows_and_chars(self):
        assert parse_keys("\x1b[C\x1b[Dmq \x1b[A") == [
            "right", "left", "m", "q", " ", "up"]

    def test_scripted_source_paces(self):
        src = ScriptedKeys("ab", per_poll=1)
        assert src.poll() == ["a"]
        assert src.poll() == ["b"]
        assert src.poll() == []


class TestControlSurface:
    def test_arrow_retune_is_params_only(self):
        s = make_surface()
        rx0 = s.rx
        hi0 = np.asarray(s.params.tune_hi).copy()
        ev = s.handle("right")
        assert ev == "TUNE 251.000 kHz"
        assert s.rx is rx0                      # no chain rebuild
        assert not s.take_reset()
        assert not np.array_equal(np.asarray(s.params.tune_hi), hi0)
        s.handle("up")                          # step 1 kHz -> 10 kHz
        s.handle("left")
        assert s.tune == pytest.approx(241_000.0)

    def test_bandpass_key_redesigns_mask(self):
        s = make_surface()
        mask0 = np.asarray(s.params.bp_mask).copy()
        ev = s.handle("[")
        assert ev.startswith("BW ")
        assert s.rx is not None and not s.take_reset()
        assert not np.array_equal(np.asarray(s.params.bp_mask), mask0)

    def test_squelch_gain_mute_params_only(self):
        s = make_surface()
        s.handle("s")
        assert float(np.asarray(s.params.squelch_db)) == -10.0
        s.handle("g")
        assert float(np.asarray(s.params.gain)) > 1.0
        s.handle(" ")
        assert bool(np.asarray(s.params.mute))
        s.handle(" ")
        assert not bool(np.asarray(s.params.mute))
        assert not s.take_reset()

    def test_mode_key_swaps_chain(self):
        s = make_surface(DemodMode.AM)
        rx0 = s.rx
        ev = s.handle("m")
        assert ev == "MODE SAM"
        assert s.rx is not rx0 and s.rx.cfg.mode == DemodMode.SAM
        assert s.take_reset()
        s.handle("M")
        assert s.rx.cfg.mode == DemodMode.AM and s.take_reset()

    def test_agc_key_swaps_chain(self):
        s = make_surface()
        ev = s.handle("a")
        assert ev.startswith("AGC ")
        assert s.take_reset()

    def test_device_lo_handoff(self):
        # tuning past 45% of the capture width with a hardware-retunable
        # source hands the offset to the device LO and re-centers the
        # mixer (receiver.cpp:604-637 capability)
        class FakeRadio:
            def __init__(self):
                self.lo = []

            def set_center_freq(self, hz):
                self.lo.append(hz)

        radio = FakeRadio()
        rx = Receiver(ReceiverConfig(sample_rate=FS, frames_per_buffer=N,
                                     mode=DemodMode.AM))
        s = ControlSurface(rx, rx.default_params(900_000.0), 900_000.0,
                           source=radio, center_hz=100_000_000.0)
        s.step = 100_000.0
        ev = s.handle("right")          # 900k + 100k = 1.0 MHz > 0.45*fs
        assert ev.startswith("LO ")
        assert radio.lo == [101_000_000.0]
        assert s.tune == 0.0
        # a plain source (no set_center_freq) just clips at the edge
        s2 = ControlSurface(rx, rx.default_params(900_000.0), 900_000.0,
                            source=object(), center_hz=0.0)
        s2.step = 1_000_000.0
        ev2 = s2.handle("right")
        assert ev2.startswith("TUNE")
        assert abs(s2.tune) <= FS / 2

    def test_retune_moves_off_station_mid_stream(self):
        # the actual RF effect: stepping the SAME compiled executable with
        # surface-updated params moves off a station between blocks
        s = make_surface(DemodMode.AM, tune=250_000.0)
        t = np.arange(4 * N) / FS
        env = (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2
        iq = (0.5 * env * np.exp(2j * np.pi * 250_000.0 * t)
              ).astype(np.complex64)[None]
        state = s.rx.init_state()
        snrs = []
        for k in range(4):
            if k == 2:
                s.step = 100_000.0
                s.handle("right")   # 250 kHz -> 350 kHz: off the station
            state, out = s.rx.step(state, s.params,
                                   jnp.asarray(iq[:, k * N:(k + 1) * N]))
            snrs.append(float(np.asarray(out["smeter"]["snr_db"])[0]))
        assert snrs[1] > 30.0
        assert snrs[3] < snrs[1] - 20.0


class TestCliScriptedKeys:
    def test_keys_retune_between_dispatches(self, capsys):
        from pebblesdr_tpu.serve.cli import main

        # tone at tune+1 kHz; 3 right-arrows x 1 kHz step shift the channel
        # off the tone.  One key per dispatch; single-block dispatches.
        rc = main(["--synthetic", "tone", "--mode", "USB",
                   "--tune", "400000", "--seconds", "0.4",
                   "--blocks-per-dispatch", "1", "--json",
                   "--keys", "\x1b[C\x1b[C\x1b[C"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["tune_hz"] == pytest.approx(403_000.0)
        assert [e for e in metrics["control_events"]
                if e.startswith("TUNE")] == [
            "TUNE 401.000 kHz", "TUNE 402.000 kHz", "TUNE 403.000 kHz"]

    def test_keys_mode_swap_and_quit(self, capsys):
        from pebblesdr_tpu.serve.cli import main

        rc = main(["--synthetic", "am", "--mode", "AM",
                   "--tune", "250000", "--seconds", "0.5",
                   "--blocks-per-dispatch", "1", "--json",
                   "--keys", "m"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["final_mode"] == "SAM"
        assert "MODE SAM" in metrics["control_events"]

    def test_quit_key_stops_early(self, capsys):
        from pebblesdr_tpu.serve.cli import main

        # 'x' is unbound (first dispatch runs), 'q' quits before the second
        rc = main(["--synthetic", "am", "--mode", "AM",
                   "--tune", "250000", "--seconds", "2.0",
                   "--blocks-per-dispatch", "1", "--json",
                   "--keys", "xq"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # ~125 blocks requested; quit on the second dispatch
        assert metrics["blocks"] <= 2


class TestDisplayCycle:
    def test_z_cycles_display_sources(self):
        """'z' cycles wide -> zoom -> split -> wide (the spectrumwidget
        zoom/split capability, terminal form)."""
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.demod.modes import DemodMode
        from pebblesdr_tpu.serve.control import ControlSurface

        rx = Receiver(ReceiverConfig(sample_rate=512_000,
                                     frames_per_buffer=8192,
                                     mode=DemodMode.AM))
        s = ControlSurface(rx, rx.default_params(0.0), 0.0)
        assert s.display == "wide"
        assert s.handle("z") == "DISPLAY zoom"
        assert s.handle("z") == "DISPLAY split"
        assert s.handle("z") == "DISPLAY wide"

    def test_p_snaps_to_spectrum_peak(self):
        """'p' retunes to the strongest wideband peak outside the current
        station's guard band (SpectrumWidget click-to-tune analog): run the
        chain on a two-station band, feed the live spectrum to the surface,
        snap, and verify the recovered tone comes from the NEW station."""
        import jax

        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig

        fs, n = 512_000, 8192
        rx = Receiver(ReceiverConfig(sample_rate=fs, frames_per_buffer=n,
                                     mode=DemodMode.AM, agc_mode="off"))
        s = ControlSurface(rx, rx.default_params(50_000.0), 50_000.0)
        assert s.handle("p") is None            # no spectrum seen yet

        t = np.arange(16 * n) / fs
        weak = 0.05 * (1 + 0.5 * np.cos(2 * np.pi * 600.0 * t)) / 2 \
            * np.exp(2j * np.pi * 50_000.0 * t)
        strong = 0.5 * (1 + 0.8 * np.cos(2 * np.pi * 1000.0 * t)) / 2 \
            * np.exp(2j * np.pi * -120_000.0 * t)
        iq = (weak + strong).astype(np.complex64)

        state = jax.jit(lambda: rx.init_state())()
        out = None
        for i in range(4):
            blk = iq[i * n:(i + 1) * n]
            state, out = rx.step(state, s.params, jnp.asarray(blk)[None])
        s.note_spectrum(np.asarray(out["spectrum"])[0])
        ev = s.handle("p")
        assert ev is not None and ev.startswith("SNAP ")
        # snapped inside the strong station's channel, well off the old tune
        assert abs(s.tune - (-120_000.0)) < 5_000.0, s.tune
        # same compiled chain (params-only): stepping recovers the 1 kHz
        # program of the snapped station
        state = jax.jit(lambda: rx.init_state())()
        audio = []
        for i in range(16):
            blk = iq[i * n:(i + 1) * n]
            state, out = rx.step(state, s.params, jnp.asarray(blk)[None])
            audio.append(np.asarray(out["audio"])[0])
        a = np.concatenate(audio)[rx.cfg.audio_rate // 8:]
        spec = np.abs(np.fft.rfft(a - a.mean()))
        freqs = np.fft.rfftfreq(len(a), 1.0 / rx.cfg.audio_rate)
        peak = freqs[int(np.argmax(spec))]
        assert abs(peak - 1000.0) < 50.0, peak


class TestPeakSnapEdgeCases:
    def test_snap_guard_covers_capture_returns_none(self):
        """When the station's own passband masks the whole capture (WFM on
        a narrow capture) 'p' must be a no-op, not a band-edge jump."""
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig

        rx = Receiver(ReceiverConfig(sample_rate=512_000,
                                     frames_per_buffer=8192,
                                     mode=DemodMode.FMM))
        s = ControlSurface(rx, rx.default_params(0.0), 0.0)
        # FMM bandpass is +-100 kHz; +-2 kHz skirt covers [-102k, 102k]
        # of the +-256 kHz capture... not all of it — shrink the view by
        # faking a capture-wide station: widen bp to the full band
        s.bp_lo, s.bp_hi = -256_000.0, 256_000.0
        s.note_spectrum(np.linspace(-120.0, -60.0, 2048))
        assert s.handle("p") is None
        assert s.tune == 0.0

    def test_snap_excludes_own_passband_asymmetric(self):
        """USB guard must cover the (asymmetric) passband: a peak inside
        [tune+bp_lo, tune+bp_hi] is skipped in favor of the next one."""
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig

        rx = Receiver(ReceiverConfig(sample_rate=512_000,
                                     frames_per_buffer=8192,
                                     mode=DemodMode.USB))
        s = ControlSurface(rx, rx.default_params(100_000.0), 100_000.0)
        db = np.full(2048, -120.0)
        freqs = (np.arange(2048) / 2048 - 0.5) * 512_000.0
        # energy inside our own USB passband (tune+2 kHz)...
        db[np.argmin(np.abs(freqs - 102_000.0))] = -30.0
        # ...and a weaker station well away
        db[np.argmin(np.abs(freqs - (-150_000.0)))] = -50.0
        s.note_spectrum(db)
        ev = s.handle("p")
        assert ev is not None and ev.startswith("SNAP")
        assert abs(s.tune - (-150_000.0)) < 1_000.0

    def test_snap_hands_off_to_device_lo(self):
        """A snap target past 45% of the capture width goes through the
        same device-LO handoff as arrow tuning."""
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig

        class FakeRadio:
            def __init__(self):
                self.lo = []

            def set_center_freq(self, hz):
                self.lo.append(hz)

        radio = FakeRadio()
        rx = Receiver(ReceiverConfig(sample_rate=512_000,
                                     frames_per_buffer=8192,
                                     mode=DemodMode.AM))
        s = ControlSurface(rx, rx.default_params(0.0), 0.0,
                           source=radio, center_hz=100_000_000.0)
        db = np.full(2048, -120.0)
        freqs = (np.arange(2048) / 2048 - 0.5) * 512_000.0
        db[np.argmin(np.abs(freqs - 240_000.0))] = -30.0  # > 0.45*fs
        s.note_spectrum(db)
        ev = s.handle("p")
        assert ev is not None and ev.startswith("LO ")
        assert len(radio.lo) == 1 and abs(radio.lo[0] - 100_240_000.0) < 1e3
        assert s.tune == 0.0


class TestPresetStepping:
    def test_n_steps_through_presets_and_swaps_mode(self):
        """'n'/'N' jump to the next/previous preset station by absolute
        frequency (the ReceiverWidget preset selector analog); a preset
        carrying a different mode swaps the chain like preset recall."""
        from pebblesdr_tpu.chain.receiver import Receiver, ReceiverConfig
        from pebblesdr_tpu.utils.settings import Preset

        presets = [Preset(name="alpha", freq_hz=100_000.0, mode="AM"),
                   Preset(name="bravo", freq_hz=200_000.0, mode="USB"),
                   Preset(name="charlie", freq_hz=-150_000.0, mode="AM")]
        rx = Receiver(ReceiverConfig(sample_rate=512_000,
                                     frames_per_buffer=8192,
                                     mode=DemodMode.AM))
        s = ControlSurface(rx, rx.default_params(0.0), 0.0, presets=presets)
        ev = s.handle("n")
        assert ev == "PRESET alpha 0.1000 MHz" and s.tune == 100_000.0
        assert s.mode == DemodMode.AM and not s.take_reset()
        ev = s.handle("n")                       # mode swap to USB
        assert ev == "PRESET bravo 0.2000 MHz" and s.tune == 200_000.0
        assert s.mode == DemodMode.USB and s.take_reset()
        ev = s.handle("n")                       # wraps to the lowest
        assert ev.startswith("PRESET charlie") and s.tune == -150_000.0
        assert s.mode == DemodMode.AM and s.take_reset()
        ev = s.handle("N")                       # back down wraps to highest
        assert ev.startswith("PRESET bravo")
        # no presets -> 'n' is unbound
        s2 = ControlSurface(rx, rx.default_params(0.0), 0.0)
        assert s2.handle("n") is None

    def test_cli_presets_keys(self, tmp_path=None):
        """--presets CSV + scripted 'N'/'n' recall stations through the
        real CLI loop (events + final tune in the JSON metrics)."""
        import io
        import json as json_mod
        import contextlib
        import tempfile

        from pebblesdr_tpu.serve.cli import main

        with tempfile.TemporaryDirectory() as d:
            csv = d + "/presets.csv"
            with open(csv, "w") as f:
                f.write("# name,freq_hz,mode\n"
                        "station-a,250000,AM\n"
                        "station-b,-100000,AM\n")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = main(["--synthetic", "am", "--mode", "AM",
                           "--tune", "250000", "--seconds", "0.2",
                           "--blocks-per-dispatch", "1", "--json",
                           "--presets", csv, "--keys", "Nn"])
            assert rc == 0 or rc is None
            m = json_mod.loads(buf.getvalue().strip().splitlines()[-1])
            assert m["control_events"] == ["PRESET station-b -0.1000 MHz",
                                           "PRESET station-a 0.2500 MHz"]
            assert m["tune_hz"] == 250000.0
