"""CLI smoke tests (the app-shell surface) — run in-process via main()."""

import json

import numpy as np
import pytest

from pebblesdr_tpu.serve.cli import main


class TestCli:
    def test_synthetic_usb(self, tmp_path, capsys):
        out_wav = str(tmp_path / "a.wav")
        rc = main(["--synthetic", "tone", "--mode", "USB", "--tune", "400000",
                   "--seconds", "0.3", "--audio-out", out_wav, "--json"])
        assert rc == 0 or rc is None
        captured = capsys.readouterr().out.strip().splitlines()[-1]
        metrics = json.loads(captured)
        assert metrics["squelch_open"] is True
        assert metrics["audio_rms"] > 0.1
        with open(out_wav, "rb") as f:
            assert f.read(4) == b"RIFF"

    def test_wav_roundtrip_with_checkpoint(self, tmp_path, capsys):
        from pebblesdr_tpu.io import wav

        fs = 2_048_000
        t = np.arange(fs // 4) / fs
        iq = (0.4 * (1 + 0.5 * np.cos(2 * np.pi * 1000 * t)) / 2
              * np.exp(2j * np.pi * 300_000 * t)).astype(np.complex64)
        p = str(tmp_path / "in.wav")
        wav.write_iq_wav(p, iq, fs, center_freq_hz=300_000.0, demod_mode="AM")
        ck = str(tmp_path / "state.npz")
        rc = main(["--wav", p, "--mode", "AM", "--seconds", "0.2",
                   "--checkpoint", ck, "--json"])
        assert rc == 0 or rc is None
        # resume from the checkpoint
        rc = main(["--wav", p, "--mode", "AM", "--seconds", "0.1",
                   "--resume", ck, "--json"])
        assert rc == 0 or rc is None

    def test_rtl_tcp_source(self, capsys):
        from pebblesdr_tpu.io import registry
        from pebblesdr_tpu.io.rtl_tcp import RtlTcpServer

        src = registry.create("synthetic", sample_rate=2_048_000,
                              tones=((251_000.0, 0.4),))
        server = RtlTcpServer(src, port=0, block=32768)
        server.start()
        try:
            rc = main(["--source", "rtl_tcp", "--host", "127.0.0.1",
                       "--port", str(server.port), "--sample-rate", "2048000",
                       "--mode", "AM", "--tune", "250000",
                       "--seconds", "0.2", "--json"])
            assert rc == 0 or rc is None
            metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert metrics["snr_db"] > 30
        finally:
            server.stop()


class TestCliNewFlags:
    def test_noise_blanker_flag(self, capsys):
        rc = main(["--synthetic", "am", "--mode", "AM", "--tune", "250000",
                   "--seconds", "0.2", "--noise-blanker", "--json"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["audio_rms"] > 0.05

    def test_wfm_hq_flag(self, capsys):
        rc = main(["--synthetic", "am", "--mode", "FM-Stereo",
                   "--tune", "250000", "--seconds", "0.15", "--wfm-hq",
                   "--json"])
        assert rc == 0 or rc is None

    def test_ctcss_flag_requires_fmn(self, capsys):
        with pytest.raises(ValueError):
            main(["--synthetic", "am", "--mode", "AM", "--tune", "250000",
                  "--seconds", "0.1", "--ctcss", "123.0", "--json"])


class TestCliAudioDecode:
    def test_dtmf_decode_end_to_end(self, tmp_path, capsys):
        """--decode dtmf: FM wav -> chain -> audio -> DtmfModem -> digits
        (the dial-string path at the app-shell surface)."""
        from pebblesdr_tpu.io import wav
        from pebblesdr_tpu.modem import dtmf as dtmf_mod

        fs = 256_000
        dial = dtmf_mod.encode_dtmf("911", 48000.0, tone_ms=80, gap_ms=80)
        seconds = 2.2
        n = int(fs * seconds)
        afull = np.zeros(int(seconds * 48000) + 1, np.float32)
        afull[2000:2000 + len(dial)] = dial
        a_dev = np.interp(np.arange(n) / fs,
                          np.arange(len(afull)) / 48000.0, afull)
        ph = 2 * np.pi * np.cumsum(3000.0 * a_dev) / fs
        iq = (0.5 * np.exp(1j * (2 * np.pi * 30_000.0 * np.arange(n) / fs
                                 + ph))).astype(np.complex64)
        p = str(tmp_path / "dtmf.wav")
        wav.write_iq_wav(p, iq, fs, center_freq_hz=30_000.0,
                         demod_mode="FMN")
        # run shorter than the file: the FileSource loops, and a second
        # pass would decode the dial twice
        rc = main(["--wav", p, "--mode", "FMN", "--tune", "30000",
                   "--sample-rate", str(fs), "--frames", "32768",
                   "--seconds", "1.5", "--decode", "dtmf", "--json"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["decoded_digits"] == "911"

    def test_wwv_decode_smoke(self, capsys):
        # too short to see a full minute — the surface must still run and
        # report no decode rather than fail
        rc = main(["--synthetic", "am", "--mode", "AM", "--tune", "250000",
                   "--seconds", "0.2", "--decode", "wwv", "--json"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["decoded_time"] is None


class TestCliDecode:
    def test_cw_decode_end_to_end(self, capsys):
        """--synthetic morse --decode cw: MorseGen source -> chain taps ->
        Goertzel-OOK modem -> text (the reference's CW decode path,
        morse.cpp:761+, at the app-shell surface)."""
        rc = main(["--synthetic", "morse", "--mode", "CWU",
                   "--tune", "100000", "--seconds", "3.2",
                   "--decode", "cw", "--json"])
        assert rc == 0 or rc is None
        out = capsys.readouterr().out
        metrics = json.loads(out.strip().splitlines()[-1])
        # 3.2 s of 20 WPM airs "cq cq ..." — the full callsign takes ~14 s
        assert metrics["decoded_text"].lower().startswith("cq")
