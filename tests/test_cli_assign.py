"""CLI mixed-mode (EP) smoke test: --assign routes channels to per-mode
expert chains from one capture."""

import json

from pebblesdr_tpu.serve.cli import main


class TestCliAssign:
    def test_assign_two_modes(self, tmp_path, capsys):
        out_wav = str(tmp_path / "a.wav")
        rc = main(["--synthetic", "am", "--sample-rate", "512000",
                   "--tune", "100000", "--frames", "8192",
                   "--assign", "AM@100000,USB@100000",
                   "--seconds", "0.4", "--audio-out", out_wav, "--json"])
        assert rc == 0 or rc is None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["blocks"] >= 20
        chans = metrics["channels"]
        assert [c["mode"] for c in chans] == ["AM", "USB"]
        assert [c["channel"] for c in chans] == [0, 1]
        # the AM expert decodes the AM station cleanly
        am = chans[0]
        assert am["snr_db"] > 10
        assert am["audio_rms"] > 0.01
        with open(str(tmp_path / "a.ch0.wav"), "rb") as f:
            assert f.read(4) == b"RIFF"
        with open(str(tmp_path / "a.ch1.wav"), "rb") as f:
            assert f.read(4) == b"RIFF"
