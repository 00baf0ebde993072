"""Terminal display (thin-client SpectrumWidget/SMeterWidget analog) tests."""

import json

import numpy as np

from pebblesdr_tpu.serve import display


class TestPrimitives:
    def test_pick_width(self):
        assert display.pick_width(2048, 128) == 128
        assert display.pick_width(2048, 100) == 64
        assert display.pick_width(100, 128) == 100
        assert display.pick_width(7, 4) == 1

    def test_waterfall_row_mono(self):
        db = np.linspace(-130, -20, 64)
        row = display.waterfall_row(db, color=False)
        assert len(row) == 64
        # monotone ramp: weakest char first, strongest last
        assert row[0] == " " and row[-1] == "@"

    def test_waterfall_row_ansi(self):
        row = display.waterfall_row(np.full(8, -75.0), color=True)
        assert row.count("\x1b[48;5;") == 8 and row.endswith("\x1b[0m")

    def test_spectrum_panel_shape_and_peak(self):
        db = np.full(32, -130.0)
        db[10] = -20.0
        rows = display.spectrum_panel(db, height=8)
        assert len(rows) == 8 and all(len(r) == 32 for r in rows)
        # the peak column is a full block on the top row, noise floor is not
        assert rows[0][10] == "█" and rows[0][0] == " "

    def test_smeter_labels(self):
        # S9 = -73 dB, 6 dB per unit (db.h capability)
        assert display.smeter_bar(-73.0).startswith("S9")
        assert display.smeter_bar(-73.0 + 20.0).startswith("S9+20")
        assert display.smeter_bar(-73.0 - 12.0).startswith("S7")
        assert "SNR  12.0 dB" in display.smeter_bar(-73.0, 12.0)

    def test_freq_axis(self):
        ax = display.freq_axis(100e6, 2e6, 80)
        assert "99MHz" in ax and "101MHz" in ax

    def test_terminal_display_frames(self):
        d = display.TerminalDisplay(mode="spectrum", width=64, height=6,
                                    color=False)
        db = np.full(2048, -120.0)
        first = d.frame(db, {"signal_db": -60.0, "snr_db": 30.0},
                        center_hz=1e6, span_hz=2e6)
        assert "\x1b[" not in first.split("\n")[0]  # no repaint on frame 1
        second = d.frame(db, None)
        assert second.startswith("\x1b[")           # in-place repaint after

    def test_terminal_display_waterfall_axis_once(self):
        d = display.TerminalDisplay(mode="waterfall", width=64, color=False)
        db = np.full(1024, -100.0)
        f1 = d.frame(db, None, center_hz=0.0, span_hz=1e6)
        f2 = d.frame(db, None, center_hz=0.0, span_hz=1e6)
        assert "kHz" in f1 and "kHz" not in f2


class TestCliDisplay:
    def test_cli_waterfall_smoke(self, capsys):
        from pebblesdr_tpu.serve.cli import main

        rc = main(["--synthetic", "am", "--mode", "AM", "--tune", "250000",
                   "--seconds", "0.1", "--display", "waterfall", "--json"])
        assert rc == 0 or rc is None
        out = capsys.readouterr().out
        lines = [ln for ln in out.strip().splitlines() if ln]
        # last line is the JSON metrics; earlier lines include the waterfall
        json.loads(lines[-1])
        assert any("MHz" in ln or "kHz" in ln for ln in lines)  # freq axis
