"""ghpsdr3 client loopback + audio output sinks + sharded-step parity."""

import socket
import struct
import threading

import numpy as np
import pytest

from pebblesdr_tpu.io import audio_out, ghpsdr3
from pebblesdr_tpu.ops.util_filters import alaw_compress


class FakeDspServer:
    """Minimal ghpsdr3 dspserver: answers startaudiostream with aLaw audio
    frames and getspectrum with a spectrum frame."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.commands = []
        self.thread = threading.Thread(target=self.run, daemon=True)
        self.thread.start()

    def run(self):
        conn, _ = self.sock.accept()
        t = np.arange(2000) / ghpsdr3.AUDIO_RATE
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        payload = alaw_compress(tone).tobytes()
        streaming = False
        try:
            while True:
                cmd = conn.recv(64)
                if not cmd:
                    return
                text = cmd.rstrip(b"\0").decode(errors="replace")
                self.commands.append(text)
                if text.startswith("startaudiostream"):
                    streaming = True
                    for _ in range(4):
                        hdr = bytearray(ghpsdr3.HEADER_LEN)
                        hdr[0] = ghpsdr3.AUDIO_BUFFER
                        hdr[1:3] = struct.pack(">H", len(payload))
                        conn.sendall(bytes(hdr) + payload)
                elif text.startswith("getspectrum"):
                    spec = np.linspace(0, 120, 480).astype(np.uint8).tobytes()
                    hdr = bytearray(ghpsdr3.HEADER_LEN)
                    hdr[0] = ghpsdr3.SPECTRUM_BUFFER
                    hdr[1:3] = struct.pack(">H", len(spec))
                    hdr[9:13] = struct.pack(">I", 48000)
                    conn.sendall(bytes(hdr) + spec)
        except OSError:
            pass


class TestGhpsdr3:
    def test_audio_roundtrip(self):
        srv = FakeDspServer()
        cli = ghpsdr3.Ghpsdr3Client("127.0.0.1", srv.port)
        cli.set_frequency(7_100_000)
        cli.set_mode("LSB")
        cli.set_filter(-2700, -300)
        cli.start_audio()
        audio = cli.read_audio(4000)
        assert audio.shape == (4000,)
        # recover the 440 Hz tone through the aLaw roundtrip
        tt = np.arange(4000) / ghpsdr3.AUDIO_RATE
        basis = np.stack([np.cos(2 * np.pi * 440 * tt), np.sin(2 * np.pi * 440 * tt)])
        coef, *_ = np.linalg.lstsq(basis.T, audio, rcond=None)
        assert np.hypot(*coef) == pytest.approx(0.5, rel=0.05)
        cli.get_spectrum(480)
        cli.close()
        assert any(c.startswith("attachreceiver") for c in srv.commands)
        assert "setfrequency 7100000" in srv.commands


class TestAudioOut:
    def test_wav_sink(self, tmp_path):
        p = str(tmp_path / "out.wav")
        out = audio_out.factory("wav", path=p)
        out.start(48000)
        out.send(np.ones(480, np.float32) * 0.25)
        out.send(np.ones(480, np.float32), mute=True)
        out.stop()
        with open(p, "rb") as f:
            assert f.read(4) == b"RIFF"

    def test_null_sink_counts(self):
        out = audio_out.factory("null")
        out.start(48000)
        out.send(np.zeros(100, np.float32))
        assert out.samples_sent == 100

    def test_factory_rejects_unknown(self):
        with pytest.raises(ValueError):
            audio_out.factory("bogus")
