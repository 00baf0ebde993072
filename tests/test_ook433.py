import jax.numpy as jnp
import numpy as np

from pebblesdr_tpu.modem import ook433


class TestOsv2:
    def _roundtrip(self, temp):
        fs = 32768.0
        sig = ook433.encode_osv2(0x1D20, 1, temp, fs)
        # pad with silence around the burst
        sig = np.concatenate([np.zeros(2048, np.complex64), sig,
                              np.zeros(2048, np.complex64)])
        demod = ook433.OokDemod(fs)
        dec = ook433.OsV2Decoder(frame_rate=demod.frame_rate)
        n = (len(sig) // demod.frame) * demod.frame
        on = demod.detect(jnp.asarray(sig[None, :n]))
        dec.feed(np.asarray(on)[0])
        return dec.messages

    def test_positive_temperature(self):
        msgs = self._roundtrip(23.4)
        assert msgs, "no message decoded"
        m = msgs[0]
        assert m["sensor_id"] == 0x1D20
        assert m["channel"] == 1
        assert m["temperature_c"] == 23.4
        assert m["checksum_ok"]

    def test_negative_temperature(self):
        msgs = self._roundtrip(-7.5)
        assert msgs and msgs[0]["temperature_c"] == -7.5

    def test_noise_no_false_decode(self):
        fs = 32768.0
        rng = np.random.default_rng(0)
        sig = (0.1 * (rng.normal(size=16384) + 1j * rng.normal(size=16384))).astype(np.complex64)
        demod = ook433.OokDemod(fs)
        dec = ook433.OsV2Decoder(frame_rate=demod.frame_rate)
        n = (len(sig) // demod.frame) * demod.frame
        on = demod.detect(jnp.asarray(sig[None, :n]))
        dec.feed(np.asarray(on)[0])
        assert not any(m["checksum_ok"] for m in dec.messages)
