"""Audio fingerprinting tests (multimodal.py audio twin): fake-decode
determinism + locality, banded-vs-quadratic exactness on the real corpus,
corrupt-row quarantine, and the real WAV decode path."""

from __future__ import annotations

import io
import struct
import wave as wave_mod

import pytest
from pyspark.sql import functions as F

from jitsu_spark import multimodal as mm


def _wav_bytes(samples, rate=8000):
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


class TestAudioHashes:
    def test_fake_decode_determinism_and_locality(self):
        base = ("ring ring hello this is a long audio clip " * 40).encode()
        e = mm.ehash64(mm._pcm_fake(base, 2000, 8000))
        assert e == mm.ehash64(mm._pcm_fake(base, 2000, 8000))
        # one-byte edit: envelope hash stays CLOSE (locality)
        edited = bytearray(base)
        edited[200] ^= 0x01
        e_edit = mm.ehash64(mm._pcm_fake(bytes(edited), 2000, 8000))
        assert bin((e ^ e_edit) & (1 << 64) - 1).count("1") <= 8
        # different payload: far
        other = mm.ehash64(
            mm._pcm_fake(b"zz entirely different waveform bytes 99" * 60, 2000, 8000)
        )
        assert bin((e ^ other) & (1 << 64) - 1).count("1") > 8
        # shash: signed-64 packing round-trips
        s = mm.shash64(mm._pcm_fake(base, 2000, 8000))
        assert -(1 << 63) <= s < 1 << 63

    def test_gain_invariance_of_ehash(self):
        """Only the SIGN of the envelope slope survives: scaling the
        waveform leaves ehash unchanged."""
        w = mm._pcm_fake(b"some clip payload bytes " * 50, 1500, 8000)
        assert mm.ehash64(w) == mm.ehash64(w * 0.25)

    def test_short_waveform_padded_not_nan(self):
        # fewer samples than frames: tiled up, every frame non-empty
        w = mm._pcm_fake(b"x", 1, 1)
        assert w.size >= 65
        assert isinstance(mm.ehash64(w), int)

    def test_banded_pairs_equal_quadratic_exact(self, spark, sf_dir):
        got = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in mm.audio_near_dup_pairs(spark, sf_dir).collect()
        }
        fp = mm.audio_fingerprints(spark, sf_dir).where(
            F.col("ehash").isNotNull()
        )
        want = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in fp.alias("x")
            .join(fp.alias("y"), F.col("x.media_id") < F.col("y.media_id"))
            .selectExpr(
                "x.media_id AS media_a",
                "y.media_id AS media_b",
                "CAST(bit_count(x.ehash ^ y.ehash) AS INT) AS hamming",
            )
            .where(F.col("hamming") <= mm.AUDIO_HAMMING_MAX)
            .collect()
        }
        assert got == want and len(got) > 0

    def test_fingerprint_table_quarantines_corrupt_rows(self, spark):
        audio = spark.createDataFrame(
            [(1, bytearray(b"ok payload")), (2, bytearray(b""))],
            "media_id long, payload binary",
        ).select(
            "media_id",
            "payload",
            F.struct(
                F.lit("audio/fake").alias("mime"),
                F.lit(500).alias("duration_ms"),
                F.lit(8000).alias("sample_rate"),
            ).alias("meta"),
        )

        def bomb(payload, dur, rate):
            if not payload:
                raise ValueError("corrupt")
            return mm._pcm_fake(payload, dur, rate)

        rows = {
            r["media_id"]: r
            for r in mm.audio_fingerprints_df(audio, decoder=bomb).collect()
        }
        assert rows[1]["ehash"] is not None and rows[1]["shash"] is not None
        assert rows[2]["ehash"] is None and rows[2]["shash"] is None

    def test_real_wav_decode_path(self):
        """RIFF/PCM decodes through the real seam in this container
        (stdlib wave when soundfile is absent): a loud clip and its
        half-gain copy produce the SAME ehash (gain invariance through
        the real decoder), and garbage fails loudly."""
        import math

        # even samples so the half-gain copy (s // 2) is an EXACT scaling
        samples = [2 * int(4000 * math.sin(i / 20)) for i in range(1600)]
        full = _wav_bytes(samples)
        half = _wav_bytes([s // 2 for s in samples])
        w_full = mm._pcm_real(full, 200, 8000)
        w_half = mm._pcm_real(half, 200, 8000)
        assert mm.ehash64(w_full) == mm.ehash64(w_half)
        if not mm.soundfile_available():
            with pytest.raises(NotImplementedError, match="no codec"):
                mm._pcm_real(b"not a riff header", 100, 8000)

    def test_fake_waveform_sample_count_bounded(self):
        """A hostile duration claim cannot allocate unbounded task
        memory: the fake decode caps samples at 2^20."""
        w = mm._pcm_fake(b"abc", 10**9, 48000)
        assert w.size == 1 << 20
