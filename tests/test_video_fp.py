"""Video fingerprinting tests (multimodal.py video leg of the triad):
fake frame-sample determinism + locality in both dimensions, the
temporal-median clip hash, banded-vs-quadratic exactness on the real
corpus, corrupt-row quarantine, the pyav gate, and the Spark-free
pandas store twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jitsu_spark import multimodal as mm


def _clip_hash(payload: bytes, w: int = 64, h: int = 48) -> int:
    frames = mm._video_frames_fake(payload, w, h)
    return mm._temporal_median_hash([mm.dhash64(g) for g in frames])


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestVideoHashes:
    def test_fake_frames_deterministic_and_distinct(self):
        payload = ("frame content rolls through the clip " * 30).encode()
        f1 = mm._video_frames_fake(payload, 64, 48)
        f2 = mm._video_frames_fake(payload, 64, 48)
        assert len(f1) == mm.N_VIDEO_FRAMES
        assert all((a == b).all() for a, b in zip(f1, f2))
        # the rotation gives every frame distinct content (a clip, not
        # 8 copies of one still); payload-level locality is asserted at
        # clip scope below — the per-frame tile grids shift wholesale
        # under rotation, so ADJACENT frames are intentionally far apart
        h = [mm.dhash64(g) for g in f1]
        assert len(set(h)) == mm.N_VIDEO_FRAMES

    def test_clip_hash_locality(self):
        base = ("a long enough video payload to roll around " * 40).encode()
        v = _clip_hash(base)
        assert v == _clip_hash(base)
        edited = bytearray(base)
        edited[100] ^= 0x01
        assert _ham(v, _clip_hash(bytes(edited))) <= 8
        other = _clip_hash(b"entirely different clip bytes 99 " * 50)
        assert _ham(v, other) > 8

    def test_temporal_median_majority(self):
        # 3 votes of 4 set bit 0; 1 of 4 sets bit 1; ties (2/4) round UP
        assert mm._temporal_median_hash([1, 1, 1, 0]) & 1 == 1
        assert mm._temporal_median_hash([2, 0, 0, 0]) & 2 == 0
        assert mm._temporal_median_hash([4, 4, 0, 0]) & 4 == 4
        # signed packing round-trips: all-ones majority -> -1
        assert mm._temporal_median_hash([-1, -1, -1]) == -1

    def test_banded_pairs_equal_quadratic_exact(self, spark, sf_dir):
        got = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in mm.video_near_dup_pairs(spark, sf_dir).collect()
        }
        fp = mm.video_fingerprints(spark, sf_dir).where(
            F.col("vhash").isNotNull()
        )
        want = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in fp.alias("x")
            .join(fp.alias("y"), F.col("x.media_id") < F.col("y.media_id"))
            .selectExpr(
                "x.media_id AS media_a",
                "y.media_id AS media_b",
                "CAST(bit_count(x.vhash ^ y.vhash) AS INT) AS hamming",
            )
            .where(F.col("hamming") <= mm.VIDEO_HAMMING_MAX)
            .collect()
        }
        assert got == want and len(got) > 0

    def test_fingerprint_table_quarantines_corrupt_rows(self, spark):
        video = spark.createDataFrame(
            [(1, bytearray(b"ok payload bytes")), (2, bytearray(b""))],
            "media_id long, payload binary",
        ).select(
            "media_id",
            "payload",
            F.struct(
                F.lit("video/fake").alias("mime"),
                F.lit(64).alias("width"),
                F.lit(48).alias("height"),
                F.lit(1000).alias("duration_ms"),
            ).alias("meta"),
        )

        def bomb(payload, w, h, n_frames=mm.N_VIDEO_FRAMES):
            if not payload:
                raise ValueError("corrupt")
            return mm._video_frames_fake(payload, w, h, n_frames)

        rows = {
            r["media_id"]: r
            for r in mm.video_fingerprints_df(video, decoder=bomb).collect()
        }
        assert rows[1]["vhash"] is not None
        assert len(rows[1]["frame_hashes"]) == mm.N_VIDEO_FRAMES
        assert rows[2]["vhash"] is None and rows[2]["frame_hashes"] is None

    def test_real_decoder_gated_without_pyav(self):
        if mm.av_available():  # pragma: no cover - env with pyav
            pytest.skip("pyav installed; the gate branch is not reachable")
        with pytest.raises(NotImplementedError, match="pyav"):
            mm._video_frames_real(b"x", 64, 48)

    def test_pandas_store_twin_matches_spark(self, spark, tmp_path):
        sf_dir = "/root/testdata/sf0.001"
        out = str(tmp_path / "videofp")
        mm._build_vfp_store_pandas(sf_dir, out)
        via_pandas = {
            (r.media_id, r.vhash, tuple(r.frame_hashes))
            for r in spark.read.parquet(out).collect()
        }
        via_spark = {
            (r.media_id, r.vhash, tuple(r.frame_hashes))
            for r in mm.video_fingerprints_df(
                mm.video_from_documents(spark, sf_dir)
            ).collect()
        }
        assert via_pandas == via_spark

    def test_segment_overlap_detects_shared_frames(self, spark, tmp_path):
        """A clip that copies a contiguous segment of another clip is a
        segment-overlap pair even when the whole-clip hashes diverge:
        build a corpus where doc 2's payload is doc 1's rolled far
        enough that clip hashes differ, then verify the frame-level
        entry pairs them while counting >= MIN_SEG_FRAMES matches."""
        import pandas as pd

        base = ("segment of shared footage rolls here " * 40).encode()
        # doc 2 starts FRAME_STRIDE*3 bytes in: frames 3.. of doc 1
        # equal frames 0.. of doc 2 exactly (same rotation lattice)
        import numpy as np

        arr = np.frombuffer(base, dtype=np.uint8)
        shifted = np.roll(arr, -(mm.FRAME_STRIDE * 3) % arr.size).tobytes()
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    base.decode(),
                    shifted.decode(),
                    "entirely different third clip " * 40,
                ],
                "n_chars": [len(base), len(shifted), 30 * 40],
            }
        ).to_parquet(str(tmp_path / "documents.parquet"))
        pairs = {
            (r.media_a, r.media_b): r.n_frame_matches
            for r in mm.video_segment_overlap_pairs(
                spark, str(tmp_path)
            ).collect()
        }
        assert (1, 2) in pairs
        assert pairs[(1, 2)] >= mm.MIN_SEG_FRAMES
        assert (1, 3) not in pairs and (2, 3) not in pairs
