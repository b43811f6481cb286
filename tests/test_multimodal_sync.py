"""Multimodal plumbing + connector-sync tests."""

from __future__ import annotations

import datetime as dt

import pytest


class TestMultimodal:
    def test_real_decoder_is_gated_without_pil(self):
        from jitsu_spark.multimodal import _decode_real, pil_available

        if pil_available():
            pytest.skip("PIL installed: gate cannot fire for images here")
        with pytest.raises(NotImplementedError, match="Pillow"):
            _decode_real(b"x", "image/png")

    def test_uncovered_mimes_always_gated(self):
        from jitsu_spark.multimodal import _decode_real, soundfile_available

        with pytest.raises(NotImplementedError, match="no codec"):
            _decode_real(b"x", None)
        with pytest.raises(NotImplementedError, match="no codec"):
            _decode_real(b"x", "application/pdf")
        if not soundfile_available():
            # the stdlib wave fallback only covers WAV mimes
            with pytest.raises(NotImplementedError, match="no codec"):
                _decode_real(b"x", "audio/mpeg")

    def test_video_decoder_is_gated_without_pyav(self):
        """The last codec seam (r6 review item 8): video mimes route to
        the pyav gate — absent av the failure is loud and names the
        missing library, never a silent skip."""
        from jitsu_spark.multimodal import _decode_real, av_available

        if av_available():
            pytest.skip("pyav installed: gate cannot fire here")
        with pytest.raises(NotImplementedError, match="pyav"):
            _decode_real(b"x", "video/mp4")

    def test_video_garbage_payload_fails_loudly(self):
        """With pyav present, a garbage payload must raise from the
        demuxer — the fails-loudly contract of every codec branch."""
        from jitsu_spark.multimodal import _decode_video, av_available

        if not av_available():
            pytest.skip("pyav not installed in this container")
        with pytest.raises(Exception):
            _decode_video(b"not an mp4 container", "video/mp4")

    def test_video_decode_real_roundtrip(self):
        """With pyav present, encode a tiny synthetic clip and decode it
        back: frame count, dimensions and decoded-content checksum come
        from the real codec path."""
        from jitsu_spark import multimodal as mm

        if not mm.av_available():
            pytest.skip("pyav not installed in this container")
        import io

        import av
        import numpy as np

        buf = io.BytesIO()
        with av.open(buf, "w", format="mp4") as out:
            stream = out.add_stream("mpeg4", rate=4)
            stream.width, stream.height = 32, 16
            stream.pix_fmt = "yuv420p"
            for i in range(8):
                arr = np.full((16, 32, 3), i * 16, dtype=np.uint8)
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
                for packet in stream.encode(frame):
                    out.mux(packet)
            for packet in stream.encode():
                out.mux(packet)
        payload = buf.getvalue()
        feats = mm._decode_real(payload, "video/mp4")
        assert feats["payload_len"] == len(payload)
        assert feats["decoded_frames"] == 8
        assert (feats["decoded_width"], feats["decoded_height"]) == (32, 16)
        assert feats["checksum"] > 0

    def test_wav_decode_is_real(self, spark):
        """The audio branch decodes RIFF/PCM WAV wherever the
        interpreter runs (stdlib wave; soundfile takes over when
        installed): checksum over decoded sample frames + true duration
        and channel count, through the same mapInPandas plumbing."""
        import io
        import struct
        import wave as wave_mod

        from jitsu_spark import multimodal as mm

        rate, n = 8000, 1600  # 200 ms of mono 16-bit PCM
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                b"".join(struct.pack("<h", (i * 37) % 2000 - 1000) for i in range(n))
            )
        wav = buf.getvalue()
        feats = mm._decode_real(wav, "audio/wav")
        assert feats["payload_len"] == len(wav)
        assert feats["decoded_duration_ms"] == 200
        assert feats["decoded_channels"] == 1
        # payload-bytes checksum differs from decoded-frames checksum
        assert feats["checksum"] != mm._decode_fake(wav, "audio/wav")["checksum"]

        media = spark.createDataFrame(
            [(1, "audio", bytearray(wav), ("audio/wav", None, None, 200))],
            mm.MEDIA_SCHEMA,
        )
        rows = mm.extract_features(media, decoder=mm._decode_real).collect()
        assert len(rows) == 1 and rows[0].checksum == feats["checksum"]

    def test_wav_garbage_payload_fails_loudly(self):
        from jitsu_spark.multimodal import _decode_real, soundfile_available

        with pytest.raises(Exception) as exc:
            _decode_real(b"not a riff header", "audio/wav")
        # a decode error, never a silent fake-decode fallback
        assert not isinstance(exc.value, NotImplementedError) or soundfile_available()

    def test_real_decoder_with_pil(self, spark):
        """Wherever the image has Pillow, the real decode path runs
        end-to-end through the same mapInPandas plumbing: decoded pixel
        checksum + true dimensions."""
        from jitsu_spark import multimodal as mm

        if not mm.pil_available():
            pytest.skip("Pillow not installed in this image")
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (3, 2), (255, 0, 0)).save(buf, format="PNG")
        png = buf.getvalue()
        feats = mm._decode_real(png, "image/png")
        assert feats["decoded_width"] == 3 and feats["decoded_height"] == 2
        assert feats["payload_len"] == len(png)

        media = spark.createDataFrame(
            [(1, "image", bytearray(png), ("image/png", 3, 2, None))],
            mm.MEDIA_SCHEMA,
        )
        rows = mm.extract_features(media, decoder=mm._decode_real).collect()
        assert len(rows) == 1 and rows[0].payload_len == len(png)
        assert rows[0].checksum == feats["checksum"]  # pixel checksum

    def test_media_schema_and_features(self, spark, sf_dir):
        from jitsu_spark.multimodal import extract_features, media_from_documents

        media = media_from_documents(spark, sf_dir)
        assert dict(media.dtypes)["payload"] == "binary"
        feats = extract_features(media.limit(20))
        rows = feats.collect()
        assert len(rows) == 20
        for r in rows:
            assert r.payload_len > 0 and r.checksum >= 0

    def test_resize_plan_preserves_aspect(self, spark, sf_dir):
        from jitsu_spark.multimodal import media_from_documents, resize_plan

        out = resize_plan(media_from_documents(spark, sf_dir), max_side=100).limit(
            50
        )
        for r in out.collect():
            assert max(r.target_width, r.target_height) <= 100
            if max(r.width, r.height) <= 100:
                assert (r.target_width, r.target_height) == (r.width, r.height)

    def test_sample_frames(self, spark):
        from jitsu_spark.multimodal import MEDIA_SCHEMA, sample_frames

        media = spark.createDataFrame(
            [(1, "video", bytearray(b"v"), ("video/mp4", None, None, 3500))],
            MEDIA_SCHEMA,
        )
        frames = sorted(r.frame_ms for r in sample_frames(media).collect())
        assert frames == [0, 1000, 2000, 3000]


class TestSync:
    def _source(self, spark, rows):
        return lambda s: s.createDataFrame(
            rows, "id string, v string, updated_at timestamp"
        )

    def test_incremental_sync_advances_cursor(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.sources.sync import SyncConfig, SyncState, run_sync

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        state = SyncState(str(tmp_path / "state"))
        cfg = SyncConfig(
            sync_id="s1", table="users", cursor_field="updated_at",
            primary_key=["id"],
        )
        t1 = dt.datetime(2024, 1, 1, 0, 0, 1)
        t2 = dt.datetime(2024, 1, 2, 0, 0, 1)

        r1 = run_sync(spark, self._source(spark, [("a", "v1", t1)]), sink, cfg, state)
        assert r1["rows"] == 1
        # second run: one updated row (same pk, newer), one new
        r2 = run_sync(
            spark,
            self._source(spark, [("a", "v1", t1), ("a", "v2", t2), ("b", "w", t2)]),
            sink,
            cfg,
            state,
        )
        assert r2["rows"] == 2  # the t1 row is behind the cursor -> skipped
        got = {r.id: r.v for r in sink.read("users").collect()}
        assert got == {"a": "v2", "b": "w"}

    def test_full_refresh_replaces_table(self, spark, tmp_path):
        """Round-9 sources review #5: full_refresh must REPLACE the
        table (the Airbyte overwrite contract) — an upsert kept rows
        deleted at the source alive downstream forever."""
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.sources.sync import SyncConfig, SyncState, run_sync

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        state = SyncState(str(tmp_path / "state"))
        cfg = SyncConfig(
            sync_id="fr", table="users", mode="full_refresh",
            primary_key=["id"],
        )
        t1 = dt.datetime(2024, 1, 1)
        run_sync(
            spark,
            self._source(spark, [("a", "v1", t1), ("b", "w", t1)]),
            sink, cfg, state,
        )
        assert sink.read("users").count() == 2
        # row "b" deleted at the source: the refresh must drop it
        run_sync(
            spark, self._source(spark, [("a", "v2", t1)]), sink, cfg, state
        )
        got = {r.id: r.v for r in sink.read("users").collect()}
        assert got == {"a": "v2"}

    def test_rerun_with_no_new_rows_is_noop(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.sources.sync import SyncConfig, SyncState, run_sync

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        state = SyncState(str(tmp_path / "state"))
        cfg = SyncConfig(sync_id="s1", table="t", primary_key=["id"])
        t1 = dt.datetime(2024, 1, 1)
        src = self._source(spark, [("a", "v", t1)])
        assert run_sync(spark, src, sink, cfg, state)["rows"] == 1
        again = run_sync(spark, src, sink, cfg, state)
        assert again["rows"] == 0
        assert sink.read("t").count() == 1


class TestHeaderProbe:
    """Pure-stdlib container-header parsing (round 9): dimensions read
    from hand-built PNG/GIF/BMP/JPEG byte fixtures with no codec."""

    def _png(self, w, h):
        import struct

        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        )

    def _gif(self, w, h):
        import struct

        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4

    def _bmp(self, w, h):
        import struct

        return (
            b"BM"
            + b"\x00" * 16
            + struct.pack("<ii", w, h)
            + b"\x00" * 20
        )

    def _jpeg(self, w, h):
        import struct

        # SOI, APP0 segment, DHT (must be skipped), SOF0 with dims
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 11)
            + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x01\x01\x11\x00"
        )
        return b"\xff\xd8" + app0 + dht + sof0

    def test_parse_all_formats(self):
        from jitsu_spark.multimodal import parse_image_header

        assert parse_image_header(self._png(640, 480)) == {
            "format": "png", "width": 640, "height": 480,
        }
        assert parse_image_header(self._gif(13, 7)) == {
            "format": "gif", "width": 13, "height": 7,
        }
        assert parse_image_header(self._bmp(800, 600)) == {
            "format": "bmp", "width": 800, "height": 600,
        }
        # top-down BMP stores negative height
        assert parse_image_header(self._bmp(800, -600))["height"] == 600
        assert parse_image_header(self._jpeg(1920, 1080)) == {
            "format": "jpeg", "width": 1920, "height": 1080,
        }

    def test_garbage_and_truncation_yield_none(self):
        from jitsu_spark.multimodal import parse_image_header

        assert parse_image_header(b"") is None
        assert parse_image_header(b"not an image at all") is None
        assert parse_image_header(self._png(1, 1)[:12]) is None
        assert parse_image_header(b"\xff\xd8\xff") is None  # truncated JPEG
        assert parse_image_header(b"\x89PNG\r\n\x1a\nXXXXIDAT") is None

    def test_probe_over_spark(self, spark):
        from jitsu_spark.multimodal import probe_media_headers

        rows = [
            (1, self._png(640, 480)),
            (2, self._jpeg(32, 16)),
            (3, self._gif(5, 6)),
            (4, b"garbage payload"),
        ]
        media = spark.createDataFrame(
            rows, "media_id long, payload binary"
        )
        got = {
            r["media_id"]: r
            for r in probe_media_headers(media).collect()
        }
        assert (got[1]["format"], got[1]["width"], got[1]["height"]) == (
            "png", 640, 480,
        )
        assert (got[2]["format"], got[2]["width"], got[2]["height"]) == (
            "jpeg", 32, 16,
        )
        assert got[3]["format"] == "gif"
        assert got[4]["format"] is None and got[4]["width"] is None
        assert got[4]["payload_len"] == len(b"garbage payload")

    def test_parity_with_pil_if_available(self, spark):
        """When PIL is importable, the header parse must agree with the
        real decoder on PIL-generated files."""
        from jitsu_spark.multimodal import parse_image_header, pil_available

        if not pil_available():
            import pytest

            pytest.skip("PIL not installed")
        import io

        from PIL import Image

        for fmt, size in (("PNG", (37, 53)), ("GIF", (9, 4)), ("BMP", (20, 10)), ("JPEG", (64, 48))):
            buf = io.BytesIO()
            Image.new("RGB", size).save(buf, format=fmt)
            got = parse_image_header(buf.getvalue())
            assert got == {
                "format": fmt.lower(),
                "width": size[0],
                "height": size[1],
            }, fmt


class TestPerceptualHash:
    """Round-10 image near-dup dedup (VERDICT r9 #6): dHash/pHash over
    the gated grayscale decode + pigeonhole Hamming banding."""

    def test_area_resize_known_matrix(self):
        import numpy as np

        from jitsu_spark.multimodal import _area_resize

        g = np.arange(16, dtype=np.float64).reshape(4, 4)
        out = _area_resize(g, 2, 2)
        # each quadrant's mean
        assert out.tolist() == [[2.5, 4.5], [10.5, 12.5]]
        # upsample path: tiny input, every block non-empty, no NaN
        up = _area_resize(np.array([[1.0, 2.0]]), 8, 9)
        assert up.shape == (8, 9) and not np.isnan(up).any()

    def test_dhash_locality_and_determinism(self):
        from jitsu_spark.multimodal import _gray_fake, dhash64, phash64

        base = ("the quick brown fox jumps over the lazy dog " * 40).encode()
        same = dhash64(_gray_fake(base, 300, 200))
        assert same == dhash64(_gray_fake(base, 300, 200))  # deterministic
        # one-char edit: hashes stay CLOSE (locality), random text far
        edited = bytearray(base)
        edited[100] ^= 0x01
        d_edit = dhash64(_gray_fake(bytes(edited), 300, 200))
        assert bin((same ^ d_edit) & (1 << 64) - 1).count("1") <= 8
        other = dhash64(
            _gray_fake(b"zz completely different payload bytes 123" * 50, 300, 200)
        )
        assert bin((same ^ other) & (1 << 64) - 1).count("1") > 8
        # phash: same contracts, signed-64 packing round-trips
        p = phash64(_gray_fake(base, 300, 200))
        assert -(1 << 63) <= p < 1 << 63

    def test_banded_pairs_equal_quadratic_exact(self, spark, sf_dir):
        """Pigeonhole completeness on the REAL corpus: the banded plan
        finds exactly the pairs the all-pairs popcount scan finds."""
        from pyspark.sql import functions as F

        from jitsu_spark.multimodal import (
            IMAGE_HAMMING_MAX,
            image_near_dup_pairs,
            image_perceptual_hashes,
        )

        got = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in image_near_dup_pairs(spark, sf_dir).collect()
        }
        fp = image_perceptual_hashes(spark, sf_dir).where(
            F.col("dhash").isNotNull()
        )
        want = {
            (r["media_a"], r["media_b"], r["hamming"])
            for r in fp.alias("x")
            .join(fp.alias("y"), F.col("x.media_id") < F.col("y.media_id"))
            .selectExpr(
                "x.media_id AS media_a",
                "y.media_id AS media_b",
                "CAST(bit_count(x.dhash ^ y.dhash) AS INT) AS hamming",
            )
            .where(F.col("hamming") <= IMAGE_HAMMING_MAX)
            .collect()
        }
        assert got == want and len(got) > 0

    def test_hash_table_quarantines_corrupt_rows(self, spark):
        """A decoder exception becomes a NULL-hash row, never a task
        death — the probe_media_headers convention."""
        from pyspark.sql import functions as F

        from jitsu_spark.multimodal import perceptual_hashes

        media = spark.createDataFrame(
            [(1, bytearray(b"ok payload")), (2, bytearray(b""))],
            "media_id long, payload binary",
        ).select(
            "media_id",
            "payload",
            F.struct(
                F.lit("image/fake").alias("mime"),
                F.lit(10).alias("width"),
                F.lit(10).alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
        )

        def bomb(payload, w, h):
            if not payload:
                raise ValueError("corrupt")
            from jitsu_spark.multimodal import _gray_fake

            return _gray_fake(payload, w, h)

        rows = {
            r["media_id"]: r
            for r in perceptual_hashes(media, decoder=bomb).collect()
        }
        assert rows[1]["dhash"] is not None
        assert rows[2]["dhash"] is None and rows[2]["phash"] is None

    def test_real_decoder_gated_without_pil(self):
        from jitsu_spark.multimodal import _gray_real, pil_available

        if pil_available():
            import numpy as np

            # 1x1 PNG through the real path when PIL exists
            import base64

            png = base64.b64decode(
                b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
                b"YGBgAAAABQABh6FO1AAAAABJRU5ErkJggg=="
            )
            g = _gray_real(png, 1, 1)
            assert isinstance(g, np.ndarray) and g.shape == (1, 1)
        else:
            with pytest.raises(NotImplementedError, match="Pillow"):
                _gray_real(b"x", 1, 1)


class TestDeterministicStores:
    """The deterministic media-hash stores (round 11): the Spark-free
    pandas builders produce byte-identical values to the Spark path,
    the fingerprint sidecar memoizes freshness, and a dataset change
    rebuilds."""

    def test_pandas_builder_matches_spark_values(self, spark, tmp_path):
        import jitsu_spark.multimodal as MM

        sf_dir = "/root/testdata/sf0.001"
        out = str(tmp_path / "imgphash")
        MM._build_phash_store_pandas(sf_dir, out)
        via_pandas = {
            (r.media_id, r.dhash, r.phash)
            for r in spark.read.parquet(out).collect()
        }
        via_spark = {
            (r.media_id, r.dhash, r.phash)
            for r in MM.perceptual_hashes(
                MM.media_from_documents(spark, sf_dir)
            ).collect()
        }
        assert via_pandas == via_spark

        out_a = str(tmp_path / "audiofp")
        MM._build_afp_store_pandas(sf_dir, out_a)
        a_pandas = {
            (r.media_id, r.ehash, r.shash)
            for r in spark.read.parquet(out_a).collect()
        }
        a_spark = {
            (r.media_id, r.ehash, r.shash)
            for r in MM.audio_fingerprints_df(
                MM.audio_from_documents(spark, sf_dir)
            ).collect()
        }
        assert a_pandas == a_spark

    def test_sidecar_freshness_and_rebuild(self, tmp_path, monkeypatch):
        import json

        import pandas as pd

        import jitsu_spark.multimodal as MM

        # a private dataset dir so the deterministic path is ours
        sf = tmp_path / "sf"
        sf.mkdir()
        pd.DataFrame(
            {"doc_id": [1], "text": ["alpha"], "n_chars": [5]}
        ).to_parquet(sf / "documents.parquet")
        monkeypatch.setattr(
            MM, "media_store_dir",
            lambda s, fam: str(tmp_path / f"store_{fam}"),
        )
        builds = []

        def build(path):
            builds.append(path)
            MM._build_phash_store_pandas(str(sf), path)

        p1 = MM._ensure_media_store(str(sf), "t1", "test_ledger", build)
        p2 = MM._ensure_media_store(str(sf), "t1", "test_ledger", build)
        assert p1 == p2 and len(builds) == 1
        with open(p1 + "/_fingerprint.json") as f:
            assert json.load(f) is not None

        # dataset change -> stale sidecar -> rebuild
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["alpha", "beta"], "n_chars": [5, 4]}
        ).to_parquet(sf / "documents.parquet")
        MM._MEDIA_STORE_MEMO.clear()
        MM._ensure_media_store(str(sf), "t1", "test_ledger", build)
        assert len(builds) == 2
