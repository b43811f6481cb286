"""JSONL ingest quarantine semantics + retrieval-decontamination meaning
(oracle parity is covered by the contract gate)."""

from __future__ import annotations

import os

import pytest


class TestJsonlQuarantine:
    def _write(self, tmp_path, lines):
        p = tmp_path / "in.jsonl"
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_good_bad_routing(self, spark, tmp_path):
        from jitsu_spark.sources.jsonl import DOCUMENTS_JSON_SCHEMA, read_jsonl

        path = self._write(
            tmp_path,
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en",'
                ' "source": "s0", "n_chars": 11}',
                "this is not json at all {{{",
                '{"doc_id": 2, "lang": "en", "source": "s0", "n_chars": 0}',
                "",
                '{"doc_id": 3, "text": "ok", "lang": null, "source": "s1",'
                ' "n_chars": 2}',
            ],
        )
        good, bad = read_jsonl(
            spark,
            path,
            DOCUMENTS_JSON_SCHEMA,
            required=("doc_id", "text", "source"),
        )
        g = good.toPandas().sort_values("doc_id")
        b = bad.toPandas()
        # doc 2 lacks required `text`; the garbage line is unparseable;
        # the blank line is skipped entirely; lang=null is NOT required
        assert list(g.doc_id) == [1, 3]
        assert set(b.reason) == {"unparseable_json", "missing_required:text"}
        # quarantine keeps the raw payload for replay-after-fix
        assert any("not json" in line for line in b.line)
        assert any('"doc_id": 2' in line for line in b.line)

    def test_partial_json_does_not_half_populate(self, spark, tmp_path):
        from jitsu_spark.sources.jsonl import DOCUMENTS_JSON_SCHEMA, read_jsonl

        # a truncated record must not leak a half-filled row into good
        path = self._write(
            tmp_path, ['{"doc_id": 9, "text": "trunca']
        )
        good, bad = read_jsonl(
            spark, path, DOCUMENTS_JSON_SCHEMA, required=("doc_id", "text")
        )
        assert good.count() == 0
        assert bad.count() == 1

    def test_streaming_twin_routes_identically(self, spark, tmp_path):
        """The streaming form runs the SAME parse/route expressions: one
        availableNow pass over a shard directory lands exactly the batch
        split, quarantine included."""
        from jitsu_spark.sources.jsonl import (
            DOCUMENTS_JSON_SCHEMA,
            read_jsonl,
            stream_jsonl,
        )

        src = tmp_path / "shards"
        src.mkdir()
        (src / "a.jsonl").write_text(
            '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s0",'
            ' "n_chars": 5}\nnot json\n'
        )
        (src / "b.jsonl").write_text(
            '{"doc_id": 2, "source": "s0"}\n'
            '{"doc_id": 3, "text": "beta", "lang": "de", "source": "s1",'
            ' "n_chars": 4}\n'
        )
        req = ("doc_id", "text", "source")
        good_s, bad_s = stream_jsonl(
            spark, str(src), DOCUMENTS_JSON_SCHEMA, required=req
        )
        out = {}
        for name, sdf in (("good", good_s), ("bad", bad_s)):
            q = (
                sdf.writeStream.format("memory")
                .queryName(f"jsonl_{name}")
                .trigger(availableNow=True)
                .option(
                    "checkpointLocation", str(tmp_path / f"ckpt_{name}")
                )
                .start()
            )
            q.awaitTermination(60)
            out[name] = spark.sql(f"SELECT * FROM jsonl_{name}").toPandas()
        bgood, bbad = read_jsonl(
            spark, str(src), DOCUMENTS_JSON_SCHEMA, required=req
        )
        assert sorted(out["good"].doc_id) == sorted(
            bgood.toPandas().doc_id
        ) == [1, 3]
        assert sorted(out["bad"].reason) == sorted(
            bbad.toPandas().reason
        ) == ["missing_required:text", "unparseable_json"]

    def test_roundtrip_export_is_idempotent(self, spark, sf_dir):
        from jitsu_spark.sources.jsonl import export_documents_jsonl

        p1 = export_documents_jsonl(spark, sf_dir)
        mtime = os.path.getmtime(os.path.join(p1, "_SUCCESS"))
        p2 = export_documents_jsonl(spark, sf_dir)
        assert p1 == p2
        assert os.path.getmtime(os.path.join(p2, "_SUCCESS")) == mtime

    def test_cache_root_refuses_symlink(self, tmp_path, monkeypatch):
        """A pre-created symlink at the cache-root path must be refused,
        not followed (os.stat follows; os.lstat + islink does not)."""
        import pytest

        from jitsu_spark.sources.jsonl import _jsonl_cache_root

        victim = tmp_path / "victim"
        victim.mkdir()
        link = tmp_path / "cache_link"
        link.symlink_to(victim)
        monkeypatch.setenv("JITSU_JSONL_CACHE_DIR", str(link))
        with pytest.raises(RuntimeError, match="symlink"):
            _jsonl_cache_root()


class TestRetrievalContamination:
    def test_leaked_doc_ranks_first(self, spark, tmp_path):
        from jitsu_spark.operators.quality_filters import (
            retrieval_contamination,
        )

        # doc 34 hashes into the test buckets (>= 950); train doc 0 is a
        # verbatim leak of it, train docs 1..5 are unrelated
        leak = " ".join(f"w{i} w{i+1} w{i+2}" for i in range(0, 30, 3))
        rows = [(34, leak, "en"), (0, leak, "en")]
        rows += [
            (i, " ".join(f"z{i}_{j}" for j in range(30)), "en")
            for i in range(1, 6)
        ]
        spark.createDataFrame(
            [(i, t, lang, "s0", len(t)) for i, t, lang in rows],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = retrieval_contamination(spark, str(tmp_path)).toPandas()
        top = out[(out.test_doc_id == 34) & (out["rank"] == 1)]
        assert list(top.train_doc_id) == [0]
        # unrelated docs share no query shingle -> absent entirely
        assert set(out.train_doc_id) == {0}
