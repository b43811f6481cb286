"""Training-run planning operators: curriculum order, span-corruption
accounting, DoReMi-lite mixture weights, epoch-repeat schedule."""

from __future__ import annotations

import pytest

# r13: long end-to-end file — excluded from the default pytest profile
# (pytest.ini addopts -m "not slow"); run with -m slow / -m "slow or not slow".
pytestmark = pytest.mark.slow


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


class TestCurriculumOrder:
    def test_positions_are_a_permutation(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import curriculum_order

        rows = curriculum_order(spark, sf_dir).collect()
        n = len(rows)
        assert sorted(r.pos for r in rows) == list(range(n))

    def test_difficulty_monotone_along_position(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import curriculum_order

        rows = sorted(curriculum_order(spark, sf_dir).collect(),
                      key=lambda r: r.pos)
        lens = [r.n_tokens for r in rows]
        assert lens == sorted(lens)

    def test_phases_balanced_within_one(self, spark, sf_dir):
        from collections import Counter

        from jitsu_spark.operators.training_plan import (
            N_PHASES,
            curriculum_order,
        )

        rows = curriculum_order(spark, sf_dir).collect()
        counts = Counter(r.phase for r in rows)
        assert set(counts) <= set(range(N_PHASES))
        assert max(counts.values()) - min(counts.values()) <= 1

    def test_ties_shuffled_not_id_ordered(self, spark, tmp_path):
        # 32 same-length docs: curriculum positions within the tie must
        # follow md5(doc_id), which is NOT the identity order.
        from jitsu_spark.operators.training_plan import curriculum_order

        rows = [(i, f"w{i} x y", "s0") for i in range(32)]
        out = sorted(
            curriculum_order(spark, _write_docs(spark, tmp_path, rows))
            .collect(),
            key=lambda r: r.pos,
        )
        assert [r.doc_id for r in out] != list(range(32))

    def test_zero_token_docs_lead(self, spark, tmp_path):
        from jitsu_spark.operators.training_plan import curriculum_order

        rows = [(1, "", "s0"), (2, "a b c", "s0"), (3, "a", "s0")]
        out = sorted(
            curriculum_order(spark, _write_docs(spark, tmp_path, rows))
            .collect(),
            key=lambda r: r.pos,
        )
        assert [r.doc_id for r in out] == [1, 3, 2]


class TestSpanCorruptionPlan:
    def test_t5_length_identity(self, spark, sf_dir):
        # inputs + targets = n_tokens + 2*n_spans + 1 (each corrupted
        # token appears once across the pair, each span adds a sentinel
        # to both sides, targets end with EOS).
        from jitsu_spark.operators.training_plan import span_corruption_plan

        for r in span_corruption_plan(spark, sf_dir).collect():
            assert r.n_corrupt >= 1 and r.n_spans >= 1
            assert (
                r.inputs_len + r.targets_len
                == r.n_tokens + 2 * r.n_spans + 1
            )

    def test_corruption_rate_near_15_pct(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import span_corruption_plan

        for r in span_corruption_plan(spark, sf_dir).collect():
            if r.n_tokens >= 20:
                assert abs(r.n_corrupt / r.n_tokens - 0.15) < 0.03

    def test_zero_and_tiny_docs(self, spark, tmp_path):
        from jitsu_spark.operators.training_plan import span_corruption_plan

        rows = [(1, "", "s0"), (2, "one", "s0"), (3, "a b c d e f g", "s0")]
        out = {
            r.doc_id: r
            for r in span_corruption_plan(
                spark, _write_docs(spark, tmp_path, rows)
            ).collect()
        }
        z = out[1]
        assert (z.n_corrupt, z.n_spans, z.inputs_len, z.targets_len) == (
            0, 0, 0, 0,
        )
        assert z.sentinel_ok
        one = out[2]  # 1 token -> corrupt floor clamps to 1 token, 1 span
        assert (one.n_corrupt, one.n_spans) == (1, 1)
        assert one.inputs_len == 1 and one.targets_len == 3
        seven = out[3]  # round(7*.15)=1 corrupt, 1 span
        assert (seven.n_corrupt, seven.n_spans) == (1, 1)


class TestDomainMixtureWeights:
    def test_shares_sum_to_one_within_floor(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import (
            domain_mixture_weights,
        )

        rows = domain_mixture_weights(spark, sf_dir).collect()
        n = len(rows)
        for col in ("baseline_share_pm", "mix_share_pm"):
            total = sum(getattr(r, col) for r in rows)
            assert 1000 - n <= total <= 1000
        assert abs(sum(r.delta_pm for r in rows)) <= n

    def test_equal_mass_tilt_orders_by_kl(self, spark, tmp_path):
        # Two sources, identical token mass; src "rep" is one repeated
        # token (max divergence from the corpus LM), src "mix" matches
        # the corpus distribution more closely -> rep gets the
        # strictly larger mix share.
        from jitsu_spark.operators.training_plan import (
            domain_mixture_weights,
        )

        rows = [
            (1, "aa aa aa aa aa aa aa aa", "rep"),
            (2, "aa bb cc dd ee ff gg hh", "mix"),
        ]
        out = {
            r.source: r
            for r in domain_mixture_weights(
                spark, _write_docs(spark, tmp_path, rows)
            ).collect()
        }
        assert out["rep"].kl_e4 > out["mix"].kl_e4
        assert out["rep"].mix_share_pm > out["mix"].mix_share_pm
        assert out["rep"].delta_pm > 0 >= out["mix"].delta_pm

    def test_kl_nonnegative(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import (
            domain_mixture_weights,
        )

        assert all(
            r.kl_e4 >= 0
            for r in domain_mixture_weights(spark, sf_dir).collect()
        )


class TestEpochRepeatPlan:
    def test_epochs_capped_and_budget_allocated(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import (
            BUDGET_MULT,
            R_MAX,
            epoch_repeat_plan,
        )

        rows = epoch_repeat_plan(spark, sf_dir).collect()
        total = sum(r.n_tokens for r in rows)
        alloc = sum(r.alloc_tokens for r in rows)
        # integer floors only ever under-allocate, by < 1 per source
        assert total * BUDGET_MULT - len(rows) <= alloc
        assert alloc <= total * BUDGET_MULT
        for r in rows:
            assert 0 <= r.epochs_pm <= R_MAX * 1000
            assert r.repeat_capped == (
                (r.alloc_tokens * 1000) // r.n_tokens > R_MAX * 1000
            )

    def test_effective_value_bounds(self, spark, sf_dir):
        # effective_tokens <= full utility table value and >= one clean
        # epoch whenever at least one epoch runs.
        from jitsu_spark.operators.training_plan import (
            EPOCH_UTILITY_PM,
            epoch_repeat_plan,
        )

        cap = sum(EPOCH_UTILITY_PM)
        for r in epoch_repeat_plan(spark, sf_dir).collect():
            assert r.effective_tokens <= r.n_tokens * cap // 1000
            if r.epochs_pm >= 1000:
                assert r.effective_tokens >= r.n_tokens

    def test_thin_source_upsampled(self, spark, tmp_path):
        # alpha=0.5 flattening: a source with 1/16 the mass gets ~1/4 the
        # allocation share -> more epochs than the fat source.
        from jitsu_spark.operators.training_plan import epoch_repeat_plan

        rows = [(i, "w " * 64, "fat") for i in range(16)]
        rows.append((99, "w " * 64, "thin"))
        out = {
            r.source: r
            for r in epoch_repeat_plan(
                spark, _write_docs(spark, tmp_path, rows)
            ).collect()
        }
        assert out["thin"].epochs_pm > out["fat"].epochs_pm


class TestFimSplitPlan:
    def test_split_partitions_the_document(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import fim_split_plan

        for r in fim_split_plan(spark, sf_dir).collect():
            if r.fim_applied:
                assert r.prefix_len + r.middle_len + r.suffix_len == r.n_tokens
                assert min(r.prefix_len, r.middle_len, r.suffix_len) >= 0
                assert r.mode in ("psm", "spm")
                assert r.out_len == r.n_tokens + 3
            else:
                assert (r.prefix_len, r.middle_len, r.suffix_len) == (0, 0, 0)
                assert r.mode == "none"
                assert r.out_len == r.n_tokens

    def test_rate_near_half_and_deterministic(self, spark, sf_dir):
        from jitsu_spark.operators.training_plan import fim_split_plan

        rows = fim_split_plan(spark, sf_dir).collect()
        frac = sum(r.fim_applied for r in rows) / len(rows)
        assert 0.35 < frac < 0.65
        again = {r.doc_id: r for r in fim_split_plan(spark, sf_dir).collect()}
        for r in rows:
            assert again[r.doc_id] == r


class TestKAnonymityReport:
    def test_class_verdicts(self, spark, sf_dir):
        from jitsu_spark.operators.events_ops import (
            K_ANON,
            k_anonymity_report,
        )

        rows = k_anonymity_report(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.n_rows >= r.n_users >= 1
            assert r.anonymous == (r.n_users >= K_ANON)

    def test_classes_cover_all_events(self, spark, sf_dir):
        from jitsu_spark.operators.events_ops import k_anonymity_report
        from jitsu_spark.tables import load_table

        total = load_table(spark, sf_dir, "events").count()
        rows = k_anonymity_report(spark, sf_dir).collect()
        assert sum(r.n_rows for r in rows) == total


class TestKeySkewReport:
    def test_top_keys_and_salt(self, spark, sf_dir):
        from jitsu_spark.operators.events_ops import (
            SKEW_TOP_K,
            key_skew_report,
        )

        rows = key_skew_report(spark, sf_dir).collect()
        assert 1 <= len(rows) <= SKEW_TOP_K
        cnts = [r.cnt for r in rows]
        assert cnts == sorted(cnts, reverse=True)
        for r in rows:
            assert r.salt_n >= 1
            assert 0 <= r.share_pm <= 1000

    def test_skewed_key_flagged(self, spark, tmp_path):
        # one user owns half the table -> it tops the report and the salt
        # recommendation exceeds 1.
        from jitsu_spark.operators.events_ops import key_skew_report

        ev = spark.range(1000).selectExpr(
            "id AS event_id",
            "timestamp'2025-01-01 00:00:00' AS ts",
            "CASE WHEN id % 2 = 0 THEN 7L ELSE id + 1000000 END AS user_id",
            "'click' AS event_type",
            "1.0 AS value",
            "'{}' AS props",
        )
        ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        rows = key_skew_report(spark, str(tmp_path)).collect()
        assert rows[0].key == 7 and rows[0].share_pm == 500
        assert rows[0].salt_n > 1


class TestSnapshotDriftPsi:
    def test_dimensions_and_shares(self, spark, sf_dir):
        from jitsu_spark.operators.corpus import snapshot_drift_psi

        rows = snapshot_drift_psi(spark, sf_dir).collect()
        dims = {r.dim for r in rows}
        assert dims == {"source", "length"}
        for d in dims:
            sub = [r for r in rows if r.dim == d]
            # smoothed per-myriad shares: floors under-count by < 1 each
            for col in ("p_old_pmy", "p_new_pmy"):
                total = sum(getattr(r, col) for r in sub)
                assert 10000 - len(sub) <= total <= 10000
                assert all(getattr(r, col) >= 1 for r in sub)

    def test_identical_halves_zero_psi(self, spark, tmp_path):
        # Same composition in both halves -> every term is 0. Build doc
        # ids so md5-bucket halves get identical source/length profiles:
        # generate many docs per (source, text) pair and rely on the law
        # of large numbers NOT being needed — each pair contributes to
        # both halves, and equal PER-SHARE quantization keeps terms 0
        # only when counts match exactly, so instead assert |psi| small.
        from jitsu_spark.operators.corpus import snapshot_drift_psi

        rows = [
            (i, "w " * 8, f"s{i % 2}") for i in range(400)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = snapshot_drift_psi(spark, str(tmp_path)).collect()
        assert sum(abs(r.psi_term) for r in out) < 0.02

    def test_disjoint_sources_large_psi(self, spark, tmp_path):
        # Make the two md5 halves draw from disjoint sources: label each
        # doc's source by its own half, so the source mix flips entirely.
        from jitsu_spark.operators.corpus import (
            DRIFT_SPLIT_AT,
            snapshot_drift_psi,
        )
        from jitsu_spark.operators.sampling import _bucket

        import pyspark.sql.functions as F

        base = spark.range(400).selectExpr(
            "id AS doc_id", "'w x y z' AS text"
        )
        docs = base.withColumn(
            "source",
            F.when(_bucket(F.col("doc_id")) < DRIFT_SPLIT_AT, "legacy")
            .otherwise("fresh"),
        )
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = [
            r for r in snapshot_drift_psi(spark, str(tmp_path)).collect()
            if r.dim == "source"
        ]
        assert sum(r.psi_term for r in out) > 1.0


@pytest.mark.usefixtures("spark")
class TestRegistryWiring:
    def test_entries_registered_with_oracles(self):
        from jitsu_spark.registry import ORACLES, QUERIES

        for k in (
            "curriculum_order",
            "span_corruption_plan",
            "domain_mixture_weights",
            "epoch_repeat_plan",
            "fim_split_plan",
            "k_anonymity_report",
            "snapshot_drift_psi",
        ):
            assert k in QUERIES and k in ORACLES


class TestDriftOnRollup:
    def _rollup(self, spark, rows):
        return spark.createDataFrame(
            rows, "period string, status string, events long"
        )

    def test_matching_mix_not_drifted(self, spark):
        from jitsu_spark.streaming.metrics import drift_on_rollup

        base = spark.createDataFrame(
            [("track", 500), ("page", 500)], "status string, cnt long"
        )
        cur = self._rollup(
            spark, [("p1", "track", 50), ("p1", "page", 50)]
        )
        out = drift_on_rollup(cur, base).collect()
        assert len(out) == 1
        assert not out[0].drifted and abs(out[0].psi) < 0.01

    def test_flipped_mix_drifted_and_vanished_bucket_counts(self, spark):
        from jitsu_spark.streaming.metrics import drift_on_rollup

        base = spark.createDataFrame(
            [("track", 900), ("page", 100)], "status string, cnt long"
        )
        cur = self._rollup(
            spark,
            [
                ("p1", "page", 100),        # track VANISHED in p1
                ("p2", "track", 90), ("p2", "page", 10),  # matches baseline
            ],
        )
        out = {r.period: r for r in drift_on_rollup(cur, base).collect()}
        assert out["p1"].drifted and out["p1"].psi > 1.0
        assert not out["p2"].drifted

    def test_novel_bucket_in_live_traffic(self, spark):
        # a bucket absent from the baseline still enters via the full
        # outer join and contributes positive drift
        from jitsu_spark.streaming.metrics import drift_on_rollup

        base = spark.createDataFrame(
            [("track", 1000)], "status string, cnt long"
        )
        cur = self._rollup(
            spark, [("p1", "track", 50), ("p1", "unseen", 50)]
        )
        out = drift_on_rollup(cur, base).collect()
        assert out[0].drifted

    def test_streaming_foreachbatch_e2e(self, spark, tmp_path):
        import json
        import os

        from jitsu_spark.streaming.metrics import (
            drift_on_rollup,
            metrics_rollup_stream,
        )
        from jitsu_spark.streaming.source import file_event_stream

        src = str(tmp_path / "in")
        os.makedirs(src)
        events = [
            {"message_id": f"m{i}", "type": "page",
             "timestamp": "2024-01-01T00:00:10Z"}
            for i in range(20)
        ]
        with open(f"{src}/b1.json", "w") as f:
            f.write("\n".join(json.dumps(e) for e in events))
        base = spark.createDataFrame(
            [("track", 900), ("page", 100)], "status string, cnt long"
        )
        got = []

        def sink(batch_df, _bid):
            got.extend(drift_on_rollup(batch_df, base).collect())

        stream = file_event_stream(spark, src).withColumnRenamed(
            "type", "status"
        )
        q = (
            metrics_rollup_stream(stream, status_col="status")
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert got and all(r.drifted for r in got)


class TestDriftDegeneracyClamp:
    """Review regression: past ~10k rows per side the un-clamped floor
    division quantized an absent bucket's share to 0 and ln() dropped
    exactly the maximum-drift terms (NULL in Spark, inf in DuckDB)."""

    def test_vanished_source_still_drifts_at_scale(self, spark, tmp_path):
        from jitsu_spark.operators.corpus import (
            DRIFT_SPLIT_AT,
            snapshot_drift_psi,
        )
        from jitsu_spark.operators.sampling import _bucket

        import pyspark.sql.functions as F

        docs = (
            spark.range(30000)
            .selectExpr("id AS doc_id", "'w x y z' AS text")
            .withColumn(
                "source",
                F.when(_bucket(F.col("doc_id")) < DRIFT_SPLIT_AT, "legacy")
                .otherwise("fresh"),
            )
        )
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        rows = [
            r for r in snapshot_drift_psi(spark, str(tmp_path)).collect()
            if r.dim == "source"
        ]
        assert all(r.psi_term is not None for r in rows)
        assert all(r.p_old_pmy >= 1 and r.p_new_pmy >= 1 for r in rows)
        assert sum(r.psi_term for r in rows) > 1.0

    def test_streaming_vanished_bucket_alerts_at_volume(self, spark):
        from jitsu_spark.streaming.metrics import drift_on_rollup

        base = spark.createDataFrame(
            [("track", 900000), ("page", 100000)], "status string, cnt long"
        )
        cur = spark.createDataFrame(
            [("p1", "page", 1000000)], "period string, status string, events long"
        )
        out = drift_on_rollup(cur, base).collect()
        assert out[0].psi is not None and out[0].drifted


class TestBm25HardNegatives:
    def test_negatives_are_partial_matches(self, spark, sf_dir):
        from jitsu_spark.operators.text_ops import (
            BM25_QUERIES,
            bm25_hard_negatives,
        )

        n_terms = {qid: len(set(q)) for qid, q in BM25_QUERIES.items()}
        for r in bm25_hard_negatives(spark, sf_dir).collect():
            assert 1 <= r.n_matched < n_terms[r.query_id]
            assert r.rank >= 1

    def test_full_matches_excluded_vs_topk(self, spark, sf_dir):
        # scores must agree with bm25_topk on every overlapping (query,
        # doc) pair — one scoring implementation. (The exclusion property
        # itself — negatives are never full matches — is asserted by
        # test_negatives_are_partial_matches via the n_matched bound.)
        from jitsu_spark.operators.text_ops import (
            bm25_hard_negatives,
            bm25_topk,
        )

        top = {
            (r.query_id, r.doc_id): r.score
            for r in bm25_topk(spark, sf_dir).collect()
        }
        for r in bm25_hard_negatives(spark, sf_dir).collect():
            if (r.query_id, r.doc_id) in top:
                assert top[(r.query_id, r.doc_id)] == r.score

    def test_synthetic_full_match_never_negative(self, spark, tmp_path):
        from jitsu_spark.operators.text_ops import bm25_hard_negatives_df

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma pad pad"),   # full match
                (2, "alpha beta zzz pad pad"),     # partial -> negative
                (3, "alpha yyy zzz pad pad"),      # partial -> negative
                (4, "www yyy zzz pad pad"),        # no match -> absent
            ],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(0, "alpha beta gamma")], "query_id int, text string"
        )
        got = {r.doc_id: r for r in bm25_hard_negatives_df(docs, queries).collect()}
        assert set(got) == {2, 3}
        assert got[2].n_matched == 2 and got[3].n_matched == 1


class TestBehaviorSequenceExamples:
    def test_lags_match_per_user_order(self, spark, sf_dir):
        from collections import defaultdict

        from jitsu_spark.operators.events_ops import (
            behavior_sequence_examples,
        )
        from jitsu_spark.tables import load_table

        ev = load_table(spark, sf_dir, "events").collect()
        seq = defaultdict(list)
        for e in sorted(ev, key=lambda e: (e.user_id, e.ts, e.event_id)):
            seq[e.user_id].append(e.event_type)
        out = behavior_sequence_examples(spark, sf_dir).collect()
        # first event per user never emits an example
        n_expected = sum(max(0, len(s) - 1) for s in seq.values())
        assert len(out) == n_expected
        by_user = defaultdict(list)
        for r in sorted(out, key=lambda r: (r.user_id, r.n_prior)):
            by_user[r.user_id].append(r)
        for uid, rows in by_user.items():
            s = seq[uid]
            for r in rows:
                i = r.n_prior
                assert r.label == s[i] and r.prev1 == s[i - 1]
                if i >= 2:
                    assert r.prev2 == s[i - 2]
                else:
                    assert r.prev2 is None


class TestMultiEpochOrderManifest:
    def test_manifest_consistent_with_schedule(self, spark, sf_dir):
        from collections import Counter

        from jitsu_spark.operators.training_plan import (
            epoch_repeat_plan,
            multi_epoch_order_manifest,
        )
        from jitsu_spark.tables import load_table

        sched = {
            r.source: r.epochs_pm
            for r in epoch_repeat_plan(spark, sf_dir).collect()
        }
        src_of = {
            r.doc_id: r.source
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "source").collect()
        }
        rows = multi_epoch_order_manifest(spark, sf_dir).collect()
        # positions are a permutation and epochs ascend along it
        n = len(rows)
        assert sorted(r.pos for r in rows) == list(range(n))
        ordered = sorted(rows, key=lambda r: r.pos)
        epochs = [r.epoch for r in ordered]
        assert epochs == sorted(epochs)
        # per-doc copy counts: full epochs always, fraction sometimes
        copies = Counter(r.doc_id for r in rows)
        per_source = Counter()
        per_source_docs = Counter()
        for doc_id, c in copies.items():
            full, frac = divmod(sched[src_of[doc_id]], 1000)
            assert c in (full, full + 1)
            if frac == 0:
                assert c == full
            per_source[src_of[doc_id]] += c
            per_source_docs[src_of[doc_id]] += 1
        # fractional admission rate tracks frac_pm loosely
        for s, tot in per_source.items():
            full, frac = divmod(sched[s], 1000)
            nd = per_source_docs[s]
            expected = nd * full + nd * frac / 1000
            assert abs(tot - expected) <= max(5, 0.25 * nd)


class TestZorderLocalityReport:
    def test_zorder_beats_natural_on_source_locality(self, spark, sf_dir):
        from jitsu_spark.operators.corpus import zorder_locality_report
        from jitsu_spark.tables import load_table

        rows = zorder_locality_report(spark, sf_dir).collect()
        total = load_table(spark, sf_dir, "documents").count()
        by_layout = {}
        for r in rows:
            by_layout.setdefault(r.layout, []).append(r)
        assert set(by_layout) == {"zorder", "natural"}
        for layout, files in by_layout.items():
            assert sum(f.n_docs for f in files) == total
        # z-order files should each touch far fewer distinct sources
        # (docs arrive source-interleaved in doc_id order, so natural
        # range files see nearly every source)
        avg = {
            lay: sum(f.n_sources * f.n_docs for f in fs)
            / sum(f.n_docs for f in fs)
            for lay, fs in by_layout.items()
        }
        assert avg["zorder"] < avg["natural"]

    def test_morton_key_bit_exact(self):
        # pure-python mirror of the generated interleave expression
        from jitsu_spark.operators.corpus import _morton16

        expr = _morton16("a", "b", ">>", "&")

        def z(a, b):
            return eval(expr)

        assert z(0, 0) == 0
        assert z(1, 0) == 2 and z(0, 1) == 1
        assert z(0b11, 0b11) == 0b1111
        assert z(255, 0) == 0b1010101010101010


class TestJoinSizeEstimate:
    def test_exact_self_join_cardinality(self, spark, sf_dir):
        from jitsu_spark.operators.events_ops import join_size_estimate
        from jitsu_spark.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        got = {r.join_key: r for r in join_size_estimate(spark, sf_dir).collect()}
        for key in ("user_id", "event_type"):
            actual = ev.selectExpr(f"CAST({key} AS STRING) AS k").alias("a").join(
                ev.selectExpr(f"CAST({key} AS STRING) AS k").alias("b"), "k"
            ).count()
            assert got[key].est_self_join_rows == actual
            assert got[key].n_rows == ev.count()
            assert 1 <= got[key].skew_share_pm <= 1000


class TestAbTestReport:
    def test_contingency_consistent(self, spark, sf_dir):
        from jitsu_spark.operators.events_ops import ab_test_report
        from jitsu_spark.tables import load_table

        r = ab_test_report(spark, sf_dir).collect()[0]
        n_users = load_table(spark, sf_dir, "events").select(
            "user_id"
        ).distinct().count()
        assert r.conv_a + r.nonconv_a + r.conv_b + r.nonconv_b == n_users
        assert r.chi2 >= 0.0
        assert r.significant == (r.chi2 > 3.841)
        # the threshold criterion must actually discriminate on this corpus
        assert min(r.conv_a + r.conv_b, r.nonconv_a + r.nonconv_b) > 0

    def test_engineered_effect_detected(self, spark, tmp_path):
        # users 0..199; md5 variant split; give variant-A users 20
        # purchases and variant-B users 5 -> rates 100% vs 0%, chi2 huge
        from jitsu_spark.operators.events_ops import ab_test_report

        rows = []
        eid = 0
        import hashlib

        for uid in range(200):
            bucket = int(hashlib.md5(str(uid).encode()).hexdigest()[:7], 16) % 1000
            n = 20 if bucket < 500 else 5
            for _ in range(n):
                rows.append((eid, uid))
                eid += 1
        df = spark.createDataFrame(rows, "event_id long, user_id long").selectExpr(
            "event_id",
            "timestamp'2025-01-01 00:00:00' AS ts",
            "user_id",
            "'purchase' AS event_type",
            "1.0 AS value",
            "'{}' AS props",
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        r = ab_test_report(spark, str(tmp_path)).collect()[0]
        assert r.conv_rate_a_pm == 1000 and r.conv_rate_b_pm == 0
        assert r.significant and r.chi2 > 100

    def test_degenerate_margin_zero_chi2(self, spark, tmp_path):
        # nobody converts -> a + c = 0 margin -> chi2 defined as 0
        from jitsu_spark.operators.events_ops import ab_test_report

        df = spark.range(100).selectExpr(
            "id AS event_id",
            "timestamp'2025-01-01 00:00:00' AS ts",
            "id AS user_id",
            "'view' AS event_type",
            "1.0 AS value",
            "'{}' AS props",
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        r = ab_test_report(spark, str(tmp_path)).collect()[0]
        assert r.chi2 == 0.0 and not r.significant


class TestQualityCalibrationReport:
    def test_bins_cover_corpus_and_rates_consistent(self, spark, sf_dir):
        from jitsu_spark.operators.quality_model import (
            quality_calibration_report,
        )
        from jitsu_spark.tables import load_table

        rows = quality_calibration_report(spark, sf_dir).collect()
        total = load_table(spark, sf_dir, "documents").count()
        assert sum(r.n_docs for r in rows) == total
        for r in rows:
            assert 0 <= r.prob_decile <= 9
            assert 0 <= r.n_keep <= r.n_docs
            assert r.keep_rate_pm == (r.n_keep * 1000) // r.n_docs
