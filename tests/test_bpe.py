"""Trained-BPE token counting (`jitsu_spark/operators/bpe.py`): the
expression chain is real BPE (hand-checked segmentations), and the
mapInPandas GPT-2 encoder — the big-merges-table scale path — is pinned
equal to it on the fixture."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _counts(df):
    return {r.doc_id: r.n_tokens for r in df.collect()}


class TestChainSegmentation:
    def test_hand_checked_counts(self, spark):
        from jitsu_spark.operators.bpe import (
            FIXTURE_MERGES,
            bpe_token_count_expr,
        )

        docs = spark.createDataFrame(
            [
                # "the" -> t+h=th, th+e=the -> 1 token
                (1, "the"),
                # "than": t+h=th; (th,a) unranked; a+n=an -> th,an = 2
                (2, "than"),
                # "and" -> a+n=an, an+d=and -> 1
                (3, "and"),
                # "xyz" -> no merges apply -> 3
                (4, "xyz"),
                # two words never merge across the boundary
                (5, "the and"),
                # repeated pair, leftmost-first: "thth" -> th,th -> 2
                (6, "thth"),
                # empty-ish: punctuation only, no rules -> 1 char = 1
                (7, "!"),
            ],
            "doc_id long, text string",
        )
        got = _counts(bpe_token_count_expr(docs, FIXTURE_MERGES))
        assert got == {1: 1, 2: 2, 3: 1, 4: 3, 5: 2, 6: 2, 7: 1}

    def test_rank_order_beats_text_order(self, spark):
        """'then': (th,e) rank 1 wins over (e,n) rank 7 -> the+n = 2, not
        th+en."""
        from jitsu_spark.operators.bpe import (
            FIXTURE_MERGES,
            bpe_token_count_expr,
            bpe_symbol_chain,
        )
        from pyspark.sql import functions as F

        docs = spark.createDataFrame([(1, "then")], "doc_id long, text string")
        sym = docs.select(
            bpe_symbol_chain(F.col("text"), FIXTURE_MERGES).alias("s")
        ).first()["s"]
        assert sym == "\x1fthe\x1fn\x1f"
        assert _counts(bpe_token_count_expr(docs, FIXTURE_MERGES)) == {1: 2}

    def test_consecutive_occurrences_merge_fully(self, spark):
        """The two-pass replace must merge ALL adjacent distinct-pair
        occurrences ('abab...' -> ab x n)."""
        from jitsu_spark.operators.bpe import (
            bpe_token_count_expr,
            bpe_token_count_pandas,
        )

        merges = [(0, "a", "b")]
        rows = [(1, "abababab"), (2, "ababab"), (3, "ab ab"), (4, "xabay")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        want = {1: 4, 2: 3, 3: 2, 4: 4}  # x,ab,a,y: the lone a stays
        assert _counts(bpe_token_count_expr(docs, merges)) == want
        mdf = spark.createDataFrame(merges, "rank int, left string, right string")
        assert _counts(bpe_token_count_pandas(docs, mdf)) == want

    def test_same_symbol_rules_refused_by_chain_only(self, spark):
        """Same-symbol rules make pair occurrences overlap (runs): the
        chain form REFUSES them (it would mis-pair 'aaaaaa' as
        aa,a,aa,a) while the GPT-2 pandas encoder pairs leftmost-greedy."""
        import pytest

        from jitsu_spark.operators.bpe import (
            bpe_token_count_expr,
            bpe_token_count_pandas,
        )

        merges = [(0, "c", "c")]
        docs = spark.createDataFrame(
            [(1, "ccc"), (2, "cccc"), (3, "cccccc")],
            "doc_id long, text string",
        )
        with pytest.raises(ValueError, match="identical operands"):
            bpe_token_count_expr(docs, merges)
        mdf = spark.createDataFrame(merges, "rank int, left string, right string")
        # leftmost-greedy run pairing: ceil(k/2)
        assert _counts(bpe_token_count_pandas(docs, mdf)) == {1: 2, 2: 2, 3: 3}

    def test_pandas_matches_chain_on_ascii_vs_unicode_whitespace(self, spark):
        """Both forms treat ONLY ASCII whitespace as word boundaries — a
        NBSP is a symbol character in both (scraped-web-text parity)."""
        from jitsu_spark.operators.bpe import (
            bpe_token_count_expr,
            bpe_token_count_pandas,
            merges_fixture_df,
            FIXTURE_MERGES,
        )

        docs = spark.createDataFrame(
            [(1, "the\u00a0cat"), (2, " the  cat ")],
            "doc_id long, text string",
        )
        chain = _counts(bpe_token_count_expr(docs, FIXTURE_MERGES))
        pandas = _counts(bpe_token_count_pandas(docs, merges_fixture_df(spark)))
        assert chain == pandas



class TestPandasTwinParity:
    def test_pandas_encoder_equals_chain_on_fixture(self, spark):
        from jitsu_spark.operators.bpe import (
            FIXTURE_MERGES,
            bpe_token_count_expr,
            bpe_token_count_pandas,
            merges_fixture_df,
        )
        from jitsu_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        chain = _counts(bpe_token_count_expr(docs, FIXTURE_MERGES))
        pandas = _counts(
            bpe_token_count_pandas(docs, merges_fixture_df(spark))
        )
        assert chain == pandas and len(chain) == docs.count()

    def test_pandas_encoder_lowest_rank_first(self, spark):
        """A merges table where text order and rank order disagree: the
        encoder must pick by rank (GPT-2 loop), matching the chain."""
        from jitsu_spark.operators.bpe import (
            bpe_token_count_expr,
            bpe_token_count_pandas,
        )

        merges = [(0, "b", "c"), (1, "a", "b")]
        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        merges_df = spark.createDataFrame(
            merges, "rank int, left string, right string"
        )
        # (b,c) rank 0 merges first: a + bc = 2 tokens (text-order would
        # give ab + c = 2 as well — distinguish via the segmentation)
        assert _counts(bpe_token_count_expr(docs, merges)) == {1: 2}
        assert _counts(bpe_token_count_pandas(docs, merges_df)) == {1: 2}
        # now make the outcomes differ: (a,b) then (ab,c) vs (b,c) first
        merges2 = [(0, "b", "c"), (1, "a", "bc")]
        m2df = spark.createDataFrame(
            merges2, "rank int, left string, right string"
        )
        assert _counts(bpe_token_count_expr(docs, merges2)) == {1: 1}
        assert _counts(bpe_token_count_pandas(docs, m2df)) == {1: 1}

    def test_duplicate_pair_table_canonicalizes_on_both_paths(self, spark):
        """The r6 falsifying table — a pair repeated at several ranks.
        Both paths canonicalize min-rank-wins, so chain == encoder ==
        the GPT-2 count under the canonical table: rank-0 (b,a) merges
        first, so 'abab' segments a|ba|b = 3 tokens (the old last-rank-
        wins dict picked (a,b) first and got 2)."""
        merges = [
            (0, "b", "a"),
            (1, "a", "b"),
            (2, "a", "b"),
            (3, "a", "b"),
            (4, "b", "a"),
        ]
        from jitsu_spark.operators.bpe import (
            bpe_token_count_expr,
            bpe_token_count_pandas,
            canonicalize_merges,
        )

        assert canonicalize_merges(merges) == [(0, "b", "a"), (1, "a", "b")]
        docs = spark.createDataFrame(
            [(1, "abab"), (2, "ba ab")], "doc_id long, text string"
        )
        merges_df = spark.createDataFrame(
            merges, "rank int, left string, right string"
        )
        chain = _counts(bpe_token_count_expr(docs, merges))
        pandas = _counts(bpe_token_count_pandas(docs, merges_df))
        assert chain == pandas == {1: 3, 2: 2}


class TestGpt2Mode:
    """Spark-side contracts of pre_tokenizer='gpt2' (r6 review item 4):
    the Java and Python splitters agree, the empty-table count equals
    the UTF-8 byte length, and train->count composes. The registry
    entries keep the default whitespace regime (oracle unchanged)."""

    PARITY_TEXTS = [
        "the cat sat",
        "don't can't we'll i'm you've he's they'd",
        "hello,world!  spaced\tout\nlines",
        "digits 123 mix3d up 4ever",
        "snake_case and __dunder__ plus-hyphen",
        "àccénts öäü ßharp çedilla",
        "日本語のテキスト and 中文",
        "emoji 🙂 and symbols €±§",
        "nbsp inside and trailing space ",
        "'quoted' \"double\" (paren) [brack]",
    ]

    def test_java_and_python_splitters_agree(self, spark):
        from jitsu_spark.operators.bpe import (
            GPT2_PRETOKEN_PATTERN,
            gpt2_pre_tokenize,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.PARITY_TEXTS)],
            "doc_id long, text string",
        )
        rows = df.select(
            "doc_id",
            F.regexp_extract_all(
                "text", F.lit("(?U)" + GPT2_PRETOKEN_PATTERN), F.lit(0)
            ).alias("toks"),
        ).collect()
        got = {r["doc_id"]: list(r["toks"]) for r in rows}
        want = {
            i: gpt2_pre_tokenize(t) for i, t in enumerate(self.PARITY_TEXTS)
        }
        assert got == want

    def test_empty_table_counts_utf8_bytes(self, spark):
        from jitsu_spark.operators.bpe import bpe_token_count_pandas

        texts = self.PARITY_TEXTS
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        empty = spark.createDataFrame(
            [], "rank int, left string, right string"
        )
        got = _counts(bpe_token_count_pandas(docs, empty, pre_tokenizer="gpt2"))
        assert got == {
            i: len(t.encode("utf-8")) for i, t in enumerate(texts)
        }

    def test_train_count_roundtrip_reduces_tokens(self, spark, sf_dir):
        from jitsu_spark.operators.bpe import (
            bpe_token_count_pandas,
            learn_bpe_merges,
        )
        from jitsu_spark.tables import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents").limit(100)
        merges = learn_bpe_merges(docs, n_merges=24, pre_tokenizer="gpt2")
        assert merges.count() > 0
        counted = bpe_token_count_pandas(docs, merges, pre_tokenizer="gpt2")
        total = counted.agg(F.sum("n_tokens")).first()[0]
        byte_total = docs.agg(
            F.sum(F.octet_length("text"))
        ).first()[0]
        assert 0 < total < byte_total

    def test_unknown_pre_tokenizer_rejected(self, spark):
        import pytest

        from jitsu_spark.operators.bpe import (
            bpe_token_count_pandas,
            word_frequency_table,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        empty = spark.createDataFrame(
            [], "rank int, left string, right string"
        )
        with pytest.raises(ValueError, match="pre_tokenizer"):
            bpe_token_count_pandas(docs, empty, pre_tokenizer="bogus")
        with pytest.raises(ValueError, match="pre_tokenizer"):
            word_frequency_table(docs, pre_tokenizer="bogus")


def _naive_train(wc, n_merges, min_pair_freq=2):
    """Recount-from-scratch reference trainer: full pair recount every
    round, same (count desc, pair asc) argmax — the spec the incremental
    trainer must match."""
    words = [list(w) for w, _ in wc]
    freqs = [f for _, f in wc]
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms, f in zip(words, freqs):
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        eligible = {p: n for p, n in counts.items() if n >= min_pair_freq}
        if not eligible:
            break
        best = min(eligible.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        a, b = best
        for i, syms in enumerate(words):
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


class TestTrainMerges:
    def test_incremental_matches_naive_reference(self):
        from jitsu_spark.operators.bpe import _train_merges_from_counts

        wc = [
            ("the", 10), ("then", 4), ("than", 3), ("and", 6),
            ("banana", 2), ("aaaa", 5), ("mississippi", 2), ("abab", 3),
        ]
        for n in (1, 5, 12, 40):
            assert _train_merges_from_counts(wc, n) == _naive_train(wc, n)

    def test_property_incremental_equals_naive(self):
        from hypothesis import given, settings, strategies as st

        from jitsu_spark.operators.bpe import _train_merges_from_counts

        word = st.text(alphabet="abcd", min_size=1, max_size=8)
        corpus = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=12)

        @settings(max_examples=60, deadline=None)
        @given(corpus, st.integers(1, 10))
        def check(wcmap, n):
            wc = sorted(wcmap.items(), key=lambda t: (-t[1], t[0]))
            assert _train_merges_from_counts(wc, n) == _naive_train(wc, n)

        check()

    def test_exclude_same_symbol_matches_naive(self):
        """The chain-expressible trainer variant (r9: same-symbol
        candidates skipped at the argmax) equals a from-scratch recount
        with the same exclusion — and emits no left==right rule, so its
        output always passes `_check_chain_merges`."""
        from hypothesis import given, settings, strategies as st

        from jitsu_spark.operators.bpe import (
            _check_chain_merges,
            _train_merges_from_counts,
        )

        def naive_excl(wc, n_merges, min_pair_freq=2):
            words = [list(w) for w, _ in wc]
            freqs = [f for _, f in wc]
            merges = []
            for rank in range(n_merges):
                counts = {}
                for syms, f in zip(words, freqs):
                    for p in zip(syms, syms[1:]):
                        counts[p] = counts.get(p, 0) + f
                eligible = {
                    p: n
                    for p, n in counts.items()
                    if n >= min_pair_freq and p[0] != p[1]
                }
                if not eligible:
                    break
                best = min(
                    eligible.items(), key=lambda kv: (-kv[1], kv[0])
                )[0]
                merges.append((rank, best[0], best[1]))
                a, b = best
                for i, syms in enumerate(words):
                    out, j = [], 0
                    while j < len(syms):
                        if (
                            j < len(syms) - 1
                            and syms[j] == a
                            and syms[j + 1] == b
                        ):
                            out.append(a + b)
                            j += 2
                        else:
                            out.append(syms[j])
                            j += 1
                    words[i] = out
            return merges

        word = st.text(alphabet="abcd", min_size=1, max_size=8)
        corpus = st.dictionaries(
            word, st.integers(1, 9), min_size=1, max_size=12
        )

        @settings(max_examples=60, deadline=None)
        @given(corpus, st.integers(1, 10))
        def check(wcmap, n):
            wc = sorted(wcmap.items(), key=lambda t: (-t[1], t[0]))
            got = _train_merges_from_counts(
                wc, n, exclude_same_symbol=True
            )
            assert got == naive_excl(wc, n)
            _check_chain_merges(got)  # never raises

        check()

    def test_min_pair_freq_floor(self):
        """Every word unique -> all pair counts 1 -> nothing merges at the
        default floor of 2; floor 1 merges greedily."""
        from jitsu_spark.operators.bpe import _train_merges_from_counts

        wc = [("xy", 1), ("zw", 1)]
        assert _train_merges_from_counts(wc, 10) == []
        got = _train_merges_from_counts(wc, 10, min_pair_freq=1)
        assert got == [(0, "x", "y"), (1, "z", "w")]

    def test_learned_table_contract_and_determinism(self, spark):
        """The registry entry returns the (rank,left,right) contract,
        invariant under input repartitioning, and drives the pandas
        encoder to real compression on the corpus it was trained on."""
        from jitsu_spark.operators.bpe import (
            bpe_token_count_pandas,
            learn_bpe_merges,
        )
        from jitsu_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        mdf = learn_bpe_merges(docs, n_merges=24)
        rows = sorted((r["rank"], r["left"], r["right"]) for r in mdf.collect())
        assert len(rows) == 24 and [r[0] for r in rows] == list(range(24))

        rows2 = sorted(
            (r["rank"], r["left"], r["right"])
            for r in learn_bpe_merges(docs.repartition(7), n_merges=24).collect()
        )
        assert rows2 == rows

        from pyspark.sql import functions as F

        toks = (
            bpe_token_count_pandas(docs, mdf)
            .agg(F.sum("n_tokens").alias("t"))
            .first()["t"]
        )
        chars = docs.selectExpr(
            "sum(length(regexp_replace(text, '\\\\s+', ''))) AS c"
        ).first()["c"]
        assert 0 < toks < chars  # learned merges actually compress


class TestPlanShape:
    def test_chain_form_is_map_only(self, spark):
        from jitsu_spark.operators.bpe import bpe_trained_token_count

        df = bpe_trained_token_count(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # r12: the replace chain is still a pure projection — the only
        # permitted exchange is the single-split scan fan-out's
        # round-robin (guide §2.5); no key shuffle may appear.
        assert "hashpartitioning" not in plan
        assert "rangepartitioning" not in plan
        assert plan.count("RoundRobinPartitioning") <= 1
