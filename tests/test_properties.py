"""Property-based tests (hypothesis) for the pure transformation core —
the reference has only example-based tests (SURVEY §5); these pin the
invariants the layouts and chain rely on."""

from __future__ import annotations

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from jitsu_spark.events.layout_core import map_event, plural
from jitsu_spark.functions.strings import snake_case, snake_case_tree
from jitsu_spark.plans.chain import FunctionContext, run_user_chain

ident = st.text(string.ascii_letters + string.digits + " _", min_size=1, max_size=24)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**31), 2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=40),
)
json_objects = st.dictionaries(ident, json_scalars, max_size=6)


class TestSnakeCase:
    @given(ident)
    def test_idempotent(self, s):
        assert snake_case(snake_case(s)) == snake_case(s)

    @given(ident)
    def test_no_upper_no_spaces(self, s):
        out = snake_case(s)
        assert out == out.lower()
        assert " " not in out

    @given(json_objects)
    def test_tree_preserves_value_multiset(self, obj):
        from hypothesis import assume

        # keys colliding after snake_case merge last-wins (reference
        # Object.assign semantics) — the property holds for distinct keys
        assume(len({snake_case(k) for k in obj}) == len(obj))
        out = snake_case_tree(obj)
        assert sorted(map(repr, out.values())) == sorted(map(repr, obj.values()))


class TestLayouts:
    @settings(max_examples=60)
    @given(
        etype=st.sampled_from(["track", "page", "identify", "group", "screen"]),
        name=ident,
        props=json_objects,
    )
    def test_layouts_total_and_routed(self, etype, name, props):
        """Every layout maps every well-formed event to >=1 (table, row)
        with a non-empty table name; segment tracks fan out to exactly 2."""
        event = {
            "messageId": "m1",
            "type": etype,
            "event": name if etype == "track" else None,
            "properties": props,
        }
        for layout in ("segment", "segment-single-table", "jitsu-legacy", "passthrough"):
            out = map_event(dict(event), layout)
            assert len(out) >= 1
            for table, row in out:
                assert isinstance(table, str) and table
                assert isinstance(row, dict)
                json.dumps(row)  # row stays JSON-serializable
        seg = map_event(dict(event), "segment")
        if etype == "track":
            assert [t for t, _ in seg][0] == "tracks" and len(seg) == 2

    def test_plural_is_the_reference_lookup(self):
        # bulker-destination.ts:310-323: fixed table-name mapping, not an
        # English pluralizer — unknown names pass through unchanged
        assert plural("identify") == "identifies"
        assert plural("track") == "tracks"
        assert plural("custom") == "custom"

    @given(json_objects)
    def test_table_name_override_wins(self, props):
        event = {
            "messageId": "m1",
            "type": "track",
            "event": "E",
            "properties": props,
            "JITSU_TABLE_NAME": "custom_target",
        }
        for layout in ("segment", "segment-single-table", "jitsu-legacy", "passthrough"):
            out = map_event(dict(event), layout)
            assert [t for t, _ in out] == ["custom_target"], layout


class TestChainAlgebra:
    @settings(max_examples=40)
    @given(st.lists(st.sampled_from(["keep", "tag", "drop"]), max_size=4))
    def test_drop_is_absorbing(self, ops):
        """Once any function drops, the chain emits nothing."""
        fns = {
            "keep": lambda e, c: True,
            "tag": lambda e, c: {**e, "n": e.get("n", 0) + 1},
            "drop": lambda e, c: "drop",
        }
        out, err = run_user_chain(
            {"messageId": "m"}, [fns[o] for o in ops], FunctionContext()
        )
        assert err is None
        if "drop" in ops:
            assert out == []
        else:
            assert len(out) == 1
            assert out[0].get("n", 0) == ops.count("tag")


class TestQualityFilterProperties:
    """Pure-Python properties of the quality-filter building blocks (the
    Spark expressions mirror these semantics; engine parity is the oracle
    gate's job)."""

    @given(st.text(alphabet="abc @.0123456789xyz", max_size=200))
    def test_redaction_idempotent(self, text):
        """Redacting already-redacted text changes nothing."""
        import re

        from jitsu_spark.operators.quality_filters import PII_PATTERNS

        def redact(s):
            for name, pat in PII_PATTERNS.items():
                s = re.sub(pat, f"<{name}>", s)
            return s

        once = redact(text)
        assert redact(once) == once

    @given(st.integers(min_value=1, max_value=500))
    def test_chunks_cover_every_token(self, n_tokens):
        """Window starts every CHUNK_STRIDE with CHUNK_TOKENS length cover
        [0, n) with no gaps (stride <= chunk size)."""
        from jitsu_spark.operators.quality_filters import (
            CHUNK_STRIDE,
            CHUNK_TOKENS,
        )

        covered = set()
        for start in range(0, n_tokens, CHUNK_STRIDE):
            covered.update(range(start, min(start + CHUNK_TOKENS, n_tokens)))
        assert covered == set(range(n_tokens))

    @given(st.integers(min_value=0, max_value=10**12))
    def test_bucket_expression_matches_reference_md5(self, doc_id):
        """The DuckDB bucket SQL (sampling._bucket_duck — the oracle's
        side of every deterministic split) computes exactly the
        first-7-hex-digits-of-md5 mod 1000 reference function."""
        import duckdb
        import hashlib

        from jitsu_spark.operators.sampling import _bucket_duck

        expected = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) % 1000
        )
        got = duckdb.sql(f"SELECT {_bucket_duck(str(doc_id))} AS b").fetchone()[0]
        assert got == expected
        assert 0 <= got < 1000


# ---------------------------------------------------------------------------
# Trained-BPE equivalence (operators/bpe.py): the expression-chain form
# (rank-ordered two-pass string replace over a delimiter-framed string)
# must equal the GPT-2 encode loop (repeatedly merge the lowest-rank pair
# present) for EVERY text and every merges table with the creation-order
# property. These properties exercise the claim far beyond the fixtures —
# in pure Python, with the same string semantics Spark's replace() uses.
# ---------------------------------------------------------------------------

_SYM, _WB = "\x1f", "\x1e"


def _chain_count(text: str, merges) -> int:
    """Pure-python twin of bpe.bpe_symbol_chain + the token count —
    str.replace has the same left-to-right non-overlapping semantics as
    Spark/DuckDB replace()."""
    import re as _re

    from jitsu_spark.operators.bpe import canonicalize_merges

    s = _re.sub(r"\s+", _WB, text)
    s = _SYM + "".join(ch + _SYM for ch in s)
    for _, left, right in canonicalize_merges(merges):
        pat = _SYM + left + _SYM + right + _SYM
        rep = _SYM + left + right + _SYM
        for _ in range(2):  # the two-pass replace-all claim under test
            s = s.replace(pat, rep)
    return s.count(_SYM) - s.count(_WB) - 1


def _gpt2_count(text: str, merges) -> int:
    from jitsu_spark.operators.bpe import canonicalize_merges

    ranks = {(l, r): rank for rank, l, r in canonicalize_merges(merges)}

    def word(w):
        syms = tuple(w)
        while len(syms) > 1:
            present = {
                (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
            } & ranks.keys()
            if not present:
                break
            a, b = min(present, key=ranks.__getitem__)
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
        return len(syms)

    return sum(word(w) for w in text.split())


@st.composite
def _valid_merges(draw):
    """Random merges table with the creation-order property: each rule's
    operands are single chars or products of strictly earlier rules.
    left != right per rule — the chain form's enforced contract (same-
    symbol rules overlap on runs and are refused; see
    tests/test_bpe.py::test_same_symbol_rules_refused_by_chain_only)."""
    alphabet = ["a", "b", "c", "d"]
    n = draw(st.integers(0, 8))
    symbols = list(alphabet)
    merges = []
    used: set[tuple[str, str]] = set()
    for rank in range(n):
        # unique pairs only: a trained table can never repeat a pair
        # (merging zeroes its adjacency count and merges only concatenate)
        # — duplicate tables are canonicalized, covered by
        # TestDuplicatePairCanonicalization below.
        candidates = [
            (a, b)
            for a in symbols
            for b in symbols
            if a != b and (a, b) not in used
        ]
        if not candidates:
            break
        left, right = draw(st.sampled_from(candidates))
        used.add((left, right))
        merges.append((rank, left, right))
        symbols.append(left + right)
    return merges


class TestBpeChainEquivalence:
    @given(
        st.text(alphabet="abcd ", max_size=40),
        _valid_merges(),
    )
    @settings(max_examples=300, deadline=None)
    def test_two_pass_chain_equals_gpt2_loop(self, text, merges):
        assert _chain_count(text, merges) == _gpt2_count(text, merges)

    @given(st.text(alphabet="abcd ", max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_no_merges_counts_characters(self, text):
        expect = sum(len(w) for w in text.split())
        assert _chain_count(text, []) == expect == _gpt2_count(text, [])


class TestGpt2PreTokenizer:
    """Pure-python properties of the GPT-2 pre-tokenization regime
    (r6 review item 4): losslessness, whitespace-domain agreement with
    the default splitter, and the byte alphabet's bijection."""

    @given(st.text(max_size=120))
    @settings(max_examples=300, deadline=None)
    def test_pre_tokens_reconstruct_text(self, text):
        from jitsu_spark.operators.bpe import gpt2_pre_tokenize

        assert "".join(gpt2_pre_tokenize(text)) == text

    @given(
        st.lists(
            st.text(alphabet="abcdefgh", min_size=1, max_size=8),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_agrees_with_whitespace_split_on_plain_words(self, words):
        """On single-space-separated ascii-letter text the gpt2 regex
        degenerates to whitespace splitting (modulo the leading space
        each non-initial word keeps)."""
        from jitsu_spark.operators.bpe import gpt2_pre_tokenize

        text = " ".join(words)
        toks = gpt2_pre_tokenize(text)
        assert [t.lstrip(" ") for t in toks] == text.split()
        # and every non-initial pre-token carries its leading space
        assert all(t.startswith(" ") for t in toks[1:])

    def test_bytes_to_unicode_is_a_bijection(self):
        from jitsu_spark.operators.bpe import bytes_to_unicode

        b2u = bytes_to_unicode()
        assert sorted(b2u) == list(range(256))
        assert len(set(b2u.values())) == 256
        assert all(len(c) == 1 for c in b2u.values())

    @given(st.text(max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_byte_level_words_cover_exactly_the_utf8_bytes(self, text):
        """Losslessness + bijection compose: the byte-level pre-token
        symbols of any text count exactly its UTF-8 bytes — the
        no-unknown-tokens property byte-level BPE exists for."""
        from jitsu_spark.operators.bpe import (
            _byte_level_word,
            bytes_to_unicode,
            gpt2_pre_tokenize,
        )

        b2u = bytes_to_unicode()
        total = sum(
            len(_byte_level_word(w, b2u)) for w in gpt2_pre_tokenize(text)
        )
        assert total == len(text.encode("utf-8"))


class TestDuplicatePairCanonicalization:
    """A user-supplied table CAN repeat a pair at several ranks (trained
    tables never do). Both encode paths canonicalize min-rank-wins, so
    the pinned-equal contract holds on malformed input too — the r6
    falsifying example is pinned here."""

    # hypothesis' recorded counterexample from round 6: the chain resolved
    # the duplicates first-rank-wins while the encoder dict let rank 4 win.
    R6_EXAMPLE = [
        (0, "b", "a"),
        (1, "a", "b"),
        (2, "a", "b"),
        (3, "a", "b"),
        (4, "b", "a"),
    ]

    def test_canonicalize_keeps_min_rank(self):
        from jitsu_spark.operators.bpe import canonicalize_merges

        assert canonicalize_merges(self.R6_EXAMPLE) == [
            (0, "b", "a"),
            (1, "a", "b"),
        ]
        # idempotent, and a no-op on an already-unique table
        assert canonicalize_merges(
            canonicalize_merges(self.R6_EXAMPLE)
        ) == canonicalize_merges(self.R6_EXAMPLE)

    def test_r6_falsifying_example_now_agrees(self):
        # canonical table merges (b,a) first: a|ba|b = 3 tokens (the old
        # last-rank-wins dict picked (a,b) first and got 2 — the bug)
        assert (
            _chain_count("abab", self.R6_EXAMPLE)
            == _gpt2_count("abab", self.R6_EXAMPLE)
            == 3
        )

    @given(
        st.text(alphabet="abcd ", max_size=40),
        _valid_merges(),
        st.data(),
    )
    @settings(max_examples=100, deadline=None)
    def test_duplicated_rules_never_change_the_count(self, text, merges, data):
        """Re-appending existing rules at later ranks is a no-op under
        canonicalization, on both paths."""
        if not merges:
            return
        dup = list(merges)
        extra = data.draw(
            st.lists(st.sampled_from(merges), min_size=1, max_size=4)
        )
        base_rank = max(r for r, _, _ in merges) + 1
        for i, (_, left, right) in enumerate(extra):
            dup.append((base_rank + i, left, right))
        assert _chain_count(text, dup) == _chain_count(text, merges)
        assert _gpt2_count(text, dup) == _gpt2_count(text, merges)


class TestTwoPhaseTopkEquivalence:
    """plans/topk.two_phase_topk returns EXACTLY the naive
    row_number-over-window result for any scored table — the invariant
    that lets a plain-window SQL oracle stand in as its correctness twin
    while the physical plan never sorts a full group."""

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # group
                st.integers(min_value=-5, max_value=5),  # score (dense ties)
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(min_value=1, max_value=7),  # k
        st.booleans(),  # descending
    )
    def test_matches_naive_window(self, rows, k, descending):
        import pandas as pd

        from jitsu_spark.plans.topk import two_phase_topk
        from jitsu_spark.session import get_spark

        spark = get_spark("jitsu-spark-tests", cpus=4, shuffle_partitions=8)
        scored = spark.createDataFrame(
            [(g, s, i) for i, (g, s) in enumerate(rows)],
            "grp int, score int, tid int",
        )
        got = (
            two_phase_topk(scored, "grp", "score", k, "tid", descending)
            .toPandas()
            .sort_values(["grp", "rank"])
            .reset_index(drop=True)
        )
        direction = "DESC" if descending else "ASC"
        want = (
            scored.selectExpr(
                "grp",
                "score",
                "tid",
                f"row_number() OVER (PARTITION BY grp"
                f" ORDER BY score {direction}, tid) AS rank",
            )
            .where(f"rank <= {k}")
            .toPandas()
            .sort_values(["grp", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["grp", "score", "tid", "rank"]],
            want[["grp", "score", "tid", "rank"]],
        )


class TestSaltedTopkEquivalence:
    """plans/topk.salted_topk returns EXACTLY the naive
    row_number-over-window result for any scored table — the float-score
    sibling of the two_phase invariant: a global top-k row has < k
    better-ordered rows in its whole group, hence < k in its salt slice,
    so level 1 can never drop it."""

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # group
                st.floats(
                    min_value=-5, max_value=5, allow_nan=False
                ),  # float scores (the salted shape's target domain)
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(min_value=1, max_value=7),  # k
        st.booleans(),  # descending
        st.integers(min_value=1, max_value=8),  # n_salts incl. degenerate 1
    )
    def test_matches_naive_window(self, rows, k, descending, n_salts):
        import pandas as pd

        from jitsu_spark.plans.topk import salted_topk
        from jitsu_spark.session import get_spark

        spark = get_spark("jitsu-spark-tests", cpus=4, shuffle_partitions=8)
        scored = spark.createDataFrame(
            [(g, s, i) for i, (g, s) in enumerate(rows)],
            "grp int, score double, tid int",
        )
        got = (
            salted_topk(
                scored, "grp", "score", k, "tid", descending, n_salts=n_salts
            )
            .toPandas()
            .sort_values(["grp", "rank"])
            .reset_index(drop=True)
        )
        direction = "DESC" if descending else "ASC"
        want = (
            scored.selectExpr(
                "grp",
                "score",
                "tid",
                f"row_number() OVER (PARTITION BY grp"
                f" ORDER BY score {direction}, tid) AS rank",
            )
            .where(f"rank <= {k}")
            .toPandas()
            .sort_values(["grp", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["grp", "score", "tid", "rank"]],
            want[["grp", "score", "tid", "rank"]],
        )
