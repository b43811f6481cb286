"""User-recognition scenario tests — the reference's own test story
(`libs/core-functions/__tests__/user-recognition.test.ts:9-70`): anonymous
events followed by an identified event with the same anonymousId must all
end up carrying userId and traits."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark):
    rows = [
        # 3 anonymous page events for anon1
        ("m1", "anon1", None, None, _ts("2024-01-01T00:00:01")),
        ("m2", "anon1", None, None, _ts("2024-01-01T00:00:02")),
        ("m3", "anon1", None, None, _ts("2024-01-01T00:00:03")),
        # identify event binds anon1 -> u42 with traits
        ("m4", "anon1", "u42", {"email": "x@y.z"}, _ts("2024-01-01T00:00:04")),
        # unrelated anonymous user stays anonymous
        ("m5", "anon2", None, None, _ts("2024-01-01T00:00:05")),
    ]
    return spark.createDataFrame(
        rows,
        "message_id string, anonymous_id string, user_id string, "
        "traits map<string,string>, ts timestamp",
    )


def test_backfill_all_events_carry_identity(spark):
    from jitsu_spark.operators.identity import user_recognition_backfill

    out = {r.message_id: r for r in user_recognition_backfill(_events(spark)).collect()}
    assert len(out) == 5
    for m in ("m1", "m2", "m3"):
        assert out[m].user_id == "u42", m
        assert out[m].traits == {"email": "x@y.z"}, m
        assert out[m]._backfilled
    assert out["m4"].user_id == "u42" and not out["m4"]._backfilled
    assert out["m5"].user_id is None and not out["m5"]._backfilled


def test_backfill_latest_identity_wins(spark):
    from jitsu_spark.operators.identity import user_recognition_backfill

    rows = [
        ("m1", "a", None, None, _ts("2024-01-01T00:00:01")),
        ("m2", "a", "u_old", {"p": "1"}, _ts("2024-01-01T00:00:02")),
        ("m3", "a", "u_new", {"q": "2"}, _ts("2024-01-01T00:00:03")),
    ]
    df = spark.createDataFrame(
        rows,
        "message_id string, anonymous_id string, user_id string, "
        "traits map<string,string>, ts timestamp",
    )
    out = {r.message_id: r for r in user_recognition_backfill(df).collect()}
    assert out["m1"].user_id == "u_new"
    assert out["m1"].traits == {"p": "1", "q": "2"}  # merged across identifies
    # an event's own traits win over resolved on collision
    assert out["m2"].traits == {"p": "1", "q": "2"}


def test_id_graph_components(spark):
    from jitsu_spark.operators.identity import id_graph_components

    pairs = spark.createDataFrame(
        [("u1", "a1"), ("a1", "d1"), ("u2", "a2"), ("d1", "x9")],
        ["id_a", "id_b"],
    )
    comp = {r.id: r.component for r in id_graph_components(pairs).collect()}
    # u1-a1-d1-x9 form one component, u2-a2 another
    assert comp["u1"] == comp["a1"] == comp["d1"] == comp["x9"]
    assert comp["u2"] == comp["a2"]
    assert comp["u1"] != comp["u2"]


def test_profile_incremental_semantics(spark, sf_dir):
    from jitsu_spark.operators.profiles import build_profiles
    from jitsu_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    full = build_profiles(ev).toPandas().set_index("user_id")
    # watermark near the end: only users active after it are recomputed,
    # but with FULL history (so rows must equal the full-build rows)
    inc = build_profiles(ev, since="2024-01-30 00:00:00").toPandas().set_index("user_id")
    assert 0 < len(inc) <= len(full)
    joined = inc.join(full, how="left", rsuffix="_full")
    assert (joined["n_events"] == joined["n_events_full"]).all()
