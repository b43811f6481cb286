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


def test_alias_pairs_feed_id_graph(spark):
    from jitsu_spark.operators.identity import alias_pairs, id_graph_components

    rows = [
        # identify: anon a1 -> u1
        ("m1", "identify", "a1", "u1", None),
        # alias: previous u_old -> u1
        ("m2", "alias", None, "u1", "u_old"),
        # unrelated identify
        ("m3", "identify", "a9", "u9", None),
    ]
    df = spark.createDataFrame(
        rows,
        "message_id string, type string, anonymous_id string, "
        "user_id string, previous_id string",
    )
    pairs = alias_pairs(df)
    comp = {r.id: r.component for r in id_graph_components(pairs).collect()}
    assert comp["u1"] == comp["a1"] == comp["u_old"]
    assert comp["u9"] == comp["a9"] != comp["u1"]


def test_braze_mapping():
    from jitsu_spark.events.destinations import braze_events, to_braze_gender

    assert to_braze_gender("Female") == "F"
    assert to_braze_gender("nonbinary") == "nonbinary"
    purchase = braze_events(
        {
            "type": "track", "event": "Order Completed", "userId": "u1",
            "timestamp": "t",
            "properties": {
                "coupon": "X",
                "products": [
                    {"product_id": "p1", "price": 9.99, "quantity": 2, "sku": "s"}
                ],
            },
        }
    )
    (p,) = purchase
    assert p["op"] == "purchase" and p["external_id"] == "u1"
    assert p["currency"] == "USD" and p["quantity"] == 2
    assert p["properties"] == {"sku": "s", "coupon": "X"}
    (ev,) = braze_events(
        {"type": "track", "event": "E", "anonymousId": "a1", "properties": {}}
    )
    assert ev["user_alias"] == {"alias_name": "a1", "alias_label": "anonymous_id"}
    (att,) = braze_events(
        {"type": "identify", "userId": "u1",
         "traits": {"gender": "male", "plan": "pro"}}
    )
    assert att["gender"] == "M" and att["custom_attributes"] == {"plan": "pro"}


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


def test_id_graph_deep_chain_converges_within_log_rounds(spark):
    """Round-4: pointer jumping doubles the reachable radius per round,
    so a 100-node chain converges inside max_iter=10 (~log2 rounds). The
    previous one-hop propagation needed length-many rounds and silently
    returned WRONG components for chains deeper than max_iter."""
    from jitsu_spark.operators.identity import id_graph_components

    n = 100
    pairs = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n - 1)],
        "id_a string, id_b string",
    )
    comp = {r.id: r.component for r in id_graph_components(pairs).collect()}
    assert len(comp) == n
    assert set(comp.values()) == {"n000"}  # ONE component, min id wins


def test_id_graph_two_deep_chains_stay_separate(spark):
    from jitsu_spark.operators.identity import id_graph_components

    edges = [(f"a{i:02d}", f"a{i + 1:02d}") for i in range(30)]
    edges += [(f"b{i:02d}", f"b{i + 1:02d}") for i in range(30)]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    comp = {r.id: r.component for r in id_graph_components(pairs).collect()}
    assert {comp[k] for k in comp if k.startswith("a")} == {"a00"}
    assert {comp[k] for k in comp if k.startswith("b")} == {"b00"}
