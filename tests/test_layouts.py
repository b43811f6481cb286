"""Golden-semantics tests for the data layouts (SURVEY.md §2.4, §5).

Fixture events exercise the invariants the reference's own test corpus
checks (`libs/core-functions/__tests__/datalayout-*.test.ts`): snake_case
rewrite incl. nested keys, traits merge precedence, group_id promotion,
track 2-row fan-out, plural table naming, JITSU_TABLE_NAME override,
track-props-at-top-level, keepOriginalNames bypass.
"""

from __future__ import annotations

import json

import pytest

from jitsu_spark.events.layout_core import map_event, plural
from jitsu_spark.functions.strings import snake_case

PAGE_EVENT = {
    "messageId": "m-page-1",
    "type": "page",
    "name": "Home",
    "timestamp": "2024-01-01T00:00:00.000Z",
    "userId": "u1",
    "anonymousId": "a1",
    "writeKey": "wk:sec",
    "properties": {
        "path": "/home",
        "title": "Home Page",
        "url": "https://example.com/home?q=1",
        "nestedObj": {"nestedProp": "val"},
    },
    "context": {
        "ip": "10.1.2.3",
        "locale": "en-US",
        "userAgent": "Mozilla/5.0",
        "groupId": "grp-ctx",
        "traits": {"CaseLastName": "Doe", "User_Name": "jdoe", "email": "j@d.io"},
        "page": {"url": "https://example.com/home?q=1", "title": "Home Page", "encoding": "UTF-8"},
        "screen": {"width": 1280, "height": 720, "innerWidth": 1000, "innerHeight": 600},
        "campaign": {"name": "spring", "source": "newsletter"},
        "geo": {
            "country": {"code": "US", "name": "United States"},
            "city": {"name": "NYC"},
            "location": {"latitude": 1.5, "longitude": 2.5},
        },
    },
}

TRACK_EVENT = {
    "messageId": "m-track-1",
    "type": "track",
    "event": "testEvent",
    "timestamp": "2024-01-01T00:00:01.000Z",
    "userId": "u1",
    "properties": {"numProp": 42, "StrProp": "x", "traits": {"plan": "pro"}},
    "context": {"traits": {"groupId": "g-in-traits", "tier": "gold"}},
}

IDENTIFY_EVENT = {
    "messageId": "m-id-1",
    "type": "identify",
    "timestamp": "2024-01-01T00:00:02.000Z",
    "userId": "u1",
    "traits": {"email": "new@d.io", "FirstName": "Jane"},
    "context": {"traits": {"email": "old@d.io", "LastName": "Doe"}},
}

GROUP_EVENT = {
    "messageId": "m-grp-1",
    "type": "group",
    "groupId": "acme",
    "timestamp": "2024-01-01T00:00:03.000Z",
    "userId": "u1",
    "traits": {"CompanyName": "Acme Inc"},
}


def one(rows):
    assert len(rows) == 1
    return rows[0]


def test_snake_case_rules():
    assert snake_case("CaseLastName") == "case_last_name"
    assert snake_case("User_Name") == "user_name"
    assert snake_case("prop1Value") == "prop1value"  # digit blocks underscore
    assert snake_case("with space") == "with_space"
    assert snake_case("already_snake") == "already_snake"


def test_plural():
    assert plural("identify") == "identifies"
    assert plural("page") == "pages"
    assert plural("track") == "tracks"
    assert plural("group") == "groups"
    assert plural("custom") == "custom"


def test_single_table_page_routes_to_events():
    table, row = one(map_event(PAGE_EVENT, "segment-single-table"))
    assert table == "events"
    assert row["type"] == "page"
    # properties spread at top level, keys snake_cased recursively
    assert row["nested_obj"] == {"nested_prop": "val"}
    # traits under context.traits with snake keys
    assert row["context"]["traits"]["case_last_name"] == "Doe"
    assert row["context"]["traits"]["user_name"] == "jdoe"
    # group_id promoted from context.groupId
    assert row["context"]["group_id"] == "grp-ctx"
    # top-level core fields present, snake_cased
    assert row["message_id"] == "m-page-1"
    assert row["user_id"] == "u1"


def test_single_table_track_traits_from_properties():
    table, row = one(map_event(TRACK_EVENT, "segment-single-table"))
    assert table == "events"
    assert row["type"] == "track"
    # properties.traits merged into context.traits, removed from top
    assert row["context"]["traits"]["plan"] == "pro"
    assert row["context"]["traits"]["tier"] == "gold"
    assert "traits" not in [k for k in row if k == "traits"]
    # group_id promoted from context.traits.groupId
    assert row["context"]["group_id"] == "g-in-traits"
    assert row["num_prop"] == 42
    assert row["str_prop"] == "x"
    assert row["event"] == "testEvent"


def test_multi_table_track_fans_out_two_rows():
    rows = map_event(TRACK_EVENT, "segment")
    assert [t for t, _ in rows] == ["tracks", "testEvent"]
    base, named = rows[0][1], rows[1][1]
    # base row has no properties spread; named row does
    assert "num_prop" not in base
    assert named["num_prop"] == 42
    # neither carries `type`
    assert "type" not in base and "type" not in named


def test_multi_table_identify_merges_traits_at_top():
    table, row = one(map_event(IDENTIFY_EVENT, "segment"))
    assert table == "identifies"
    # event.traits wins over context.traits on collision
    assert row["email"] == "new@d.io"
    assert row["first_name"] == "Jane"
    assert row["last_name"] == "Doe"
    assert row["context"] == {}


def test_multi_table_group_routes_to_groups():
    table, row = one(map_event(GROUP_EVENT, "segment"))
    assert table == "groups"
    assert row["company_name"] == "Acme Inc"
    assert row["group_id"] == "acme"


def test_single_table_group_nests_group_traits():
    table, row = one(map_event(GROUP_EVENT, "segment-single-table"))
    assert table == "events"
    assert row["context"]["group"]["company_name"] == "Acme Inc"
    assert row["context"]["group_id"] == "acme"
    assert "groupId" not in row and "group_id" not in row


def test_table_name_override_wins_everywhere():
    ev = {**TRACK_EVENT, "JITSU_TABLE_NAME": "custom_sink"}
    for layout in ("segment", "segment-single-table", "jitsu-legacy", "passthrough"):
        rows = map_event(ev, layout)
        assert len(rows) == 1, layout
        assert rows[0][0] == "custom_sink", layout


def test_keep_original_names_bypasses_snake_case():
    _, row = one(map_event(PAGE_EVENT, "segment-single-table", keep_original_names=True))
    assert "nestedObj" in row
    assert row["context"]["traits"]["CaseLastName"] == "Doe"


def test_jitsu_legacy_flat_schema():
    table, row = one(map_event(PAGE_EVENT, "jitsu-legacy"))
    assert table == "events"
    assert row["eventn_ctx_event_id"] == "m-page-1"
    assert row["event_type"] == "page"
    assert row["doc_host"] == "example.com"
    assert row["doc_path"] == "/home"
    assert row["doc_search"] == "?q=1"
    assert row["anon_ip"] == "10.1.2.0"  # /24 anonymization
    assert row["source_ip"] == "10.1.2.3"
    assert row["screen_resolution"] == "1280x720"
    assert row["vp_size"] == "1000x600"
    assert row["user"]["id"] == "u1"
    assert row["user"]["email"] == "j@d.io"
    assert row["location"]["country"] == "US"
    assert row["location"]["latitude"] == 1.5
    assert row["utm"] == {"name": "spring", "source": "newsletter"}
    assert row["src"] == "jitsu"


def test_jitsu_legacy_track_props_at_top():
    _, row = one(map_event(TRACK_EVENT, "jitsu-legacy"))
    assert row["num_prop"] == 42
    assert row["event_type"] == "testEvent"


def test_passthrough_identity():
    ev = {**TRACK_EVENT, "JITSU_TABLE_NAME": "t9"}
    table, row = one(map_event(ev, "passthrough"))
    assert table == "t9"
    assert "JITSU_TABLE_NAME" not in row
    assert row["properties"] == TRACK_EVENT["properties"]


def test_spark_map_in_pandas_path(spark):
    from jitsu_spark.events.layouts import apply_layout

    events = [PAGE_EVENT, TRACK_EVENT, IDENTIFY_EVENT, GROUP_EVENT]
    df = spark.createDataFrame([(json.dumps(e),) for e in events], ["event"])
    out = apply_layout(df, "segment").collect()
    # track fans out: 4 events -> 5 rows
    assert len(out) == 5
    tables = sorted(r._table for r in out)
    assert tables == ["groups", "identifies", "pages", "testEvent", "tracks"]
    for r in out:
        parsed = json.loads(r.event)
        assert isinstance(parsed, dict) and parsed


@pytest.mark.parametrize("layout", ["segment", "segment-single-table", "jitsu-legacy", "passthrough"])
def test_all_layouts_json_serializable(layout):
    for ev in (PAGE_EVENT, TRACK_EVENT, IDENTIFY_EVENT, GROUP_EVENT):
        for _, row in map_event(ev, layout):
            json.dumps(row)
