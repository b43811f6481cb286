"""Golden tests for the HubSpot / Intercom destination mappings, driven by
the reference's own integration-test event sequences
(`libs/core-functions/__tests__/hubspot-destination.test.ts`,
`intercom-destination.test.ts` — ported here as mocked-transport payload
assertions, since the reference tests only run against live credentials)."""

from __future__ import annotations

from jitsu_spark.events.destinations_crm import (
    hubspot_events,
    intercom_events,
    split_name,
)

EMAIL = "dwight.schrute@dunder-mifflin.com"
USER_ID = "user-id-ds"
WS_ID = "workspace-id-dm"
WS_NAME = "Dunder Mifflin"

# intercom-destination.test.ts:28-133, verbatim event shapes
IDENTIFY = {
    "type": "identify",
    "userId": USER_ID,
    "traits": {"email": EMAIL, "name": "Dwight Schrute"},
    "timestamp": "2023-11-28T20:37:14.693Z",
    "messageId": "7qfgopt6mo22xk2tqs0tb",
    "groupId": WS_ID,
    "context": {},
}
GROUP = {
    "type": "group",
    "groupId": WS_ID,
    "traits": {"workspaceSlug": "dunder-mifflin", "name": WS_NAME},
    "timestamp": "2023-11-28T20:37:14.673Z",
    "messageId": "1xdx6pryjnuqgi4jz362j",
    "context": {},
}
TRACK = {
    "type": "track",
    "event": "user_created",
    "properties": {},
    "userId": USER_ID,
    "timestamp": "2023-11-29T16:55:50.255Z",
    "messageId": "22ccyzg8enx2duj3bcit8h",
    "context": {
        "traits": {"email": EMAIL, "name": "Dwight Schrute"},
        "page": {},
        "library": {"name": "@jitsu/js", "version": "0.0.0"},
    },
}
PAGE = {
    "type": "page",
    "userId": USER_ID,
    "groupId": WS_ID,
    "timestamp": "2023-11-29T19:02:36.152Z",
    "messageId": "1m6c2acu28b1bt4eak2qk1",
    "context": {
        "traits": {"email": EMAIL, "name": "Dwight Schrute"},
        "page": {
            "title": "Jitsu",
            "url": "https://use.jitsu.com/",
            "path": "/dunder-mifflin",
        },
    },
}


class TestSplitName:
    def test_splits_first_rest(self):
        # hubspot-destination.ts:20-26
        assert split_name("Dwight Schrute") == ("Dwight", "Schrute")
        assert split_name("Ada") == ("Ada", None)
        assert split_name("A B C") == ("A", "B C")
        assert split_name(None) == (None, None)


class TestHubspot:
    def test_identify_upserts_contact_and_company(self):
        ops = hubspot_events(IDENTIFY)
        assert [o["op"] for o in ops] == [
            "contact-upsert",
            "company-upsert",
            "associate",
        ]
        contact = ops[0]["properties"]
        assert contact["email"] == EMAIL
        assert contact["firstname"] == "Dwight"
        assert contact["lastname"] == "Schrute"
        assert contact["jitsu_user_id"] == USER_ID
        # company from identify is create-only (hubspot-destination.ts:268)
        assert ops[1]["do_not_update"] is True
        assert ops[1]["properties"]["name"] == f"Company {WS_ID}"
        assert ops[1]["properties"]["jitsu_group_id"] == WS_ID
        assert ops[2]["association_type"] == "2"

    def test_identify_without_email_is_skipped(self):
        ev = {**IDENTIFY, "traits": {"name": "No Email"}}
        assert hubspot_events(ev) == []

    def test_group_updates_company_with_snake_cased_traits(self):
        ops = hubspot_events(GROUP)
        assert ops[0]["op"] == "company-upsert"
        assert ops[0]["do_not_update"] is False
        assert ops[0]["properties"]["name"] == WS_NAME
        # custom props snake_cased (hubspot-destination.ts:83)
        assert ops[0]["properties"]["workspace_slug"] == "dunder-mifflin"
        assert "name" not in {
            k for k in ops[0]["properties"] if k == "workspaceSlug"
        }

    def test_group_with_user_associates(self):
        ops = hubspot_events({**GROUP, "userId": USER_ID})
        assert [o["op"] for o in ops] == ["company-upsert", "associate"]
        assert ops[1]["user_id"] == USER_ID
        assert ops[1]["group_id"] == WS_ID

    def test_page_view_events_gated_on_flag_and_email(self):
        assert hubspot_events(PAGE) == []  # flag off
        ops = hubspot_events(PAGE, {"sendPageViewEvents": True})
        # PAGE carries email only in context.traits, not traits/properties —
        # the reference reads traits/properties only (:287), so no event
        assert ops == []
        ev = {**PAGE, "traits": {"email": EMAIL}}
        ops = hubspot_events(ev, {"sendPageViewEvents": True})
        assert len(ops) == 1
        be = ops[0]
        assert be["op"] == "behavioral-event"
        assert be["email"] == EMAIL
        assert be["event_name"] == "page"  # non-track uses event.type (:297)
        assert be["properties"] == {"url": "https://use.jitsu.com/"}
        assert be["uuid"] == PAGE["messageId"]

    def test_track_event_name_fallback(self):
        ev = {
            "type": "track",
            "traits": {"email": EMAIL},
            "messageId": "m",
            "timestamp": "2023-11-29T16:55:50.255Z",
        }
        ops = hubspot_events(ev, {"sendPageViewEvents": True})
        assert ops[0]["event_name"] == "track"  # event.event ?? "track"


class TestIntercom:
    def test_identify_creates_contact_and_attaches_company(self):
        ops = intercom_events(IDENTIFY)
        assert [o["op"] for o in ops] == [
            "contact-upsert",
            "attach-contact-to-company",
        ]
        c = ops[0]
        assert c["role"] == "user"
        assert c["external_id"] == USER_ID
        assert c["email"] == EMAIL
        assert c["name"] == "Dwight Schrute"
        assert c["last_seen_at"] == "2023-11-28T20:37:14.693Z"
        assert c["custom_attributes"] == {}
        assert ops[1]["user_id"] == USER_ID
        assert ops[1]["group_id"] == WS_ID

    def test_identify_first_last_name_fallback(self):
        ev = {
            **IDENTIFY,
            "groupId": None,
            "traits": {"email": EMAIL, "firstName": "Dwight", "lastName": "S"},
        }
        ops = intercom_events(ev)
        assert ops[0]["name"] == "Dwight S"

    def test_identify_without_email_skips_contact(self):
        ev = {**IDENTIFY, "traits": {"name": "No Email"}}
        ops = intercom_events(ev)
        # contact skipped (:197-202) but the attach still goes out keyed by
        # ids (the reference resolves both by search, :312-328)
        assert [o["op"] for o in ops] == ["attach-contact-to-company"]

    def test_group_upserts_company(self):
        ops = intercom_events(GROUP)
        assert ops[0] == {
            "op": "company-upsert",
            "company_id": WS_ID,
            "name": WS_NAME,
            "custom_attributes": {},
        }

    def test_track_maps_to_event_with_metadata(self):
        ops = intercom_events(TRACK)
        assert len(ops) == 1
        e = ops[0]
        assert e["op"] == "event"
        assert e["event_name"] == "user_created"
        # toDate(ts).getTime()/1000 rounded (intercom-destination.ts:351)
        assert e["created_at"] == 1701276950
        assert e["user_id"] == USER_ID
        assert e["email"] == EMAIL  # from context.traits (:343)
        assert e["metadata"]["libraryName"] == "@jitsu/js"
        assert e["metadata"]["libraryVersion"] == "0.0.0"

    def test_page_becomes_page_view(self):
        ops = intercom_events(PAGE)
        assert ops[0]["event_name"] == "page-view"
        assert ops[0]["metadata"]["url"] == "https://use.jitsu.com/"

    def test_update_last_seen_flag(self):
        ops = intercom_events(TRACK, {"updateLastSeenOnEveryEvent": True})
        assert [o["op"] for o in ops] == ["event", "update-last-seen"]
        assert ops[1]["last_seen_at"] == ops[0]["created_at"]


def test_typed_mappings_run(spark, sf_dir):
    from jitsu_spark.events.destinations_crm import (
        hubspot_mapping_typed,
        intercom_mapping_typed,
    )

    h = hubspot_mapping_typed(spark, sf_dir)
    assert h.columns == [
        "uuid", "email", "event_name", "occurred_at",
        "firstname", "lastname", "jitsu_user_id", "property_k",
    ]
    row = h.orderBy("uuid").first()
    assert row.email.startswith("user") and row.email.endswith("@example.com")
    i = intercom_mapping_typed(spark, sf_dir)
    r = i.first()
    assert isinstance(r.created_at, int)
