"""Golden-output tests for the GA4 / Mixpanel destination mappings —
the reference's destination-test pattern (mocked-transport payload
assertions, `libs/core-functions/__tests__/mixpanel.test.ts`) with
handwritten canonical events."""

from __future__ import annotations

import hashlib

from jitsu_spark.events.destinations import (
    adjust_name,
    device_id_of,
    ga4_event,
    insert_id,
    mixpanel_events,
)

ORDER_COMPLETED = {
    "messageId": "m-1",
    "type": "track",
    "event": "Order Completed",
    "name": "Order Completed",
    "userId": "u1",
    "anonymousId": "anon-1",
    "properties": {
        "order_id": "o-42",
        "total": 119.98,
        "currency": "USD",
        "coupon": "SAVE10",
        "products": [
            {"product_id": "p1", "name": "Widget", "price": 59.99, "quantity": 2},
            {"name": "no-id-dropped"},
        ],
    },
    "context": {"ip": "1.2.3.4", "userAgent": "UA", "campaign": {"source": "g"}},
}


class TestGa4:
    def test_order_completed_to_purchase(self):
        out = ga4_event(ORDER_COMPLETED)
        assert out["name"] == "purchase"
        p = out["params"]
        assert p["transaction_id"] == "o-42"
        assert p["value"] == 119.98
        assert p["currency"] == "USD"
        assert p["coupon"] == "SAVE10"
        assert p["engagement_time_msec"] == 1
        # product without product_id+name is dropped (ga4-destination.ts:79-81)
        assert len(p["items"]) == 1
        assert p["items"][0]["item_id"] == "p1"
        assert p["items"][0]["item_name"] == "Widget"
        assert p["items"][0]["quantity"] == 2

    def test_signed_up(self):
        out = ga4_event(
            {"type": "track", "event": "Signed Up", "name": "Signed Up",
             "properties": {"method": "email"}}
        )
        assert out == {
            "name": "sign_up",
            "params": {"method": "email", "engagement_time_msec": 1},
        }

    def test_page_view(self):
        out = ga4_event(
            {
                "type": "page",
                "context": {"page": {"url": "https://x.io/a", "title": "A"}},
                "properties": {"referrer": "https://ref.io"},
            }
        )
        assert out["name"] == "page_view"
        assert out["params"]["page_location"] == "https://x.io/a"
        assert out["params"]["page_referrer"] == "https://ref.io"
        assert out["params"]["page_title"] == "A"

    def test_unknown_event_sanitized_default(self):
        out = ga4_event(
            {"type": "track", "event": "My Custom-Event!",
             "properties": {"revenue": 5, "foo": "bar"}}
        )
        assert out["name"] == "My_Custom_Event_"
        assert out["params"]["value"] == 5
        assert out["params"]["foo"] == "bar"

    def test_identify_ignored(self):
        assert ga4_event({"type": "identify"}) is None

    def test_adjust_name_truncates_at_40(self):
        assert len(adjust_name("x" * 100)) == 40


class TestMixpanel:
    def test_track_event_payload(self):
        (op,) = mixpanel_events(ORDER_COMPLETED)
        assert op["op"] == "import"
        p = op["payload"]
        assert p["event"] == "Order Completed"
        props = p["properties"]
        assert props["distinct_id"] == "u1"
        assert props["$user_id"] == "u1"
        assert props["$device_id"] == "anon-1"
        assert props["utm_source"] == "g"
        assert props["ip"] == "1.2.3.4"
        assert props["$insert_id"] == insert_id("m-1", "Order Completed")
        assert props["total"] == 119.98

    def test_insert_id_is_md5(self):
        assert insert_id("m", "t") == hashlib.md5(b"m_t").hexdigest()

    def test_device_id_fallback_hashes_ip_ua(self):
        ev = {"context": {"ip": "1.1.1.1", "userAgent": "UA"}}
        assert device_id_of(ev) == hashlib.sha256(b"1.1.1.1UA").hexdigest()
        assert device_id_of({}) is None

    def test_identify_set_and_merge(self):
        ops = mixpanel_events(
            {
                "type": "identify",
                "userId": "u1",
                "anonymousId": "anon-1",
                "traits": {"email": "x@y.z", "plan": "pro"},
            }
        )
        assert [o["op"] for o in ops] == ["engage-set", "merge"]
        st = ops[0]["payload"]
        # special traits get $-prefixed (mixpanel-destination.ts:12-23)
        assert st["$set"] == {"$email": "x@y.z", "plan": "pro"}
        assert st["$distinct_id"] == "u1"
        merge = ops[1]["payload"]
        assert merge["event"] == "$merge"
        assert merge["properties"]["$distinct_ids"] == ["u1", "anon-1"]

    def test_identify_without_anonymous_no_merge(self):
        ops = mixpanel_events({"type": "identify", "userId": "u1", "traits": {}})
        assert [o["op"] for o in ops] == ["engage-set"]

    def test_page_becomes_web_page_view(self):
        (op,) = mixpanel_events(
            {"type": "page", "messageId": "m2", "anonymousId": "a"}
        )
        assert op["payload"]["event"] == "$mp_web_page_view"
        assert op["payload"]["properties"]["distinct_id"] == "a"

    def test_group_set(self):
        (op,) = mixpanel_events(
            {"type": "group", "groupId": "g1", "traits": {"name": "Acme"}}
        )
        assert op["op"] == "group-set"
        assert op["payload"]["$group_id"] == "g1"
