"""API destination mappings: Segment events -> provider payloads.

These are the reference's per-destination projection functions, usable
directly as chain user-functions (jitsu_spark.plans.chain) — each takes an
event dict and returns the mapped payload(s).

- GA4 (M6, `libs/core-functions/src/functions/ga4-destination.ts:148-320`):
  e-commerce track events -> GA4 measurement-protocol events; 16 named
  cases + sanitized default; items arrays from properties.products
  (`:64-104`); page -> page_view.
- Mixpanel (M7, `mixpanel-destination.ts:117-241,356-393,395-457`): track ->
  `$mp` event with mapped props; identify -> `$set` profile op plus a
  `$merge` identity op when both ids are present; insert_id/device-id
  hashing per F11.

At scale these run inside the single mapInPandas chain stage (Arrow
batches); for known-schema streams the same mappings collapse to select
expressions (see ga4_purchase_mapping below, oracle-checked).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

# ---------------------------------------------------------------------------
# GA4
# ---------------------------------------------------------------------------

_GA4_ITEM_FIELDS = {
    "item_id": "product_id",
    "item_name": "name",
    "affiliation": "affiliation",
    "coupon": "coupon",
    "creative_name": "creative_name",
    "creative_slot": "creative_slot",
    "currency": "currency",
    "discount": "discount",
    "index": "position",
    "item_brand": "brand",
    "item_category": "category",
    "item_category2": "category2",
    "item_category3": "category3",
    "item_category4": "category4",
    "item_category5": "category5",
    "item_list_id": "list_id",
    "item_list_name": "list_name",
    "item_variant": "variant",
    "location_id": "location_id",
    "price": "price",
    "promotion_id": "promotion_id",
    "promotion_name": "promotion_name",
    "quantity": "quantity",
}


def _ga4_item(product: dict) -> dict | None:
    # ga4-destination.ts:79-81: items need product_id AND name
    if not product.get("product_id") or not product.get("name"):
        return None
    return {k: product.get(src) for k, src in _GA4_ITEM_FIELDS.items()}


def _ga4_items(event: dict) -> list[dict]:
    props = event.get("properties") or {}
    products = props.get("products")
    if isinstance(products, list):
        return [i for i in (_ga4_item(p) for p in products) if i]
    item = _ga4_item(props)
    return [item] if item else []


def _value(evp: dict, *keys: str):
    for k in keys:
        if evp.get(k) is not None:
            return evp[k]
    return None


def adjust_name(name: str, max_len: int = 40) -> str:
    """F13 (`ga4-destination.ts:163-166`)."""
    return re.sub(r"[^a-zA-Z0-9_]", "_", name or "")[:max_len]


# name -> (ga4 name, params builder). Covers the reference's 16 cases.
def _ecom(evp, ev, **extra):
    return {
        "currency": evp.get("currency"),
        "value": _value(evp, "value", "total", "revenue"),
        "items": _ga4_items(ev),
        **extra,
    }


_GA4_CASES: dict[str, Any] = {
    "Promotion Clicked": lambda evp, ev: {
        "creative_name": evp.get("creative_name"),
        "creative_slot": evp.get("creative"),
        "location_id": evp.get("position"),
        "promotion_id": evp.get("promotion_id"),
        "promotion_name": evp.get("promotion_name") or evp.get("name"),
        "items": _ga4_items(ev),
    },
    "Product List Viewed": lambda evp, ev: {
        "item_list_id": evp.get("list_id"),
        "item_list_name": evp.get("category"),
        "items": _ga4_items(ev),
    },
    "Checkout Started": lambda evp, ev: _ecom(evp, ev, coupon=evp.get("coupon")),
    "Order Refunded": lambda evp, ev: {
        "currency": evp.get("currency"),
        "transaction_id": evp.get("order_id"),
        "value": _value(evp, "total", "value", "revenue"),
        "coupon": evp.get("coupon"),
        "shipping": evp.get("shipping"),
        "affiliation": evp.get("affiliation"),
        "tax": evp.get("tax"),
        "items": _ga4_items(ev),
    },
    "Product Added": _ecom,
    "Payment Info Entered": lambda evp, ev: _ecom(
        evp, ev, coupon=evp.get("coupon"), payment_type=evp.get("payment_method")
    ),
    "Product Added to Wishlist": _ecom,
    "Product Viewed": _ecom,
    "Signed Up": lambda evp, ev: {"method": evp.get("type") or evp.get("method")},
    "Order Completed": lambda evp, ev: {
        "currency": evp.get("currency"),
        "transaction_id": evp.get("order_id"),
        "value": _value(evp, "total", "value", "revenue"),
        "coupon": evp.get("coupon"),
        "shipping": evp.get("shipping"),
        "affiliation": evp.get("affiliation"),
        "tax": evp.get("tax"),
        "items": _ga4_items(ev),
    },
    "Promotion Viewed": lambda evp, ev: {
        "creative_name": evp.get("creative_name"),
        "creative_slot": evp.get("creative"),
        "location_id": evp.get("position"),
        "promotion_id": evp.get("promotion_id"),
        "promotion_name": evp.get("promotion_name") or evp.get("name"),
        "items": _ga4_items(ev),
    },
    "Cart Viewed": _ecom,
    "Signed In": lambda evp, ev: {"method": evp.get("type") or evp.get("method")},
    "Product Removed": _ecom,
    "Products Searched": lambda evp, ev: {"search_term": evp.get("query")},
    "Product Clicked": lambda evp, ev: {
        "item_list_id": evp.get("list_id"),
        "item_list_name": evp.get("category"),
        "items": _ga4_items(ev),
    },
}

_GA4_NAME_MAP = {
    "Promotion Clicked": "select_promotion",
    "Product List Viewed": "view_item_list",
    "Checkout Started": "begin_checkout",
    "Order Refunded": "refund",
    "Product Added": "add_to_cart",
    "Payment Info Entered": "add_payment_info",
    "Product Added to Wishlist": "add_to_wishlist",
    "Product Viewed": "view_item",
    "Signed Up": "sign_up",
    "Order Completed": "purchase",
    "Promotion Viewed": "view_promotion",
    "Cart Viewed": "view_cart",
    "Signed In": "login",
    "Product Removed": "remove_from_cart",
    "Products Searched": "search",
    "Product Clicked": "select_item",
}


def ga4_event(event: dict) -> dict | None:
    """One Segment event -> one GA4 event (name + params), or None for
    types GA4 ignores. Mirrors trackEvent/pageViewEvent."""
    etype = event.get("type")
    if etype == "page":
        page = (event.get("context") or {}).get("page") or {}
        pp = {**page, **(event.get("properties") or {})}
        return {
            "name": "page_view",
            "params": {
                "page_location": pp.get("url", ""),
                "page_referrer": pp.get("referrer", ""),
                "page_title": pp.get("title", ""),
                "engagement_time_msec": 1,
            },
        }
    if etype != "track":
        return None
    evp = event.get("properties") or {}
    # the reference switches on event.name with event/type fallback for the
    # default label (ga4-destination.ts:170-173)
    name_key = event.get("name") or event.get("event")
    case = _GA4_CASES.get(name_key)
    if case:
        params = case(evp, event)
        name = _GA4_NAME_MAP[name_key]
    else:
        name = adjust_name(event.get("event") or event.get("name") or etype)
        params = {k: v for k, v in evp.items() if k != "products"}
        params["currency"] = evp.get("currency")
        params["value"] = _value(evp, "value", "total", "revenue")
    params["engagement_time_msec"] = 1
    return {"name": name, "params": params}


# ---------------------------------------------------------------------------
# Mixpanel
# ---------------------------------------------------------------------------

# mixpanel-destination.ts:12-23 specialProperties get a $ prefix
_MP_SPECIAL = [
    "avatar", "email", "phone", "name", "first_name", "last_name",
    "timezone", "created",
]

_MP_UTM = {  # utmFromCampaign, mixpanel-destination.ts:38-56
    "name": "utm_campaign",
    "source": "utm_source",
    "medium": "utm_medium",
    "term": "utm_term",
    "content": "utm_content",
}


def insert_id(message_id: str, event_type: str) -> str:
    """F11 (`mixpanel-destination.ts:391-393`)."""
    return hashlib.md5(f"{message_id}_{event_type}".encode()).hexdigest()


def device_id_of(event: dict) -> str | None:
    """anonymousId, else sha256 of ip+UA fallback
    (`mixpanel-destination.ts:467-494`)."""
    if event.get("anonymousId"):
        return str(event["anonymousId"])
    ctx = event.get("context") or {}
    ip, ua = ctx.get("ip"), ctx.get("userAgent")
    if ip and ua:
        return hashlib.sha256(f"{ip}{ua}".encode()).hexdigest()
    return None


def mixpanel_events(event: dict) -> list[dict]:
    """One Segment event -> Mixpanel API ops. track/page/screen -> one
    import event; identify -> $set (+ $merge when both ids present);
    group -> group $set."""
    etype = event.get("type")
    ctx = event.get("context") or {}
    device_id = device_id_of(event)
    user_id = event.get("userId")
    distinct_id = str(user_id) if user_id else device_id

    if etype == "identify":
        traits = {**(event.get("traits") or ctx.get("traits") or {})}
        for p in _MP_SPECIAL:
            if p in traits:
                traits[f"${p}"] = traits.pop(p)
        ops: list[dict] = [
            {
                "op": "engage-set",
                "payload": {"$distinct_id": distinct_id, "$set": traits},
            }
        ]
        if user_id and device_id and str(user_id) != device_id:
            # identity merge bookkeeping (J3, :395-457)
            ops.append(
                {
                    "op": "merge",
                    "payload": {
                        "event": "$merge",
                        "properties": {"$distinct_ids": [str(user_id), device_id]},
                    },
                }
            )
        return ops

    if etype == "group":
        return [
            {
                "op": "group-set",
                "payload": {
                    "$group_key": "$group_id",
                    "$group_id": event.get("groupId"),
                    "$set": event.get("traits") or {},
                },
            }
        ]

    if etype not in ("track", "page", "screen"):
        return []

    name = {"page": "$mp_web_page_view", "screen": "Screen View"}.get(
        etype, event.get("event") or etype
    )
    campaign = ctx.get("campaign") or {}
    props = {
        **{
            dst: campaign[src]
            for src, dst in _MP_UTM.items()
            if campaign.get(src) is not None
        },
        **(ctx.get("page") or {}),
        **(event.get("properties") or {}),
        "ip": ctx.get("ip"),
        "$device_id": device_id,
        "distinct_id": distinct_id,
        "$insert_id": insert_id(event.get("messageId", ""), name),
        "$user_id": str(user_id) if user_id else None,
        "userAgent": ctx.get("userAgent"),
    }
    return [{"op": "import", "payload": {"event": name, "properties": props}}]


# ---------------------------------------------------------------------------
# Amplitude (M8 family, `libs/core-functions/src/functions/
# amplitude-destination.ts:8-139`): identify -> $identify with $set traits;
# group -> $groupidentify; track/page/screen -> HTTP-API event. Sessionization
# uses the chain TTL store keyed by device (sessionWindow default 30 min,
# `:17-19`) — a worked example of a stateful chain function.
# ---------------------------------------------------------------------------

AMPLITUDE_SESSION_WINDOW_MIN = 30


def amplitude_events(event: dict, ctx=None) -> list[dict]:
    etype = event.get("type")
    user_id = event.get("userId")
    device_id = event.get("anonymousId")
    ts = event.get("timestamp")

    def base():
        return {
            "time": ts,
            "insert_id": event.get("messageId"),
            "user_id": user_id,
        }

    if etype == "identify" and user_id:
        return [
            {
                **base(),
                "event_type": "$identify",
                "user_properties": {"$set": {**(event.get("traits") or {})}},
            }
        ]
    if etype == "group" and user_id:
        return [
            {
                **base(),
                "event_type": "$groupidentify",
                "group_properties": {"$set": {**(event.get("traits") or {})}},
                "groups": {"group": event.get("groupId")},
            }
        ]
    if etype in ("page", "track", "screen"):
        session_id = None
        if ctx is not None and device_id:
            key = f"amp_{device_id}_sess"
            session_id = ctx.store.get(key)
            if session_id is None:
                session_id = event.get("timestamp") or event.get("messageId")
            ctx.store.set(
                key, session_id, ttl_days=AMPLITUDE_SESSION_WINDOW_MIN / 1440
            )
        name = {"page": "Page View", "screen": "Screen View"}.get(
            etype, event.get("event") or etype
        )
        return [
            {
                **base(),
                "event_type": name,
                "device_id": device_id,
                "session_id": session_id,
                "event_properties": {**(event.get("properties") or {})},
            }
        ]
    return []


# ---------------------------------------------------------------------------
# PostHog (M8, `libs/core-functions/src/functions/posthog-destination.ts:
# 88-170`): identify -> client.identify with $anon_distinct_id + traits (and
# alias(userId, anonymousId) when both present); group -> groupIdentify;
# track/page -> capture keyed by userId else anonymousId.
# ---------------------------------------------------------------------------


def posthog_events(event: dict) -> list[dict]:
    etype = event.get("type")
    user_id, anon_id = event.get("userId"), event.get("anonymousId")
    distinct = str(user_id) if user_id else anon_id
    if etype == "identify":
        ops = [
            {
                "op": "identify",
                "distinct_id": distinct,
                "properties": {
                    "$anon_distinct_id": anon_id,
                    **(event.get("traits") or {}),
                },
            }
        ]
        if user_id and anon_id:
            ops.append({"op": "alias", "distinct_id": anon_id, "alias": str(user_id)})
        return ops
    if etype == "group":
        return [
            {
                "op": "groupIdentify",
                "group_key": event.get("groupId"),
                "properties": event.get("traits") or {},
            }
        ]
    if etype in ("track", "page", "screen"):
        if distinct is None:
            return []
        name = "$pageview" if etype == "page" else (event.get("event") or etype)
        return [
            {
                "op": "capture",
                "distinct_id": distinct,
                "event": name,
                "properties": event.get("properties") or {},
            }
        ]
    return []


# ---------------------------------------------------------------------------
# June (M8, `june-destination.ts:21-60`): track/page -> track payload with
# campaign_*/screen_* prefixed context props; identify/group pass traits.
# ---------------------------------------------------------------------------


def _prefixed(d: dict | None, prefix: str) -> dict:
    return {f"{prefix}{k}": v for k, v in (d or {}).items()}


def june_events(event: dict) -> list[dict]:
    etype = event.get("type")
    ctx = event.get("context") or {}
    if etype in ("track", "page"):
        return [
            {
                "type": "track",
                "event": "Page View" if etype == "page" else event.get("event"),
                "timestamp": event.get("timestamp"),
                "anonymousId": event.get("anonymousId"),
                "userId": event.get("userId"),
                "email": (ctx.get("traits") or {}).get("email"),
                "properties": {
                    **{
                        k: v
                        for k, v in (event.get("properties") or {}).items()
                        if k not in ("width", "height")
                    },
                    **_prefixed(ctx.get("campaign"), "campaign_"),
                    **_prefixed(ctx.get("screen"), "screen_"),
                    "ip": ctx.get("ip"),
                    "userAgent": ctx.get("userAgent"),
                    "locale": ctx.get("locale"),
                },
            }
        ]
    if etype == "identify":
        return [
            {
                "type": "identify",
                "userId": event.get("userId"),
                "anonymousId": event.get("anonymousId"),
                "traits": event.get("traits") or {},
            }
        ]
    if etype == "group":
        return [
            {
                "type": "group",
                "groupId": event.get("groupId"),
                "userId": event.get("userId"),
                "traits": event.get("traits") or {},
            }
        ]
    return []


# ---------------------------------------------------------------------------
# Braze (M8, `braze-destination.ts:29-171`): gender normalization, id-part
# resolution (external_id > user_alias > braze_id, plus email/phone), track
# -> events, "Order Completed" -> one purchase per product.
# ---------------------------------------------------------------------------

_BRAZE_GENDERS = {
    "M": ["man", "male", "m"],
    "F": ["woman", "female", "w", "f"],
    "O": ["other", "o"],
    "N": ["not applicable", "n"],
    "P": ["prefer not to say", "p"],
}


def to_braze_gender(gender: str | None) -> str | None:
    if not gender:
        return gender
    for code, names in _BRAZE_GENDERS.items():
        if gender.lower() in names:
            return code
    return gender


def _braze_id_part(event: dict) -> dict:
    traits = event.get("traits") or (event.get("context") or {}).get("traits") or {}
    props = event.get("properties") or {}
    id_part: dict = {}
    user_alias = traits.get("user_alias") or props.get("user_alias") or (
        {"alias_name": event["anonymousId"], "alias_label": "anonymous_id"}
        if event.get("anonymousId")
        else None
    )
    if event.get("userId"):
        id_part["external_id"] = event["userId"]
    elif user_alias:
        id_part["user_alias"] = user_alias
    elif traits.get("braze_id") or props.get("braze_id"):
        id_part["braze_id"] = traits.get("braze_id") or props.get("braze_id")
    if traits.get("email"):
        id_part["email"] = traits["email"]
    if traits.get("phone"):
        id_part["phone"] = traits["phone"]
    if not id_part:
        raise ValueError(
            'one of "external_id", "user_alias", "braze_id", "email" or '
            '"phone" is required'
        )
    return id_part


def braze_events(event: dict) -> list[dict]:
    etype = event.get("type")
    props = event.get("properties") or {}
    if etype == "track" and event.get("event") == "Order Completed":
        products = props.get("products") or []
        if not products:
            return []
        base = {**_braze_id_part(event), "time": event.get("timestamp")}
        shared = {k: v for k, v in props.items() if k != "products"}
        reserved = ("product_id", "currency", "price", "quantity")
        return [
            {
                "op": "purchase",
                **base,
                "product_id": p.get("product_id"),
                "currency": p.get("currency", "USD"),
                "price": p.get("price"),
                "quantity": p.get("quantity"),
                "properties": {
                    **{k: v for k, v in p.items() if k not in reserved},
                    **shared,
                },
            }
            for p in products
        ]
    if etype in ("track", "page", "screen"):
        return [
            {
                "op": "event",
                **_braze_id_part(event),
                "name": event.get("event") or etype,
                "time": event.get("timestamp"),
                "properties": props,
            }
        ]
    if etype == "identify":
        traits = event.get("traits") or {}
        return [
            {
                "op": "attributes",
                **_braze_id_part(event),
                "gender": to_braze_gender(traits.get("gender")),
                "custom_attributes": {
                    k: v for k, v in traits.items() if k != "gender"
                },
            }
        ]
    return []


# ---------------------------------------------------------------------------
# Facebook Conversions API (M8, `facebook-conversions.ts:11-26,44-130`):
# track/page/screen -> server events with SHA-256-hashed user_data
# (trim+lowercase before hashing, `facebookHash` at `:11-16`; phone
# sanitization strips non-digits and leading zeros, `:22-26`).
# ---------------------------------------------------------------------------


def facebook_hash(value: str | None) -> str | None:
    if not value:
        return None
    return hashlib.sha256(value.strip().lower().encode()).hexdigest()


def sanitize_phone(phone: str) -> str:
    return re.sub(r"[^\d]", "", phone).lstrip("0")


def facebook_conversion_events(event: dict) -> list[dict]:
    etype = event.get("type")
    if etype not in ("track", "page", "screen"):
        return []
    ctx = event.get("context") or {}
    traits = {**(ctx.get("traits") or {}), **(event.get("traits") or {})}
    phone = traits.get("phone")
    user_data = {
        "em": facebook_hash(traits.get("email")),
        "ph": facebook_hash(sanitize_phone(phone)) if phone else None,
        "external_id": facebook_hash(str(event["userId"]))
        if event.get("userId")
        else None,
        "client_ip_address": ctx.get("ip"),  # IP/UA travel unhashed
        "client_user_agent": ctx.get("userAgent"),
        "fbc": (ctx.get("clientIds") or {}).get("fbc"),
        "fbp": (ctx.get("clientIds") or {}).get("fbp"),
    }
    name = {"page": "PageView", "screen": "ScreenView"}.get(
        etype, event.get("event") or etype
    )
    props = event.get("properties") or {}
    return [
        {
            "event_name": name,
            "event_id": event.get("messageId"),
            "action_source": "website",
            "event_source_url": (ctx.get("page") or {}).get("url"),
            "user_data": {k: v for k, v in user_data.items() if v is not None},
            "custom_data": {
                k: v for k, v in props.items() if k not in ("width", "height")
            },
        }
    ]


# ---------------------------------------------------------------------------
# Segment proxy (M8, `segment-destination.ts`): forward the event as-is to
# a Segment-compatible endpoint — the identity mapping.
# ---------------------------------------------------------------------------


def segment_proxy_events(event: dict) -> list[dict]:
    return [{k: v for k, v in event.items() if not k.startswith("$")}]


# ---------------------------------------------------------------------------
# Typed fast path (oracle-checked): GA4 mapping over the testdata stream.
# ---------------------------------------------------------------------------


def ga4_mapping_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 on a typed stream: event-name dispatch + value coalescing as a
    plan-level when/otherwise — the whole mapping is codegen'd, no Python.
    The testdata names map onto the closest GA4 cases (purchase/signup ->
    named cases; the rest through adjustName default)."""
    ev = load_table(spark, sf_dir, "events")
    name = (
        F.when(F.col("event_type") == "purchase", "purchase")
        .when(F.col("event_type") == "signup", "sign_up")
        .when(F.col("event_type") == "click", "select_item")
        .otherwise(
            F.substring(
                F.regexp_replace(F.col("event_type"), "[^a-zA-Z0-9_]", "_"), 1, 40
            )
        )
    )
    return ev.select(
        F.col("event_id").cast("string").alias("message_id"),
        name.alias("ga4_name"),
        F.when(F.col("event_type").isin("purchase", "signup"), F.col("value"))
        .otherwise(F.lit(None))
        .alias("value"),
        F.md5(
            F.concat_ws("_", F.col("event_id").cast("string"), F.col("event_type"))
        ).alias("insert_id"),
        F.lit(1).alias("engagement_time_msec"),
    )


GA4_MAPPING_SQL = """
SELECT CAST(event_id AS VARCHAR) AS message_id,
       CASE event_type
         WHEN 'purchase' THEN 'purchase'
         WHEN 'signup' THEN 'sign_up'
         WHEN 'click' THEN 'select_item'
         ELSE substring(regexp_replace(event_type, '[^a-zA-Z0-9_]', '_', 'g'), 1, 40)
       END AS ga4_name,
       CASE WHEN event_type IN ('purchase', 'signup') THEN value END AS value,
       md5(CAST(event_id AS VARCHAR) || '_' || event_type) AS insert_id,
       1 AS engagement_time_msec
FROM events
"""

def mixpanel_mapping_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 on a typed stream: the import-event projection — distinct_id
    resolution, md5 $insert_id (F11), epoch-millis time. All codegen."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("event"),
        F.concat(F.lit("u"), F.col("user_id")).alias("distinct_id"),
        F.md5(
            F.concat_ws("_", F.col("event_id").cast("string"), F.col("event_type"))
        ).alias("insert_id"),
        F.unix_millis(F.col("ts")).alias("time"),
        F.col("value"),
    )


MIXPANEL_MAPPING_SQL = """
SELECT event_type AS event,
       'u' || user_id AS distinct_id,
       md5(CAST(event_id AS VARCHAR) || '_' || event_type) AS insert_id,
       epoch_ms(make_timestamp(epoch_ns(ts) // 1000)) AS time,
       value
FROM events
"""

QUERIES = {
    "ga4_mapping_typed": ga4_mapping_typed,
    "mixpanel_mapping_typed": mixpanel_mapping_typed,
}
ORACLE = {
    "ga4_mapping_typed": GA4_MAPPING_SQL,
    "mixpanel_mapping_typed": MIXPANEL_MAPPING_SQL,
}
