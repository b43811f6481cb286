"""HubSpot + Intercom destination mappings (M8, the two CRM destinations).

Reference control flow re-expressed as pure event -> ops projections (the
batch analogue of the per-event HTTP call sequence — each op is one API
call the reference would issue, minus the read-modify-write round trips
which a MERGE-style sink replays as upserts):

- HubSpot (`libs/core-functions/src/functions/hubspot-destination.ts:245-305`):
  identify (userId + traits.email) -> contact upsert with split first/last
  name, `jitsu_user_id` marker property, snake_cased custom props
  (`:20-26,73,83`); group -> company upsert with `jitsu_group_id`
  (`:272-283`); contact<->company association when both ids are present
  (`:284-286`); optional behavioral page-view events keyed by email
  (`:287-304`).
- Intercom (`intercom-destination.ts:303-401`): identify -> contact upsert
  (requires traits.email, `:197-202`); group -> company upsert (`:80-124`);
  contact-to-company attach when groupId+userId (`:312-340`); every other
  type -> event payload with flattened context metadata (`:342-381`) and an
  optional last-seen update (`:382-400`).

These run as chain user-functions inside the single mapInPandas stage; the
`*_mapping_typed` variants below are the plan-level (whole-stage-codegen)
projections over the typed events stream, oracle-checked against DuckDB.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import snake_case
from ..tables import load_table

JITSU_USER_ID_PROPERTY = "jitsu_user_id"  # hubspot-destination.ts:16
JITSU_GROUP_ID_PROPERTY = "jitsu_group_id"  # hubspot-destination.ts:18


def split_name(name: str | None) -> tuple[str | None, str | None]:
    """hubspot-destination.ts:20-26 — first token, rest rejoined or None."""
    if not name:
        return None, None
    first, *rest = name.split(" ")
    return first, (" ".join(rest) or None)


def _snake_props(props: dict) -> dict:
    """Custom property keys go through idToSnakeCaseFast before the
    property-exists check (hubspot-destination.ts:73,83)."""
    return {snake_case(k): v for k, v in props.items()}


def hubspot_events(event: dict, props: dict | None = None) -> list[dict]:
    """One event -> HubSpot API ops (hubspot-destination.ts:245-305)."""
    props = props or {}
    etype = event.get("type")
    traits = event.get("traits") or {}
    evp = event.get("properties") or {}
    ops: list[dict] = []
    has_contact = has_company = False

    if etype == "identify" and event.get("userId") and traits.get("email"):
        first, last = split_name(traits.get("name"))
        ops.append(
            {
                "op": "contact-upsert",
                "properties": {
                    "email": traits["email"],
                    "firstname": first,
                    "lastname": last,
                    JITSU_USER_ID_PROPERTY: event["userId"],
                    **_snake_props(
                        {
                            k: v
                            for k, v in traits.items()
                            if k not in ("name", "email")
                        }
                    ),
                },
            }
        )
        has_contact = True
        if event.get("groupId"):
            # company is created-if-missing but never updated from an
            # identify (doNotUpdate, hubspot-destination.ts:264-270)
            ops.append(
                {
                    "op": "company-upsert",
                    "do_not_update": True,
                    "properties": {
                        "name": f"Company {event['groupId']}",
                        JITSU_GROUP_ID_PROPERTY: event["groupId"],
                    },
                }
            )
            has_company = True

    if etype == "group" and event.get("groupId"):
        ops.append(
            {
                "op": "company-upsert",
                "do_not_update": False,
                "properties": {
                    "name": traits.get("name") or f"Company {event['groupId']}",
                    JITSU_GROUP_ID_PROPERTY: event["groupId"],
                    **_snake_props(
                        {k: v for k, v in traits.items() if k != "name"}
                    ),
                },
            }
        )
        has_company = True
        if event.get("userId"):
            # the reference resolves the contact by jitsu id (:280-282);
            # the batch shape carries the key for the sink-side lookup
            has_contact = True

    if has_contact and has_company:
        ops.append(
            {
                "op": "associate",
                "user_id": event.get("userId"),
                "group_id": event.get("groupId"),
                "association_type": "2",  # contact->company, :209-211
            }
        )

    email = traits.get("email") or evp.get("email")
    if email and props.get("sendPageViewEvents"):
        url = ((event.get("context") or {}).get("page") or {}).get(
            "url"
        ) or evp.get("url")
        ops.append(
            {
                "op": "behavioral-event",
                "email": email,
                "event_name": (
                    (event.get("event") or "track")
                    if etype == "track"
                    else etype
                ),
                "occurred_at": event.get("timestamp"),
                "properties": {"url": str(url)} if url else {},
                "uuid": event.get("messageId"),
            }
        )
    return ops


# ---------------------------------------------------------------------------
# Intercom
# ---------------------------------------------------------------------------

# metadata fields flattened from context (intercom-destination.ts:354-372)
_INTERCOM_CTX_META = {
    "libraryName": ("library", "name"),
    "libraryVersion": ("library", "version"),
    "osName": ("os", "name"),
    "osVersion": ("os", "version"),
    "networkCellular": ("network", "cellular"),
    "networkWifi": ("network", "wifi"),
    "appBuild": ("app", "build"),
    "appVersion": ("app", "version"),
    "appNamespace": ("app", "namespace"),
    "appName": ("app", "name"),
}


def _to_epoch_sec(timestamp) -> int:
    """toDate().getTime()/1000 rounded (intercom-destination.ts:126-137,351).
    Timestamps are required in the batch shape (injected, replayable) — the
    reference's wall-clock fallback is non-deterministic by design."""
    if isinstance(timestamp, (int, float)):
        return round(timestamp / 1000)
    dt = datetime.fromisoformat(str(timestamp).replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return round(dt.timestamp())


def _iso(timestamp) -> str:
    if isinstance(timestamp, (int, float)):
        return (
            datetime.fromtimestamp(timestamp / 1000, tz=timezone.utc)
            .isoformat()
            .replace("+00:00", "Z")
        )
    return str(timestamp)


def intercom_events(event: dict, props: dict | None = None) -> list[dict]:
    """One event -> Intercom API ops (intercom-destination.ts:303-401)."""
    props = props or {}
    etype = event.get("type")
    ctx = event.get("context") or {}
    traits = event.get("traits") or {}
    ops: list[dict] = []

    if etype == "identify":
        if traits.get("email"):
            name = traits.get("name") or (
                f"{traits['firstName']} {traits['lastName']}"
                if traits.get("firstName") and traits.get("lastName")
                else None
            )
            ops.append(
                {
                    "op": "contact-upsert",
                    "role": "user",
                    "external_id": event.get("userId"),
                    "email": traits["email"],
                    "last_seen_at": _iso(event.get("timestamp")),
                    "name": name,
                    "phone": traits.get("phone"),
                    "custom_attributes": {},  # :218 (reference sends empty)
                }
            )
        # else: skipped — Intercom requires email (:197-202)
    elif etype == "group":
        if event.get("groupId"):
            ops.append(
                {
                    "op": "company-upsert",
                    "company_id": event["groupId"],
                    "name": traits.get("name"),
                    "custom_attributes": {},  # :88
                }
            )

    if (
        etype in ("identify", "group")
        and event.get("groupId")
        and event.get("userId")
    ):
        ops.append(
            {
                "op": "attach-contact-to-company",
                "user_id": event["userId"],
                "group_id": event["groupId"],
            }
        )

    if etype not in ("identify", "group"):
        email = (ctx.get("traits") or {}).get("email") or traits.get("email")
        meta = {
            **(
                {f"{etype}_name": event["name"]}
                if etype in ("page", "screen") and event.get("name")
                else {}
            ),
            **(event.get("properties") or {}),
            "url": ((ctx.get("page") or {}).get("url")),
            "eventName": event.get("name"),
            "ip": ctx.get("ip"),
            "timezone": ctx.get("timezone"),
            "instanceId": ctx.get("instanceId"),
            **{
                k: (ctx.get(parent) or {}).get(leaf)
                for k, (parent, leaf) in _INTERCOM_CTX_META.items()
            },
        }
        ops.append(
            {
                "op": "event",
                "type": "event",
                "event_name": (
                    event.get("event")
                    if etype == "track"
                    else ("page-view" if etype == "page" else etype)
                ),
                "created_at": _to_epoch_sec(event.get("timestamp")),
                "user_id": event.get("userId"),
                "email": email,
                "metadata": meta,
            }
        )
        if props.get("updateLastSeenOnEveryEvent") and (
            email or event.get("userId")
        ):
            ops.append(
                {
                    "op": "update-last-seen",
                    "user_id": event.get("userId"),
                    "email": email,
                    "last_seen_at": _to_epoch_sec(event.get("timestamp")),
                }
            )
    return ops


# ---------------------------------------------------------------------------
# Typed fast paths (oracle-checked): the same projections plan-level over the
# typed events stream — zero Python in the hot path.
# ---------------------------------------------------------------------------


def hubspot_mapping_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HubSpot behavioral-event + contact projection on the typed stream.

    The typed stream has no email/name columns, so the identity columns are
    derived deterministically from user_id (the same convention both sides
    of the oracle share): email `user<N>@example.com`, display name
    `User <N>` split via splitName semantics (first token / rest)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("uuid"),
        F.concat(F.lit("user"), F.col("user_id"), F.lit("@example.com")).alias(
            "email"
        ),
        # track events use the event name with a "track" fallback
        # (hubspot-destination.ts:297)
        F.coalesce(F.col("event_type"), F.lit("track")).alias("event_name"),
        F.col("ts").alias("occurred_at"),
        F.lit("User").alias("firstname"),
        F.col("user_id").cast("string").alias("lastname"),
        F.col("user_id").cast("string").alias("jitsu_user_id"),
        F.get_json_object("props", "$.k").cast("int").alias("property_k"),
    )


HUBSPOT_MAPPING_SQL = """
SELECT CAST(event_id AS VARCHAR) AS uuid,
       'user' || user_id || '@example.com' AS email,
       coalesce(event_type, 'track') AS event_name,
       make_timestamp(epoch_ns(ts) // 1000) AS occurred_at,
       'User' AS firstname,
       CAST(user_id AS VARCHAR) AS lastname,
       CAST(user_id AS VARCHAR) AS jitsu_user_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS property_k
FROM events
"""


def intercom_mapping_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intercom event projection on the typed stream: page-view renaming,
    epoch-second created_at (intercom-destination.ts:350-351), metadata
    passthrough from props."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("event_type") == "view", F.lit("page-view"))
        .otherwise(F.col("event_type"))
        .alias("event_name"),
        F.col("ts").cast("long").alias("created_at"),
        F.col("user_id").cast("string").alias("user_id"),
        F.concat(F.lit("user"), F.col("user_id"), F.lit("@example.com")).alias(
            "email"
        ),
        F.get_json_object("props", "$.k").cast("int").alias("metadata_k"),
    )


INTERCOM_MAPPING_SQL = """
SELECT CASE WHEN event_type = 'view' THEN 'page-view' ELSE event_type END
         AS event_name,
       CAST(floor(epoch(make_timestamp(epoch_ns(ts) // 1000))) AS BIGINT)
         AS created_at,
       CAST(user_id AS VARCHAR) AS user_id,
       'user' || user_id || '@example.com' AS email,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS metadata_k
FROM events
"""

QUERIES = {
    "hubspot_mapping_typed": hubspot_mapping_typed,
    "intercom_mapping_typed": intercom_mapping_typed,
}
ORACLE = {
    "hubspot_mapping_typed": HUBSPOT_MAPPING_SQL,
    "intercom_mapping_typed": INTERCOM_MAPPING_SQL,
}
