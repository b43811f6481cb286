"""Data-layout semantics: event dict -> [(table, row dict)].

Pure Python (no Spark imports) so the golden-fixture tests run instantly and
the same function body executes inside the Arrow-batched mapInPandas wrapper
in layouts.py.

Behavioral contract re-implemented from the reference
(`libs/core-functions/src/functions/bulker-destination.ts:57-335`):

- `segment` (multi-table): identify->identifies, group->groups,
  page/screen->plural(type); track fans out into TWO rows — a base row
  (without properties) to `tracks` plus the full row to a table named after
  the event — when the event has a name (`:263-267`, plural `:310-323`).
- `segment-single-table` (default): every type -> `events`; traits merged
  under context.traits, group_id promoted to context.group_id, `type` kept
  (`:165-261`).
- `jitsu-legacy`: Jitsu-classic flat schema (eventn_ctx_event_id, doc_*,
  user.*, parsed_ua.*, utm, location, track props at top level) (`:57-152`).
- `passthrough`: event as-is minus the table-override key (`:329`).
- `JITSU_TABLE_NAME` overrides the routed table for any layout
  (`:255-257,151`).
- snake_case key rewrite over the whole tree unless keepOriginalNames
  (`:29-41`; strings.ts:11-35).
"""

from __future__ import annotations

from typing import Any
from urllib.parse import urlparse

from ..functions.strings import snake_case, snake_case_tree

TABLE_NAME_PARAMETER = "JITSU_TABLE_NAME"

# Core AnalyticsServerEvent fields that layouts treat specially.
_IDENTIFY_OMIT = ["context", "properties", "traits", "type", TABLE_NAME_PARAMETER]


def plural(s: str) -> str:
    return {
        "identify": "identifies",
        "page": "pages",
        "track": "tracks",
        "group": "groups",
    }.get(s, s)


def anonymize_ip(ip: str | None) -> str | None:
    if not ip:
        return None
    parts = ip.split(".")
    if len(parts) == 4:
        return f"{parts[0]}.{parts[1]}.{parts[2]}.0"
    return None


def _is_obj(v: Any) -> bool:
    return isinstance(v, dict)


def _transfer(target: dict, source: Any, omit: list[str] | None = None, *, snake: bool) -> None:
    """Merge source object's entries into target (last write wins)."""
    if not _is_obj(source):
        return
    for k, v in source.items():
        if omit and k in omit:
            continue
        if snake:
            target[snake_case(k)] = snake_case_tree(v)
        else:
            target[k] = v


def _transfer_value(target: dict, key: str, value: Any, *, snake: bool) -> None:
    if value is None:
        return
    target[key] = snake_case_tree(value) if snake else value


def _get(d: Any, *path, default=None):
    for p in path:
        if not _is_obj(d):
            return default
        d = d.get(p)
    return d if d is not None else default


def segment_layout(
    event: dict, single_table: bool, keep_original_names: bool = False
) -> list[tuple[str, dict]]:
    sn = not keep_original_names
    etype = event.get("type")
    ctx = event.get("context") or {}
    props = event.get("properties") or {}
    traits = event.get("traits") or {}
    transformed: dict = {}
    base_track_flat: dict | None = None

    if etype == "identify":
        if single_table:
            transformed = {"context": {"traits": {}}}
            _transfer(transformed["context"], ctx, ["groupId", "traits"], snake=sn)
            _transfer(transformed["context"]["traits"], ctx.get("traits"), ["groupId"], snake=sn)
            _transfer(transformed["context"]["traits"], traits, ["groupId"], snake=sn)
            _transfer_value(
                transformed["context"],
                "group_id",
                _get(ctx, "groupId") or _get(traits, "groupId") or _get(ctx, "traits", "groupId"),
                snake=sn,
            )
            _transfer(transformed, props, snake=sn)
            _transfer(transformed, event, _IDENTIFY_OMIT, snake=sn)
        else:
            transformed = {"context": {}}
            _transfer(transformed["context"], ctx, ["traits"], snake=sn)
            _transfer(transformed, props, snake=sn)
            _transfer(transformed, ctx.get("traits"), snake=sn)
            _transfer(transformed, traits, snake=sn)
            _transfer(transformed, event, _IDENTIFY_OMIT, snake=sn)
    elif etype == "group":
        if single_table:
            transformed = {"context": {"group": {}}}
            _transfer(transformed["context"], ctx, snake=sn)
            _transfer(transformed["context"]["group"], traits, snake=sn)
            _transfer_value(transformed["context"], "group_id", event.get("groupId"), snake=sn)
            _transfer(transformed, props, snake=sn)
            _transfer(
                transformed,
                event,
                ["context", "properties", "traits", "type", "groupId", TABLE_NAME_PARAMETER],
                snake=sn,
            )
        else:
            transformed = {"context": {}}
            _transfer(transformed["context"], ctx, ["traits"], snake=sn)
            _transfer(transformed, props, snake=sn)
            _transfer(transformed, traits, snake=sn)
            _transfer(transformed, event, _IDENTIFY_OMIT, snake=sn)
    elif etype == "track":
        if single_table:
            transformed = {"context": {"traits": {}}}
            _transfer(transformed["context"], ctx, ["groupId", "traits"], snake=sn)
            _transfer(transformed["context"]["traits"], ctx.get("traits"), ["groupId"], snake=sn)
            _transfer(transformed["context"]["traits"], _get(props, "traits"), ["groupId"], snake=sn)
            _transfer_value(
                transformed["context"],
                "group_id",
                _get(ctx, "groupId") or _get(ctx, "traits", "groupId"),
                snake=sn,
            )
            _transfer(transformed, props, ["traits"], snake=sn)
            _transfer(transformed, event, ["context", "properties", "type", TABLE_NAME_PARAMETER], snake=sn)
        else:
            base_track_flat = {}
            _transfer(base_track_flat, event, ["properties", "type", TABLE_NAME_PARAMETER], snake=sn)
            transformed = {}
            _transfer(transformed, props, snake=sn)
            _transfer(transformed, event, ["properties", "type", TABLE_NAME_PARAMETER], snake=sn)
    else:  # page / screen / alias / anything else
        if single_table:
            transformed = {"context": {"traits": {}}}
            _transfer(transformed["context"], ctx, ["groupId", "traits"], snake=sn)
            _transfer(transformed["context"]["traits"], ctx.get("traits"), ["groupId"], snake=sn)
            _transfer_value(
                transformed["context"],
                "group_id",
                _get(ctx, "groupId") or _get(ctx, "traits", "groupId"),
                snake=sn,
            )
            _transfer(transformed, props, snake=sn)
            _transfer(transformed, event, ["context", "properties", TABLE_NAME_PARAMETER], snake=sn)
        else:
            transformed = {}
            _transfer(transformed, props, snake=sn)
            _transfer(transformed, event, ["properties", TABLE_NAME_PARAMETER], snake=sn)

    override = event.get(TABLE_NAME_PARAMETER)
    if override:
        transformed["type"] = etype
        return [(override, transformed)]
    if single_table:
        transformed["type"] = etype
        return [("events", transformed)]
    if etype == "track" and event.get("event"):
        return [("tracks", base_track_flat), (event["event"], transformed)]
    # Missing type: the reference's ingest guarantees `type`; as a pipeline
    # we must not crash on a malformed event — route to the default table.
    return [(plural(etype) if etype else "events", transformed)]


def jitsu_legacy_layout(event: dict, keep_original_names: bool = False) -> list[tuple[str, dict]]:
    ctx = event.get("context") or {}
    props = event.get("properties") or {}
    geo = ctx.get("geo") or {}
    ua = event.get("_parsed_ua") or {}  # enrichment attaches parsed UA here
    url_str = _get(ctx, "page", "url") or _get(props, "url")
    host = path = search = None
    if url_str:
        try:
            u = urlparse(url_str)
            host, path = u.hostname, u.path
            search = f"?{u.query}" if u.query else ""
        except ValueError:
            pass

    merged_traits = {**(_get(ctx, "traits", default={}) or {}), **(event.get("traits") or {})}
    user = {
        "id": event.get("userId"),
        "anonymous_id": event.get("anonymousId"),
        "email": merged_traits.get("email"),
        "name": merged_traits.get("name"),
        **{k: v for k, v in merged_traits.items() if k not in ("email", "name")},
    }
    screen = ctx.get("screen") or {}
    flat: dict[str, Any] = {
        "anon_ip": anonymize_ip(ctx.get("ip")),
        "api_key": event.get("writeKey") or "",
        "click_id": {},
        "doc_encoding": _get(ctx, "page", "encoding") or _get(props, "encoding"),
        "doc_host": host,
        "doc_path": path,
        "doc_search": search,
        "eventn_ctx_event_id": event.get("messageId"),
        "event_type": event.get("event") or event.get("type"),
        "local_tz_offset": _get(ctx, "page", "timezoneOffset") or _get(props, "timezoneOffset"),
        "page_title": _get(ctx, "page", "title"),
        "referer": _get(ctx, "page", "referrer"),
        "screen_resolution": f"{screen.get('width') or 0}x{screen.get('height') or 0}",
        "source_ip": ctx.get("ip"),
        "src": "jitsu",
        "url": url_str or "",
        "user": user,
        "location": (
            {
                "city": _get(geo, "city", "name"),
                "continent": _get(geo, "continent", "code"),
                "country": _get(geo, "country", "code"),
                "country_name": _get(geo, "country", "name"),
                "latitude": _get(geo, "location", "latitude"),
                "longitude": _get(geo, "location", "longitude"),
                "region": _get(geo, "region", "code"),
                "zip": _get(geo, "postalCode", "code"),
                "timezone": _get(geo, "location", "timezone"),
            }
            if geo
            else None
        ),
        "ids": (
            {
                "ga": _get(ctx, "clientIds", "ga4", "clientId"),
                "fbp": _get(ctx, "clientIds", "fbp"),
                "fbc": _get(ctx, "clientIds", "fbc"),
            }
            if ctx.get("clientIds")
            else None
        ),
        "parsed_ua": (
            {
                "os_family": _get(ua, "os", "name"),
                "os_version": _get(ua, "os", "version"),
                "ua_family": _get(ua, "browser", "name"),
                "ua_version": _get(ua, "browser", "version"),
                "device_brand": _get(ua, "device", "vendor"),
                "device_type": _get(ua, "device", "type"),
                "device_model": _get(ua, "device", "model"),
                "bot": ua.get("bot"),
            }
            if ua
            else None
        ),
        "user_agent": ctx.get("userAgent"),
        "user_language": ctx.get("locale"),
        "utc_time": event.get("timestamp"),
        "_timestamp": event.get("timestamp"),
        "utm": ctx.get("campaign"),
        "vp_size": f"{screen.get('innerWidth') or 0}x{screen.get('innerHeight') or 0}",
    }
    if event.get("type") == "track":
        for k, v in props.items():
            flat[k] = v
    if not keep_original_names:
        flat = snake_case_tree(flat)
    # drop keys whose value is None-by-construction (reference removeUndefined
    # drops JS `undefined`; JSON null survives, so only strip the fields this
    # builder itself left unset)
    flat = {k: v for k, v in flat.items() if v is not None}
    return [(event.get(TABLE_NAME_PARAMETER) or "events", flat)]


def passthrough_layout(event: dict) -> list[tuple[str, dict]]:
    table = event.get(TABLE_NAME_PARAMETER) or "events"
    return [(table, {k: v for k, v in event.items() if k != TABLE_NAME_PARAMETER})]


LAYOUTS = {
    "segment": lambda e, keep=False: segment_layout(e, False, keep),
    "segment-single-table": lambda e, keep=False: segment_layout(e, True, keep),
    "jitsu-legacy": lambda e, keep=False: jitsu_legacy_layout(e, keep),
    "passthrough": lambda e, keep=False: passthrough_layout(e),
}


def map_event(event: dict, layout: str = "segment-single-table", keep_original_names: bool = False):
    return LAYOUTS[layout](event, keep_original_names)
