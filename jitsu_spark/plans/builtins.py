"""Builtin function registry (U6) — full parity with
`libs/core-functions/src/index.ts:23-56`.

The reference resolves chain entries like `builtin.destination.mixpanel`
to packaged functions. In the Spark engine each id maps to a descriptor
naming how the engine realizes it:
- warehouse -> the bulker path (`sinks.WarehouseSink` routing / JDBC /
  cloud writer specs)
- api       -> an event-mapping function (`events.destinations*`) fed to
  `sinks_api.mapped_destination_sink`
- noop      -> device-side tag destinations; server-side they pass the
  event through unchanged (the reference registers `() => undefined`)
- drop      -> devnull's chain form (`() => null`); as a SINK devnull
  still evaluates the chain (sinks_api.devnull_sink)
- transformation -> a DataFrame-level transform (Catalyst-visible)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class BuiltinSpec:
    id: str
    kind: str  # warehouse | api | noop | drop | transformation
    # api kind: the event-mapping callable (event dict -> payload(s));
    # transformation kind: DataFrame -> DataFrame
    impl: Callable[..., Any] | None = None


def _api(name: str, mapper: Callable) -> BuiltinSpec:
    return BuiltinSpec(f"builtin.destination.{name}", "api", mapper)


def _registry() -> dict[str, BuiltinSpec]:
    from ..events import destinations as d
    from ..events import destinations_crm as crm
    from ..operators.identity import user_recognition_backfill

    specs = [
        BuiltinSpec("builtin.destination.bulker", "warehouse"),
        _api("mixpanel", d.mixpanel_events),
        _api("intercom", crm.intercom_events),
        _api("segment-proxy", d.segment_proxy_events),
        _api("june", d.june_events),
        _api("braze", d.braze_events),
        _api("ga4", d.ga4_event),
        _api("webhook", lambda ev: ev),  # whole event POSTs as-is
        _api("posthog", d.posthog_events),
        _api("mongodb", lambda ev: ev),  # document insert of the event
        _api("amplitude", d.amplitude_events),
        _api("facebook-conversions", d.facebook_conversion_events),
        _api("hubspot", crm.hubspot_events),
        # devnull: `() => null` in the chain = drop (index.ts:37)
        BuiltinSpec("builtin.destination.devnull", "drop"),
        # device-side tag destinations: `() => undefined` = pass-through
        BuiltinSpec("builtin.destination.tag", "noop"),
        BuiltinSpec("builtin.destination.gtm", "noop"),
        BuiltinSpec("builtin.destination.logrocket", "noop"),
        BuiltinSpec("builtin.destination.ga4-tag", "noop"),
        BuiltinSpec(
            "builtin.transformation.user-recognition",
            "transformation",
            user_recognition_backfill,
        ),
    ]
    return {s.id: s for s in specs}


_REGISTRY: dict[str, BuiltinSpec] | None = None


def get_builtin_function(func_id: str) -> BuiltinSpec | None:
    """Port of `getBuiltinFunction` (index.ts:53-56): an id without the
    `builtin.` prefix gets it prepended before lookup (so
    "destination.mixpanel" resolves; a bare "mixpanel" does NOT — it
    becomes "builtin.mixpanel", unknown — exactly the reference
    behavior)."""
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _registry()
    fixed = func_id if func_id.startswith("builtin.") else f"builtin.{func_id}"
    return _REGISTRY.get(fixed)


def builtin_ids() -> list[str]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _registry()
    return sorted(_REGISTRY)
