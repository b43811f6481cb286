"""Builtin registry parity (U6) — every id in the reference's
builtinFunctions map (index.ts:23-51) resolves, with the reference's
chain semantics for the degenerate entries."""

from __future__ import annotations

from jitsu_spark.plans.builtins import builtin_ids, get_builtin_function

REFERENCE_IDS = {
    "builtin.destination.bulker",
    "builtin.destination.mixpanel",
    "builtin.destination.intercom",
    "builtin.destination.segment-proxy",
    "builtin.destination.june",
    "builtin.destination.braze",
    "builtin.destination.ga4",
    "builtin.destination.webhook",
    "builtin.destination.posthog",
    "builtin.destination.mongodb",
    "builtin.destination.amplitude",
    "builtin.destination.facebook-conversions",
    "builtin.destination.hubspot",
    "builtin.destination.devnull",
    "builtin.destination.tag",
    "builtin.destination.gtm",
    "builtin.destination.logrocket",
    "builtin.destination.ga4-tag",
    "builtin.transformation.user-recognition",
}


def test_every_reference_builtin_resolves():
    assert set(builtin_ids()) == REFERENCE_IDS
    for fid in REFERENCE_IDS:
        assert get_builtin_function(fid) is not None


def test_prefix_fix():
    # index.ts:54: ids without the builtin. prefix get it prepended
    assert get_builtin_function("destination.mixpanel").id == (
        "builtin.destination.mixpanel"
    )
    assert get_builtin_function("builtin.destination.mixpanel").kind == "api"
    assert get_builtin_function("nope.nothing") is None


def test_degenerate_semantics():
    assert get_builtin_function("builtin.destination.devnull").kind == "drop"
    for tag in ("tag", "gtm", "logrocket", "ga4-tag"):
        assert get_builtin_function(f"builtin.destination.{tag}").kind == "noop"


def test_api_mappers_are_callable():
    spec = get_builtin_function("builtin.destination.mixpanel")
    out = spec.impl({"type": "track", "event": "E", "userId": "u1",
                     "timestamp": "2024-01-01T00:00:00Z", "messageId": "m1"})
    assert isinstance(out, list) and out
