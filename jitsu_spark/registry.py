"""Aggregated query + oracle registries (the SURVEY.md §2 coverage surface).

Every operator module contributes QUERIES (name -> (spark, sf_dir) ->
DataFrame) and ORACLE (name -> DuckDB SQL). Names are stable contract keys:
the driver hash-compares each pair at sf0.01.
"""

from __future__ import annotations

from . import gateway, multimodal
from .events import destinations, destinations_crm, layouts
from .plans import throttle
from .operators import (
    asof,
    clustering,
    corpus,
    corpus_stats,
    dedup,
    embedding_prep,
    pq,
    events_ops,
    geo,
    identity,
    packing,
    profiles,
    quality_filters,
    relational,
    relational_ext,
    reports,
    rollup,
    sampling,
    similarity,
    text_embed,
    text_ops,
)

_MODULES = [
    relational,
    relational_ext,
    asof,
    sampling,
    packing,
    corpus,
    events_ops,
    reports,
    text_ops,
    quality_filters,
    dedup,
    corpus_stats,
    similarity,
    clustering,
    text_embed,
    pq,
    embedding_prep,
    layouts,
    profiles,
    identity,
    geo,
    gateway,
    destinations,
    destinations_crm,
    multimodal,
    rollup,
    throttle,
]

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        assert _k not in QUERIES, f"duplicate query name {_k}"
        QUERIES[_k] = _v
    ORACLES.update(getattr(_m, "ORACLE", {}))
