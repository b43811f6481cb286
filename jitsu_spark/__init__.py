"""jitsu_spark — a PySpark-native analytics engine with the capabilities of
jitsucom/jitsu (event pipeline, identity stitching, profile building, metrics
rollups) plus large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing).

Architecture: everything is a DataFrame -> DataFrame transform declared with
the PySpark DataFrame/SQL API so Catalyst owns the physical plan (pushdown,
pruning, broadcast/AQE). Python UDFs appear only where semantics genuinely
require them (profile UDAF, multimodal decode), always Arrow-batched.
"""

__version__ = "0.1.0"
