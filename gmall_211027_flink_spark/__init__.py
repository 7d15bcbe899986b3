"""gmall_211027_flink_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference Flink retail warehouse (``1398042095/gmall-211027-flink``,
surveyed in SURVEY.md), re-expressed Spark-first:

- batch analytics (the reference's ADS layer) as Spark SQL / DataFrame plans,
- the DWD/DWS operator inventory (filters, CDC-envelope projection,
  stream-stream & lookup joins, tumbling windows, stateful dedup, CEP-style
  bounce detection) as composable DataFrame transforms + Structured
  Streaming stateful processors,
- plus large-scale training-data-pipeline operators (dedup families,
  similarity search, text analysis, multimodal column plumbing).

Design notes: everything is declared via the DataFrame/SQL API so Catalyst
handles pushdown/pruning/join-strategy; Python UDFs appear only where the
semantics genuinely aren't expressible (Arrow-batched, never per-row).
"""

from gmall_211027_flink_spark.session import get_spark
from gmall_211027_flink_spark.registry import QUERIES, ORACLES

__all__ = ["get_spark", "QUERIES", "ORACLES"]
