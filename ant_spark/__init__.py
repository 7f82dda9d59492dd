"""ant_spark — a PySpark-native web-crawl analytics engine.

A brand-new implementation (NOT a port) with the capabilities of the
Go crawler library ``yields/ant`` (reference at /root/reference),
re-expressed Spark-first:

- the fetch-parse-enqueue loop (reference ``engine.go:137-165``) becomes an
  iterative bulk-synchronous DataFrame job over frontier/seen/fetched tables
  (``ant_spark.engine.Engine``);
- the seen-set (``dedupe.go``) becomes an anti-join plus a partitioned
  bloom/cuckoo membership sidecar (``ant_spark.operators.dedupe``);
- politeness / rate limits (``limiters.go``) become per-host budget windows
  (``ant_spark.operators.politeness``);
- link & text extraction (``page.go``) becomes one fused vectorized Arrow UDF
  over ``html:binary`` (``ant_spark.functions.parse``).

Everything here is plain DataFrame API + Arrow-vectorized pandas UDFs; no
RDDs, no per-row Python in the hot path.
"""

from ant_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
