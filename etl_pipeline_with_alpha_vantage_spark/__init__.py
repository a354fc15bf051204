"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (Alpha Vantage → validate →
transform → warehouse), re-expressed Spark-first and extended with the
relational / dedup / similarity / text / streaming operator surface a
large-scale training-data pipeline needs.

Layout
------
- ``session``    : SparkSession factory tuned for scale (AQE, Arrow, shuffle sizing)
- ``catalog``    : parquet table loading + temp-view registration
- ``registry``   : query/oracle registry backing ``__spark_entry__.py``
- ``pipeline``   : the reference's flagship ETL chain (SURVEY.md §2.A)
- ``operators``  : relational / window / asof / dedup / similarity / text ops
- ``sources``    : raw-zone JSON lake + rate-limited HTTP fetcher (replayable)
- ``sinks``      : idempotent upsert-ignore sink (anti-join append)
- ``streaming``  : Structured Streaming windows / watermark / dedup
"""

__version__ = "0.1.0"

# Driver-overhead: cache py4j reflection results (classes/packages/
# static methods — never field values) so each F.* call costs its one
# invocation RPC instead of three. Installed at package import so the
# cache is active for ANY session the query API touches, including the
# harness's bare sessions that never call session.get_spark(). See
# _py4j_cache for the safety argument; no-op under Spark Connect.
from . import _py4j_cache as _p4c  # noqa: E402

_p4c.install()
del _p4c
