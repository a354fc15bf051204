"""Probe Spark Connect availability in this environment (tws_probe twin).

The engine's query surface is DataFrame-only by design, and the two
sparkContext dependencies in shared helpers now degrade gracefully
(`catalog.spread` falls back to the shuffle conf + input-file proxy,
`operators.udf._cogroup_buckets` to the shuffle conf), so the registry
SHOULD run under a Connect session. Whether it CAN here is environmental:
the Connect server jar ships in pyspark's jars
(spark-connect_2.13-4.1.2.jar), but the Python client requires grpcio +
protobuf, which this container does not have and must not pip install.

Exit codes: 0 = Connect session works (run the gate replica against it!),
2 = client runtime missing (environment defect, not a repo defect),
1 = unexpected failure worth reading.
"""

from __future__ import annotations

import sys


def main() -> int:
    try:
        import grpc  # noqa: F401
    except ImportError as exc:
        print(
            "Spark Connect server jar is present "
            "(pyspark/jars/spark-connect_2.13-4.1.2.jar) but the Python "
            f"client runtime is missing ({exc}) — environment defect, not "
            "a repo defect. The DataFrame-only query surface plus the "
            "spread()/_cogroup_buckets fallbacks are Connect-ready; once "
            "grpcio+protobuf exist, run "
            "`SPARK_REMOTE=local python tools/verify_bare.py` to gate the "
            "registry on a Connect session."
        )
        return 2
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.remote("local[4]").getOrCreate()
        n = spark.range(10).count()
        print(f"Connect session works (range(10).count()={n})")
        return 0
    except Exception as exc:  # pragma: no cover
        print(f"Connect session failed unexpectedly: {exc}")
        return 1


if __name__ == "__main__":
    sys.exit(main())
