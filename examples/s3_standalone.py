"""S3/MinIO session — the PySpark twin of reference
examples/s3_standalone.rs:15-47: env-credentialed object store + a
parquet directory registered and queried over s3://.

Spark translation: the reference's custom ObjectStoreRegistry
(reference src/object_store.rs:42-47) becomes four s3a configs; no
custom code runs per-query. Needs a reachable S3/MinIO endpoint:

  AWS_ACCESS_KEY_ID=... AWS_SECRET_ACCESS_KEY=... \
  AWS_ENDPOINT_URL=http://localhost:9000 \
  python examples/s3_standalone.py s3a://bucket/sample/
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballista_delta_spark.session import get_spark
from ballista_delta_spark.sources.registry import register_parquet


def main() -> None:
    spark = get_spark("s3-standalone")
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set("fs.s3a.access.key", os.environ["AWS_ACCESS_KEY_ID"])
    conf.set("fs.s3a.secret.key", os.environ["AWS_SECRET_ACCESS_KEY"])
    conf.set("fs.s3a.endpoint", os.environ.get(
        "AWS_ENDPOINT_URL", "http://localhost:9000"
    ))
    conf.set("fs.s3a.path.style.access", "true")

    url = sys.argv[1] if len(sys.argv) > 1 else "s3a://ballista/sample/"
    register_parquet(spark, "p", url)
    spark.sql("SELECT * FROM p LIMIT 20").show()
    spark.stop()


if __name__ == "__main__":
    main()
