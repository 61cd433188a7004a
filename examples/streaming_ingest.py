#!/usr/bin/env python
"""Streaming ingest end-to-end: firehose -> lake -> compaction -> rollup.

    python examples/streaming_ingest.py [sf_dir] [work_dir]

The loop a production deployment runs continuously, demonstrated with an
availableNow pass over the test events:

 1. readStream over the raw source (stand-in for Kafka/queue)
 2. stream_to_lake     — checkpointed foreachBatch append into the
                         date-partitioned layout
 3. compact_sensor_lake — fold per-batch small files
 4. rollup_sensor_lake  — maintain the hourly continuous aggregate
 5. SensorLakeProvider  — a partition-pruned training read over the result
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gordo_spark import get_spark
from gordo_spark.sources.lake import (
    compact_sensor_lake,
    rollup_sensor_lake,
    stream_to_lake,
)
from gordo_spark.sources.providers import EventsAsSensorProvider, provider_from_dict


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gordo_spark_streaming_ingest"
    spark = get_spark("streaming_ingest")

    long = EventsAsSensorProvider(sf).read(spark, ["click", "view", "purchase"])
    src = f"{work}/source"
    long.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(long.schema).parquet(src)
    q = stream_to_lake(
        stream, f"{work}/lake", f"{work}/ckpt", trigger={"availableNow": True}
    )
    q.awaitTermination(120)

    compact_sensor_lake(spark, f"{work}/lake", f"{work}/lake_compacted")
    rollup_sensor_lake(spark, f"{work}/lake_compacted", f"{work}/rollup_1h")

    prov = provider_from_dict(
        {"type": "SensorLakeProvider", "path": f"{work}/rollup_1h"}
    )
    sample = prov.read(spark, ["click"], "2024-01-03 00:00:00", "2024-01-06 00:00:00")
    print("ingested rows:", spark.read.parquet(f"{work}/lake").count())
    print("hourly rollup rows:", spark.read.parquet(f"{work}/rollup_1h").count())
    print("pruned 3-day hourly read for 'click':", sample.count())
    sample.show(5)


if __name__ == "__main__":
    main()
