from gordo_spark.streaming.scoring import (
    stream_resample_wide,
    stream_anomaly_select,
    score_stream,
)
from gordo_spark.streaming.stateful import ewma_stream
from gordo_spark.streaming.quality import stream_source_quality
from gordo_spark.streaming.dedup import (
    with_content_key,
    dedup_ids_within_watermark,
    dedup_ids_exact,
    sessionize_stream,
)

__all__ = [
    "stream_resample_wide",
    "stream_anomaly_select",
    "score_stream",
    "ewma_stream",
    "stream_source_quality",
    "with_content_key",
    "dedup_ids_within_watermark",
    "dedup_ids_exact",
    "sessionize_stream",
]
