from petasearch_spark.streaming.events_stream import events_stream_hourly

__all__ = ["events_stream_hourly"]
