from ticktock_spark.streaming.ingest import stream_put_lines, write_datapoints_stream
from ticktock_spark.streaming.rollup import streaming_rollup_1h

__all__ = ["stream_put_lines", "write_datapoints_stream", "streaming_rollup_1h"]
