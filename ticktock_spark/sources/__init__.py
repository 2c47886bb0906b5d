from ticktock_spark.sources.events import events_to_datapoints

__all__ = ["events_to_datapoints"]
