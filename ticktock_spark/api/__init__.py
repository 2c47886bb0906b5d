from ticktock_spark.api.http import TsdbHttpServer

__all__ = ["TsdbHttpServer"]
