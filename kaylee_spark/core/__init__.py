from kaylee_spark.core.mapreduce import MapReduceJob

__all__ = ["MapReduceJob"]
