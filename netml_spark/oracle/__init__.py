from netml_spark.oracle import netml_ref  # noqa: F401
