from msstreamingstack_spark.operators.sessionize import sessionize  # noqa: F401
