from dotnetspider_spark.functions.identity import request_identity  # noqa: F401
