from seekstorm_spark.query.engine import count_matches, search  # noqa: F401
