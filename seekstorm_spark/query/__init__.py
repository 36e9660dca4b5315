from seekstorm_spark.query.engine import (  # noqa: F401
    count_matches,
    search,
    search_many,
)
