from seekstorm_spark.query.engine import (  # noqa: F401
    count_matches,
    count_matches_many,
    search,
    search_many,
)
