from seekstorm_spark.index.builder import IndexBuilder  # noqa: F401
from seekstorm_spark.index.store import IndexStore  # noqa: F401
