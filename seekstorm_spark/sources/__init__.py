from seekstorm_spark.sources.webtext import synth_webtext  # noqa: F401
