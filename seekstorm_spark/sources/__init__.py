from seekstorm_spark.sources.pdf import build_pdf, read_pdf  # noqa: F401
from seekstorm_spark.sources.warc import build_warc, read_warc  # noqa: F401
from seekstorm_spark.sources.webtext import synth_webtext  # noqa: F401
