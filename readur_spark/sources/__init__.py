from readur_spark.sources.warc import read_warc_pages, write_warc  # noqa: F401
