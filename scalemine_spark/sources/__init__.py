from scalemine_spark.sources.lg import read_lg, write_lg
from scalemine_spark.sources.pages import read_pages, read_pages_stream

__all__ = ["read_lg", "write_lg", "read_pages", "read_pages_stream"]
