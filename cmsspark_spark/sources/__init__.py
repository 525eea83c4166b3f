"""Source registry and readers (SURVEY §2.1)."""

from cmsspark_spark.sources.readers import SourceSpec, read_source  # noqa: F401
