"""spark_fuse_spark — a PySpark-native analytics engine.

Brand-new implementation of the query and data-processing capabilities
of the reference toolkit (kevinsames/spark-fuse, surveyed in SURVEY.md),
re-expressed Spark-first: DataFrame/Catalyst for planning, Python Data
Source API for connectors, Structured Streaming for streams, and
higher-order/built-in functions instead of Python UDFs wherever
semantics allow.
"""

from .session import create_session, detect_environment

__version__ = "0.1.0"
__all__ = ["create_session", "detect_environment", "__version__"]
