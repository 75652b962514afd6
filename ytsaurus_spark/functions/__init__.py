"""QL/YQL function surface re-expressed as Spark column functions."""

from ytsaurus_spark.functions.ql import *  # noqa: F401,F403
