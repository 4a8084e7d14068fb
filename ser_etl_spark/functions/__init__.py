"""Scalar/aggregate helper functions shared by operators."""

from ser_etl_spark.functions.numeric import davg, dsum

__all__ = ["dsum", "davg"]
