"""Pure-Python extraction core — zero Spark dependencies.

Every module here is unit-testable without a SparkSession; the Spark layer
(functions/udfs.py) wraps these in Arrow-batched pandas UDFs.
"""
