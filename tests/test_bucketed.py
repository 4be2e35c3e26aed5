"""Bucketed co-located join: no Exchange in the join plan."""

from pyspark.sql import functions as F

from navigator_document_parser_spark.sources.bucketed import cowrite_for_join


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lt, rt = cowrite_for_join(
            spark, left, right, ["k"], "t_bleft", "t_bright", n_buckets=8
        )
        joined = lt.join(rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == 1000

        # control: the same join over non-bucketed parquet DOES exchange
        plain = left.join(right, "k")
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")
