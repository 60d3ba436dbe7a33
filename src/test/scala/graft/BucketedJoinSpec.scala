package graft

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Demonstrates the shuffle-free co-partitioned join path referenced in
  * PLANS.md: bucketing orders and customer on the join key removes the
  * fact-fact exchange that q03/q33 otherwise pay. At 100 TB this is the
  * difference between re-shuffling the fact table per query and reading
  * co-located buckets.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed orders⋈customer join plans without a shuffle") {
    val d = "/root/testdata/sf0.001"
    // external tables at an explicit path (warehouse dir is a static conf)
    val wh = betfair.Fixtures.tempDir("bucketwh")
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_customer_b")
    Tables.orders(spark, d).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/g_orders_b").saveAsTable("g_orders_b")
    Tables.customer(spark, d).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/g_customer_b").saveAsTable("g_customer_b")

    val joined = spark.table("g_orders_b")
      .join(spark.table("g_customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join itself needs no data exchange — the only
    // shuffle left is the 5-group aggregation
    val joinSection = plan.substring(0, plan.length)
    assert(!joinSection.contains("Exchange hashpartitioning(o_custkey"),
      s"orders side re-shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(c_custkey"),
      s"customer side re-shuffled:\n$plan")
    // and the result matches the unbucketed join
    val expected = Tables.orders(spark, d)
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_customer_b")
  }
}
