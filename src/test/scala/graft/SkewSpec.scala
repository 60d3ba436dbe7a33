package graft

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.Skew

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d).select("user_id", "value")
    val dim = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val plain = ev.join(dim, "user_id")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("s"),
        sum("n_events").as("sn")).collect().head
    val salted = Skew.saltedJoin(ev, dim, "user_id", salt = 8)
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("s"),
        sum("n_events").as("sn")).collect().head
    assert(salted == plain)
  }

  test("hotKeys surfaces the dominant key") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(1000)(999L) ++ (1L to 50L)).toDF("k")
    val hot = Skew.hotKeys(df, col("k"), topK = 3).collect()
    assert(hot.head.getLong(0) == 999L && hot.head.getLong(1) == 1000L)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val s = spark
    import s.implicits._
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      // one pathological key (0) with ~200k rows vs 100 uniform keys
      val left = s.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .unionByName(s.range(10000).select((col("id") % 100 + 1).as("k"),
          col("id").as("v")))
      val right = s.range(101).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() executes THIS DataFrame's QueryExecution, finalizing its
      // adaptive plan (count() would build a separate aggregated plan)
      assert(joined.collect().length == 210000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew split in final plan:\n$finalPlan")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      s.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }
}
