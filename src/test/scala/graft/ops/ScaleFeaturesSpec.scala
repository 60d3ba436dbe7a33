package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}

/** Plan-level proof of the three scan-reduction mechanisms a 100 TB layout
  * depends on: static partition pruning, dynamic partition pruning (DPP),
  * and runtime bloom-filter join pruning. Each test asserts the mechanism
  * fires in the physical plan — not just that results are correct — because
  * at scale the difference between "scans one partition" and "scans the
  * table" IS the feature.
  */
class ScaleFeaturesSpec extends SparkSpec {

  private lazy val partedDir: String = {
    val dir = Fixtures.tempDir("graft-parted").toString
    val s = spark
    import s.implicits._
    val rows = (1 to 1000).map { i =>
      (i.toLong, s"cust$i", Seq("URGENT", "HIGH", "LOW")(i % 3), i * 10.0)
    }
    rows.toDF("o_orderkey", "name", "priority", "price")
      .write.mode("overwrite").partitionBy("priority")
      .parquet(dir)
    dir
  }

  test("static partition pruning: filter on the partition column prunes files") {
    val df = spark.read.parquet(partedDir).filter(col("priority") === "URGENT")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // only the URGENT partition's files are scanned
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.headOption.contains(1),
      s"expected 1 selected partition, plan:\n$plan")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val s = spark
    import s.implicits._
    val dimDir = Fixtures.tempDir("graft-dpp-dim").toString
    Seq(("URGENT", 1), ("HIGH", 2), ("LOW", 3)).toDF("prio", "rank")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("rank") === 1)
    val fact = spark.read.parquet(partedDir)
    val joined = fact.join(dim, fact("priority") === dim("prio"))
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected DPP subquery in plan:\n$plan")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      // force a shuffle join and let the tiny test tables qualify
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "10GB")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val dir = Fixtures.tempDir("graft-bloom").toString
      (1 to 20000).map(i => (i.toLong, i % 997))
        .toDF("k", "payload").write.mode("overwrite").parquet(s"$dir/fact")
      (1 to 2000).map(i => (i.toLong, s"d$i"))
        .toDF("k", "name").write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("name") === "d7")
      val joined = fact.join(dim, "k")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter"),
        s"expected runtime bloom filter in optimized plan:\n$optimized")
      assert(joined.count() == 1)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("deterministic ORDER BY is eliminated under aggregating consumers") {
    // every query ends in ORDER BY for the oracle contract; the scale claim
    // (README/PLANS) is that Catalyst's EliminateSorts removes it when the
    // consumer aggregates — i.e. Bench's count() never pays the global sort
    val df = Relational.q01FilterProject(spark, "/root/testdata/sf0.001")
    val counted = df.groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"sort survived under count():\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"range exchange survived under count():\n$plan")
    // and the direct consumer DOES keep it (the contract the oracle needs)
    val direct = df.queryExecution.executedPlan.toString
    assert(direct.contains("Sort ") || direct.contains("rangepartitioning"),
      s"oracle-facing plan lost its deterministic sort:\n$direct")
  }
}
