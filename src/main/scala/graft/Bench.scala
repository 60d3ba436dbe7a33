package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warm-up outside the timed region: JIT + codegen + parquet
    // footer/page caches otherwise land entirely on the first timed query
    // (alphabetically d24 — which made it look 8x its steady-state cost).
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("nation", "region", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // events carries TIMESTAMP(NANOS) — must go through the Tables reader
    // (raw parquet read throws PARQUET_TYPE_ILLEGAL)
    Tables.events(spark, sfDir).count()
    // sorted: stable execution order across rounds (Map order is hash-based)
    def runAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // several operators persist their compact signature/codebook tables
        // inside the query (by design — see PLANS.md); drop them between
        // queries so 67 queries x 2 iterations don't accumulate storage
        // blocks and leak one query's cache pressure into the next's timing
        spark.catalog.clearCache()
        name -> dt
      }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // two consecutive in-JVM iterations: the first is comparable to earlier
    // rounds' numbers, the second has JIT/caches fully warm — a structural
    // regression shows up in BOTH, host variance usually in one
    val cold = runAll()
    val warm = runAll()
    val total = if (cold.nonEmpty) cold.map(_._2).sum else 0.0
    val totalWarm = if (warm.nonEmpty) warm.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${
      json(cold)},"total_warm":$totalWarm,"queries_warm":${
      json(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
