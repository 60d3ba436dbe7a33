package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Z-order layout: kernel exactness against a bit-by-bit reference, and the
  * claim that actually matters at 100 TB — the written layout's per-file
  * min-max stats prune a two-sided box filter far better than a layout
  * that clusters neither (or only one) dimension.
  */
class ZOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Reference Morton interleave, one bit at a time. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  test("morton16 matches the bit-by-bit reference on boundary and random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (0xFFFFL, 0xFFFFL)) ++ Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val df = keys.toDF("x", "y")
      .withColumn("z", Layout.morton16(col("x"), col("y")))
    val bad = df.collect().filter(r =>
      r.getAs[Long]("z") != mortonRef(r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(bad.isEmpty, s"mismatches: ${bad.take(3).mkString(", ")}")
  }

  /** Per-file [min,max] envelopes of the two natural columns, from the
    * written files' own contents (what parquet footer stats would carry).
    */
  private def fileEnvelopes(path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("day",
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))))
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("c_lo"), max("o_custkey").as("c_hi"),
        min("day").as("d_lo"), max("day").as("d_hi"))

  /** Files whose [min,max] envelope overlaps a predicate box (None = that
    * dimension unconstrained) — what parquet footer-stat skipping keeps.
    */
  private def overlapping(env: DataFrame, cust: Option[(Int, Int)],
      day: Option[(Int, Int)]): Long = {
    val cPred = cust.map { case (lo, hi) =>
      col("c_hi") >= lo && col("c_lo") < hi }.getOrElse(lit(true))
    val dPred = day.map { case (lo, hi) =>
      col("d_hi") >= lo && col("d_lo") < hi }.getOrElse(lit(true))
    env.filter(cPred && dPred).count()
  }

  test("one z-ordered copy prunes BOTH single-column filters; a date sort prunes only date") {
    val base = graft.Tables.orders(spark, sf)
    val zval = Layout.morton16(col("o_custkey"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
        .cast("long"))
    val dir = Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(base, zval, 32, s"$dir/z")
    // control: same file count, clustered on date ONLY — the natural sort
    // a time-partitioned lake already has
    base.withColumn("day",
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))))
      .repartitionByRange(32, col("day"))
      .sortWithinPartitions("day")
      .drop("day")
      .write.mode("overwrite").parquet(s"$dir/bydate")

    val zEnv = fileEnvelopes(s"$dir/z").persist()
    val dEnv = fileEnvelopes(s"$dir/bydate").persist()
    val (zTotal, dTotal) = (zEnv.count(), dEnv.count())
    assert(zTotal >= 16, s"expected >=16 z files, got $zTotal")

    // customer-range probe (~13% of customers, all dates): the date sort
    // cannot skip ANY file — every file spans the full customer range —
    // while the z layout keeps only files near the range
    val custProbe = (Some((200, 400)), None)
    val zCust = overlapping(zEnv, custProbe._1, custProbe._2)
    val dCust = overlapping(dEnv, custProbe._1, custProbe._2)
    assert(dCust == dTotal,
      s"date sort unexpectedly pruned a customer probe: $dCust of $dTotal")
    assert(zCust * 2 <= zTotal,
      s"z-order failed to halve the customer probe: $zCust of $zTotal")

    // date-range probe (~12% of days, all customers): both layouts prune;
    // z must still cut a majority (it trades a little per-dimension
    // resolution for covering both dimensions with ONE copy of the data)
    val zDay = overlapping(zEnv, None, Some((300, 600)))
    assert(zDay * 2 <= zTotal,
      s"z-order failed to halve the date probe: $zDay of $zTotal")

    // layouts hold identical data
    val a = spark.read.parquet(s"$dir/z").drop("zval")
    val b = spark.read.parquet(s"$dir/bydate")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    zEnv.unpersist(); dEnv.unpersist()
  }
}
