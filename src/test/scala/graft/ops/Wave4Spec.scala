package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.multimodal.Multimodal

/** Round-10 wave 4: windowed funnel dominance, exact-percentile semantics
  * against a driver-side reference, and the incremental-video ≡ one-shot
  * identity.
  */
class Wave4Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q115: windowed counts are dominated by the unwindowed funnel and stay monotone") {
    val unb = Relational.q108Funnel(spark, sf).head
    val win = Relational.q115WindowedFunnel(spark, sf).head
    // same first step (no window applies to it), never more conversions
    assert(win.getLong(0) == unb.getLong(0))
    assert(win.getLong(1) <= unb.getLong(1))
    assert(win.getLong(2) <= unb.getLong(2))
    assert(win.getLong(0) >= win.getLong(1) &&
      win.getLong(1) >= win.getLong(2))
    // a 0-day window converts nothing past the first step
    val zero = Relational.q115WindowedFunnel(spark, sf, windowDays = 0).head
    assert(zero.getLong(1) == 0 && zero.getLong(2) == 0)
  }

  test("q116: histogram order statistic equals the sorted-array definition") {
    val out = Relational.q116GroupPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val byFlag = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
    byFlag.foreach { case (flag, vals) =>
      val n = vals.length
      def disc(num: Long, den: Long): Double =
        vals(((num * n + den - 1) / den - 1).toInt)
      val row = out(flag)
      assert(row.getAs[Long]("n_rows") == n)
      assert(row.getAs[Double]("p50") == disc(1, 2),
        s"$flag p50: ${row.getAs[Double]("p50")} vs ${disc(1, 2)}")
      assert(row.getAs[Double]("p90") == disc(9, 10),
        s"$flag p90: ${row.getAs[Double]("p90")} vs ${disc(9, 10)}")
    }
    assert(out.size == 3)
  }

  test("q116 plan: no single-buffer percentile aggregate anywhere") {
    val df = Relational.q116GroupPercentile(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"),
      s"a percentile aggregate sneaked into the histogram plan:\n$plan")
  }

  test("d117 incremental video is byte-identical to the one-shot d103") {
    val oneShot = Multimodal.d103VideoOverlap(spark, sf)
    val inc = Multimodal.d117IncrementalVideoDedup(spark, sf)
    assert(oneShot.exceptAll(inc).count() == 0 &&
      inc.exceptAll(oneShot).count() == 0)
    assert(oneShot.count() > 0)
    val plan = inc.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental probe lost its equi-join shape:\n$plan")
    CacheRegistry.harness.release()
  }
}
