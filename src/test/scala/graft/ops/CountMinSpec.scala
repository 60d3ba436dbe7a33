package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Count-Min kernel properties (overestimate-only, exact merge) and the
  * d113 incremental-retention ≡ q107 one-shot identity.
  */
class CountMinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kernel: estimates never under-count and merge equals single-pass") {
    // zipf-ish: key k appears ~1000/k times; the hash must be a FUNCTION
    // of the key (one salt for the whole run), or duplicates would get
    // distinct hashes and every probed key would have exact count 1
    val salt = new scala.util.Random(13).nextLong()
    val keys = (1 to 50).flatMap(k => Seq.fill(1000 / k)(k.toLong))
    val hashes = keys.map(k =>
      java.lang.Long.reverse(k * 0x9E3779B97F4A7C15L) ^ salt)
    // single-pass sketch
    val agg = new CountMinAgg
    val one = hashes.foldLeft(agg.zero)(agg.reduce)
    // two shards merged
    val (l, r) = hashes.splitAt(hashes.length / 2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(one.sameElements(merged), "merge is not equivalent to one pass")
    // per-key: est >= exact (always) and within the eps*N bound here
    def est(st: Array[Long], h: Long): Long =
      (0 until CountMin.D).map(r => st(r * CountMin.W + CountMin.pos(h, r))).min
    val exact = hashes.groupBy(identity).view.mapValues(_.size.toLong)
    val n = hashes.size
    exact.foreach { case (h, c) =>
      val e = est(one, h)
      assert(e >= c, s"under-count: est $e < exact $c")
      assert(e <= c + 3L * n / CountMin.W, s"overshoot: est $e vs exact $c")
    }
  }

  test("q114: all hot keys verify in-row; plan is TakeOrdered + broadcast") {
    val df = Relational.q114CountMin(spark, sf)
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Boolean]("sketch_ok")),
      "a hot key's CMS estimate violated the bound")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"hot-key scan is not k-bounded:\n$plan")
  }

  test("d113 incremental retention is byte-identical to the one-shot q107") {
    val oneShot = Relational.q107RetentionCohorts(spark, sf)
    val inc = Relational.d113IncrementalRetention(spark, sf)
    assert(oneShot.exceptAll(inc).count() == 0 &&
      inc.exceptAll(oneShot).count() == 0)
    // idempotence under re-delivery: re-ingesting batch 1 on top of the
    // merged state changes nothing (the union-distinct absorbs replays).
    // Uses the PRODUCTION retentionWeek bucketing, not an inline copy.
    val base = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        Relational.retentionWeek(col("ts")).as("wk"), col("event_id"))
    val act = base.select("user_id", "wk").distinct()
    val replayed = act.unionByName(
      base.filter(col("event_id") % 2 === 0).select("user_id", "wk")
        .distinct()).distinct()
    assert(act.exceptAll(replayed).count() == 0 &&
      replayed.exceptAll(act).count() == 0)
  }
}
