package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** t145 incremental-PageRank invariants (exact values are oracle-checked
  * against the DuckDB full recompute; this spec pins the properties the
  * oracle cannot see):
  *  - the incremental overlay equals a FULL Spark recompute over the
  *    union graph bit-exactly — the touched-node re-iteration is exact,
  *    not approximate;
  *  - the affected set stays a STRICT subset of the nodes at every
  *    iteration (the work is genuinely localized — the point of the
  *    incremental path);
  *  - the delta genuinely moves ranks (the overlay is not vacuous).
  */
class PagerankDeltaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def h48c(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  test("incremental == full recompute; affected set strict; delta moves") {
    val (inc, affected, nn) = TextOps.pagerankDeltaParts(spark, sf)
    val incRows = inc.collect().map(r => (r.getLong(0), r.getDouble(1)))

    // full recompute over the union graph, straight power iteration
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    def edgesFor(js: Seq[Long], src: org.apache.spark.sql.DataFrame) =
      src.select(col("doc_id").as("src"),
          explode(array(js.map(lit): _*)).as("j"))
        .select(col("src"),
          (h48c(concat(col("src").cast("string"), lit("#"),
            col("j").cast("string"))) % nn).as("dst"))
        .filter(col("dst") =!= col("src"))
    val union = CacheRegistry.harness.add(
      edgesFor(Seq(0L, 1L, 2L), docs)
        .unionByName(edgesFor(Seq(3L), docs.filter(col("doc_id") % 97 === 0)))
        .persist())
    val outdeg = union.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = docs.select(col("doc_id"),
      (floor(lit(1.0) / nn * 1e6) / 1e6).as("pr"))
    for (_ <- 1 to TextOps.PrIters) {
      val flow = ranks.join(union, col("doc_id") === col("src"))
        .join(outdeg, Seq("src"))
        .groupBy(col("dst").as("dst_id"))
        .agg(sum(floor(col("pr") / col("outdeg") * 1e6)).as("inflow_q"))
      ranks = CacheRegistry.harness.add(docs
        .join(flow, col("doc_id") === col("dst_id"), "left")
        .select(col("doc_id"),
          (floor((lit(0.15 / nn) + lit(0.85) *
            (coalesce(col("inflow_q"), lit(0L)).cast("double") / 1e6))
            * 1e6) / 1e6).as("pr"))
        .persist())
    }
    val fullRows = ranks.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(incRows.toSeq == fullRows.toSeq,
      "incremental overlay must equal the full union-graph recompute")

    // localization: every iteration's affected set is a strict subset
    assert(affected.size == TextOps.PrIters)
    affected.foreach(a => assert(a > 0 && a < nn,
      s"affected set $a must be a nonempty strict subset of $nn nodes"))

    // the delta genuinely moves ranks vs the base-only run
    val base = TextOps.t135LinkPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val moved = incRows.count { case (id, pr) => base(id) != pr }
    assert(moved > 0, "the edge delta must move at least one rank")
    // and untouched nodes pass the base trajectory through unchanged
    assert(moved <= affected.last,
      s"only affected nodes may move ($moved moved, ${affected.last} affected)")
    CacheRegistry.harness.release()
  }
}
