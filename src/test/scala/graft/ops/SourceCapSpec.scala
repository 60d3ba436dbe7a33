package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** [[TextOps.t100SourceCap]] — per-source keep/cap/drop enforcement: the
  * two-phase (bucket-histogram + boundary-bucket rank) implementation
  * must equal the one-window specification, and the cap must be exact.
  */
class SourceCapSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two-phase selection equals the one-window specification exactly") {
    val out = TextOps.t100SourceCap(spark, sf).persist()
    CacheRegistry.harness.add(out)
    // the simple spec: rank every doc per source by (bucket, h, doc_id)
    // and keep rank <= cap — the form the DuckDB oracle states
    val h = conv(substr(md5(concat(col("doc_id").cast("string"),
      lit(":cap"))), lit(1), lit(12)), 16, 10).cast("long")
    val spec = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("h") % 100, col("h"), col("doc_id"))).cast("long"))
    val joined = out.join(spec, Seq("doc_id"))
    assert(joined.filter(col("policy") === "cap" &&
      (col("rk") <= col("cap")) =!= col("kept")).count() == 0)
    // exact enforcement: every capped source keeps exactly `cap` docs
    val perSource = out.filter(col("policy") === "cap")
      .groupBy("source", "cap")
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
    assert(perSource.filter(col("n_kept") =!= col("cap")).count() == 0)
    assert(perSource.count() > 0, "no capped source exercised")
    // all three policies occur and dropped sources keep nothing
    val policies = out.select("policy").distinct().collect()
      .map(_.getString(0)).toSet
    assert(policies == Set("drop", "cap", "keep"))
    assert(out.filter(col("policy") === "drop" && col("kept")).count() == 0)
    assert(out.filter(col("policy") === "keep" && !col("kept")).count() == 0)
    CacheRegistry.harness.release()
  }

  test("verdicts are append-stable: a doc's draw never depends on the corpus") {
    // rerunning on a PREFIX of the corpus must keep every already-kept doc
    // of an uncapped-policy source... for capped sources the cap value
    // changes with n_docs, so stability is only claimed for the DRAW
    // itself: the (bucket, h) key of a doc is a pure function of doc_id
    val a = TextOps.t100SourceCap(spark, sf)
      .select("doc_id", "policy").persist()
    CacheRegistry.harness.add(a)
    val b = TextOps.t100SourceCap(spark, sf)
      .select("doc_id", "policy")
    // full determinism across runs (no RNG, no partitioning dependence)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    CacheRegistry.harness.release()
  }
}
