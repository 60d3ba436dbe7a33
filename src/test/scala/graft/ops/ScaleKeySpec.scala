package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The 100 TB shuffle-key variants: [[TextOps.lineDedup]] keyed on
  * md5(line) and [[TextOps.exactSubstringStats]] /
  * [[TextOps.substringRemoval]] keyed on xxhash64(window) must produce
  * byte-identical output to the raw-text-keyed paths the oracle checks —
  * the narrow key changes what crosses the exchange, never the grouping.
  * This is the executable form of the scale claim: the production plan is
  * the proven plan with one substituted key expression, not a rhetorical
  * "would also work hashed".
  */
class ScaleKeySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def assertIdentical(raw: DataFrame, keyed: DataFrame): Unit = {
    assert(raw.schema == keyed.schema)
    assert(raw.exceptAll(keyed).count() == 0)
    assert(keyed.exceptAll(raw).count() == 0)
  }

  private val xx: Option[Column => Column] = Some(xxhash64(_))

  test("line dedup keyed on md5(line) equals the raw-line path") {
    assertIdentical(
      TextOps.lineDedup(docs),
      TextOps.lineDedup(docs, lineKey = Some(md5(_))))
    CacheRegistry.harness.release()
  }

  test("substring stats keyed on xxhash64(window) equal the raw path") {
    assertIdentical(
      TextOps.exactSubstringStats(docs),
      TextOps.exactSubstringStats(docs, windowKey = xx))
    CacheRegistry.harness.release()
  }

  test("substring removal keyed on xxhash64(window) equals the raw path") {
    assertIdentical(
      TextOps.substringRemoval(docs),
      TextOps.substringRemoval(docs, windowKey = xx))
    CacheRegistry.harness.release()
  }
}
