package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.streaming.StreamOps

/** [[TextOps.t99BlocklistFilter]] / [[TextOps.blocklistKeep]] — the C4
  * bad-words + blocked-domain page filter and its streaming twin.
  */
class BlocklistSpec extends SparkSpec {

  private def keep(text: String, url: String): Boolean = {
    import spark.implicits._
    Seq((text, url)).toDF("text", "url")
      .select(TextOps.blocklistKeep(col("text"),
        TextOps.canonicalizeUrl(col("url"))))
      .collect().head.getBoolean(0)
  }

  test("blocklistKeep blocks listed words and domains, token-exact") {
    assert(!keep("a slow query", "https://clean.example.com/x"))
    assert(!keep("dup", "https://clean.example.com/x"))
    assert(keep("a fast query", "https://clean.example.com/x"))
    // token membership, not substring: 'slowly' is not the blocked 'slow'
    assert(keep("runs slowly here", "https://clean.example.com/x"))
    // domain block catches scheme/www/case variants via canonicalization
    assert(!keep("a fast query", "https://WWW.SRC7.example.com/x"))
    assert(!keep("a fast query", "http://src13.example.com/"))
    // path mentioning a blocked domain is not a domain match
    assert(keep("a fast query", "https://ok.com/src7.example.com"))
  }

  test("t99 verdicts are consistent: count form == membership form") {
    val out = TextOps.t99BlocklistFilter(spark, "/root/testdata/sf0.001")
      .persist()
    CacheRegistry.harness.add(out)
    // the broadcast-join count and the literal-array membership must agree
    assert(out.filter((col("n_bad") === 0 && !col("domain_blocked"))
      =!= col("keep_blocklist")).count() == 0)
    // composition: keep_page never true where the blocklist rejects
    assert(out.filter(col("keep_page") && !col("keep_blocklist"))
      .count() == 0)
    // the corpus actually splits (both verdicts occur)
    assert(out.filter(col("keep_blocklist")).count() > 0)
    assert(out.filter(!col("keep_blocklist")).count() > 0)
    CacheRegistry.harness.release()
  }

  test("streaming blocklist gate matches the batch verdict") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      (1L, "a fast query plan", "https://clean.example.com/x"),
      (2L, "a slow query plan", "https://clean.example.com/x"),
      (3L, "a fast query plan", "http://www.src7.example.com/y"))
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamOps.blocklistGateStream(
      mem.toDF().toDF("doc_id", "text", "url"))
      .writeStream.format("memory").queryName("blg")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val out = s.sql("select doc_id, keep_blocklist from blg").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q.stop()
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
    // batch/streaming parity through the shared blocklistKeep Column
    val batch = rows.toDF("doc_id", "text", "url")
      .select(col("doc_id"), TextOps.blocklistKeep(col("text"),
        TextOps.canonicalizeUrl(col("url"))).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch == out)
  }
}
