package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** [[TextOps.canonicalizeUrl]] rule-by-rule goldens plus the d93
  * first-per-canonical-URL keeper semantics.
  */
class UrlDedupSpec extends SparkSpec {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(TextOps.canonicalizeUrl(col("u")))
      .collect().head.getString(0)
  }

  test("canonicalization strips scheme/www/fragment/tracking/slash, keeps real params") {
    assert(canon("https://WWW.Example.COM/a/3/?page=2&utm_source=feed#sec")
      == "example.com/a/3?page=2")
    assert(canon("http://example.com/a/3") == "example.com/a/3")
    // the two messy crawls of the same page collapse
    assert(canon("https://www.example.com/a/3/") == canon("HTTP://Example.com/a/3"))
    // a tracking-only query vanishes entirely, dangling '?' included
    assert(canon("https://site.com/p?utm_source=x") == "site.com/p")
    assert(canon("https://site.com/p?fbclid=abc123") == "site.com/p")
    // a meaningful param survives when the tracking param is chained after it
    assert(canon("http://site.com/p?page=2&gclid=zz") == "site.com/p?page=2")
    // tracking-LOOKING text in the PATH is never rewritten — two genuinely
    // different pages must not merge
    assert(canon("https://site.com/ref/utm_campaign=x")
      == "site.com/ref/utm_campaign=x")
    assert(canon("https://site.com/ref/utm_campaign=x")
      != canon("https://site.com/ref/"))
    // multiple tracking params strip completely, in either position
    assert(canon("http://site.com/p?utm_a=1&utm_b=2") == "site.com/p")
    assert(canon("http://site.com/p?utm_a=1&page=2&utm_b=2")
      == "site.com/p?page=2")
  }

  test("d93 keeps exactly one doc per canonical URL, the smallest doc_id") {
    val out = TextOps.d93UrlDedup(spark, "/root/testdata/sf0.001")
      .select("doc_id", "canon_url", "n_docs", "keeper").persist()
    CacheRegistry.harness.add(out)
    // every doc appears once
    assert(out.count() == spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count())
    // per canonical URL: exactly one keeper, and it is min(doc_id)
    val bad = out.groupBy("canon_url")
      .agg(sum(when(col("keeper"), 1).otherwise(0)).as("n_keep"),
        min("doc_id").as("mn"),
        min(when(col("keeper"), col("doc_id"))).as("keep_id"))
      .filter(col("n_keep") =!= 1 || col("mn") =!= col("keep_id"))
    assert(bad.count() == 0)
    // the synthetic corpus does contain real duplicate groups
    assert(out.filter(col("n_docs") > 1).count() > 0)
    CacheRegistry.harness.release()
  }

  test("d101 incremental state reproduces the one-shot d93 verdicts") {
    val oneShot = TextOps.d93UrlDedup(spark, "/root/testdata/sf0.001")
    val incr = TextOps.d101IncrementalUrlDedup(spark, "/root/testdata/sf0.001")
    assert(incr.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(incr).count() == 0)
    CacheRegistry.harness.release()
  }
}
