package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariant specs for the round-8 operators. Exact-value correctness is
  * covered by the DuckDB oracle gate (scripts/check.py); these assert the
  * semantic contracts a hash compare alone would not explain if broken —
  * and, for d89, the exact hand-written cleaned text on a constructed
  * corpus.
  */
class Round8OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d89 removal: hand-written cleaned corpus, first occurrence wins") {
    val s = spark
    import s.implicits._
    def run(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i")
    val span = run("s", 1, 20)
    val docA = (run("a", 1, 5) ++ span ++ run("b", 1, 5)).mkString(" ")
    val docB = (run("c", 1, 8) ++ span).mkString(" ")
    val docC = run("u", 1, 10).mkString(" ")
    val reg = new CacheRegistry
    val out = TextOps.substringRemoval(
      Seq((1L, docA), (2L, docB), (3L, docC), (4L, docA))
        .toDF("doc_id", "text"), reg)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 holds the corpus-wide first occurrence of every duplicated
    // window (smallest doc_id) -> survives untouched
    assert(out(1L).getAs[Long]("n_removed") == 0L)
    assert(out(1L).getAs[String]("text_kept") == docA)
    // doc 2: only the span window (pos 9) is duplicated and doc 1 owns its
    // first occurrence -> tokens 9..28 removed, the c-prefix survives
    assert(out(2L).getAs[Long]("n_tokens") == 28L)
    assert(out(2L).getAs[Long]("n_removed") == 20L)
    assert(out(2L).getAs[String]("text_kept") ==
      run("c", 1, 8).mkString(" "))
    // doc 3: below the 20-token window -> kept verbatim by definition
    assert(out(3L).getAs[Long]("n_removed") == 0L)
    assert(out(3L).getAs[String]("text_kept") == docC)
    // doc 4 is an exact copy of doc 1: all 11 windows duplicated with
    // first occurrences in doc 1 -> the whole document is cut to nothing
    // (exactly how ExactSubstr shrinks a full duplicate)
    assert(out(4L).getAs[Long]("n_removed") == 30L)
    assert(out(4L).getAs[String]("text_kept") == "")
    reg.release()
  }

  test("d89 removal: overlapping coverage intervals count each token once") {
    val s = spark
    import s.implicits._
    val m = (1 to 40).map(i => s"m$i")
    // doc 5 = m1..m20 and doc 6 = m3..m22 each own (as corpus-wide first
    // occurrence by doc_id) one window of doc 7 = m1..m40; the two removed
    // windows in doc 7 sit at positions 1 and 3 — separate runs (position
    // 2's window is unique to doc 7) whose covered intervals [1,20] and
    // [3,22] overlap on 3..20, so a naive per-window count would remove
    // 40 tokens where the true union is 22
    val reg = new CacheRegistry
    val out = TextOps.substringRemoval(
      Seq((5L, m.take(20).mkString(" ")),
        (6L, m.slice(2, 22).mkString(" ")),
        (7L, m.mkString(" ")))
        .toDF("doc_id", "text"), reg)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(5L).getAs[Long]("n_removed") == 0L)
    assert(out(6L).getAs[Long]("n_removed") == 0L)
    assert(out(7L).getAs[Long]("n_tokens") == 40L)
    assert(out(7L).getAs[Long]("n_removed") == 22L)
    assert(out(7L).getAs[String]("text_kept") ==
      m.drop(22).mkString(" "))
    reg.release()
  }

  test("d89 corpus invariants: token conservation, coupling with t87") {
    val df = TextOps.d89SubstringRemoval(spark, sf).cache()
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("n_removed") > col("n_tokens")).count() == 0)
    assert(df.filter(col("n_removed") < 0).count() == 0)
    // the kept text's token count is exactly n_tokens - n_removed
    val badCount = df.filter(
      when(col("text_kept") === "", lit(0))
        .otherwise(size(split(col("text_kept"), " ")))
        =!= (col("n_tokens") - col("n_removed"))).count()
    assert(badCount == 0)
    // removal only ever happens in documents t87 sees duplicated windows
    // in (the converse is false: a doc holding every first occurrence has
    // dup windows but loses nothing)
    val stats = TextOps.t87ExactSubstring(spark, sf)
      .select(col("doc_id"), col("n_dup_windows"))
    assert(df.join(stats, Seq("doc_id"))
      .filter(col("n_removed") > 0 && col("n_dup_windows") === 0)
      .count() == 0)
    // the corpus's dup families make removal actually fire somewhere
    assert(df.filter(col("n_removed") > 0).count() > 0)
    df.unpersist()
    CacheRegistry.harness.release()
  }
}
