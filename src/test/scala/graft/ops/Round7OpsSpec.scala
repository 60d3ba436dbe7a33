package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariant specs for the round-7 operators. Exact-value correctness is
  * covered by the DuckDB oracle gate (scripts/check.py); these assert the
  * semantic contracts a hash compare alone would not explain if broken.
  */
class Round7OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t81 line rules: keep_lines is the conjunction, verdicts vary") {
    val df = TextOps.t81LineRules(spark, sf).cache()
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("keep_lines") =!=
      (col("rule_bullet") && col("rule_ellipsis") && col("rule_alpha") &&
        col("rule_symbol"))).count() == 0)
    // the doc_id-derived payload must actually exercise each rule: every
    // rule column takes both values somewhere in the corpus
    Seq("rule_bullet", "rule_ellipsis", "rule_alpha", "rule_symbol")
      .foreach { r =>
        assert(df.filter(col(r)).count() > 0, s"$r never true")
        assert(df.filter(!col(r)).count() > 0, s"$r never false")
      }
    df.unpersist()
  }

  test("t81 payload counts are exact on a constructed doc") {
    // doc_id 13: 13%23=13 bullet lines, 13%5=3 ellipsis lines, 13%11=2
    // hashes, 13%40=13 numeric words on top of the raw prose line
    val row = TextOps.t81LineRules(spark, sf)
      .filter(col("doc_id") === 13).collect()(0)
    assert(row.getAs[Long]("n_lines") == 1L + 13L + 3L)
    assert(row.getAs[Long]("bullet_lines") == 13L)
    assert(row.getAs[Long]("ellipsis_lines") == 3L)
    assert(row.getAs[Long]("n_hash") == 2L)
    // the 3 "to be continued..." lines each contribute one '...' match
    assert(row.getAs[Long]("n_ellipsis") == 3L)
  }

  test("v82 frontier: hits monotone in k, n_cand constant per method") {
    val df = VectorOps.v82AnnFrontier(spark, sf).cache()
    // 10 queries x 3 k's for lsh/ivf + 5 x 3 for pq
    assert(df.count() == 75)
    assert(df.filter(col("hits") > col("k")).count() == 0)
    // n_cand is a property of (query, method), not of k
    assert(df.groupBy("query_id", "method")
      .agg(countDistinct("n_cand").as("nc")).filter(col("nc") =!= 1)
      .count() == 0)
    // hits at larger k dominate hits at smaller k (same query, method)
    val pairs = df.select("query_id", "method", "k", "hits").collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
    pairs.values.foreach { rs =>
      val byK = rs.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(byK.sliding(2).forall(p => p.head <= p.last),
        s"hits not monotone: ${rs.mkString(",")}")
    }
    // PQ scores the whole corpus: n_cand = corpus size - 1, every query
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(df.filter(col("method") === "pq")
      .filter(col("n_cand") =!= (n - 1)).count() == 0)
    df.unpersist()
  }

  test("v83 semantic dedup: keeper rule consistent, min of cluster keeps") {
    val df = VectorOps.v83SemanticDedup(spark, sf).cache()
    assert(df.count() == graft.Tables.embeddings(spark, sf).count())
    assert(df.filter(col("keeper") =!= (col("n_smaller_dups") === 0))
      .count() == 0)
    // min-id-wins: the smallest vec_id of every cluster has no smaller
    // cluster-mate, so it MUST be a keeper
    val minPerCluster = df.groupBy("cid").agg(min("vec_id").as("vec_id"))
    assert(df.join(minPerCluster, Seq("cid", "vec_id"))
      .filter(!col("keeper")).count() == 0)
    // the threshold actually bites at this SF: both verdicts occur
    assert(df.filter(col("keeper")).count() > 0)
    assert(df.filter(!col("keeper")).count() > 0)
    // cluster ids come from the k-means init domain
    assert(df.filter(col("cid") < 0 || col("cid") >= VectorOps.KmeansK)
      .count() == 0)
    df.unpersist()
  }

  test("d85 line dedup removes boilerplate at all but its first occurrence") {
    val df = TextOps.d85LineDedup(spark, sf).cache()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(df.count() == docs)
    // dedup never invents lines, and SOME cross-document removal happened
    // (the doc_id%3 boilerplate alone appears in ~1/3 of docs)
    assert(df.filter(col("n_kept") > col("n_lines")).count() == 0)
    assert(df.filter(col("n_kept") < col("n_lines")).count() > docs / 4)
    // each shared boilerplate line survives in EXACTLY one document
    val survivors = df.filter(
      col("text_kept").contains("subscribe to our newsletter today."))
    assert(survivors.count() == 1)
    // ... and that document is the smallest doc_id carrying it
    val firstCarrier = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).agg(min("doc_id")).head().getLong(0)
    assert(survivors.head().getAs[Long]("doc_id") == firstCarrier)
    df.unpersist()
  }

  test("t86 C4 rules: keep is the conjunction and verdicts vary") {
    val df = TextOps.t86C4Rules(spark, sf).cache()
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("keep") =!=
      (col("n_kept") >= 3 && !col("has_lorem") && !col("has_brace")))
      .count() == 0)
    // lorem/brace pages exist (doc_id%13 / %7) and are rejected
    assert(df.filter(col("has_lorem")).count() > 0)
    assert(df.filter(col("has_brace")).count() > 0)
    assert(df.filter(col("has_lorem") && col("keep")).count() == 0)
    assert(df.filter(col("keep")).count() > 0)
    assert(df.filter(!col("keep")).count() > 0)
    df.unpersist()
  }

  test("t59 line rules pass on the raw single-line corpus") {
    // raw docs have no newlines/bullets/symbols, so folding the line rules
    // into t59's conjunction must not change any keep verdict there
    val df = TextOps.t59GopherFilter(spark, sf).cache()
    assert(df.filter(col("n_lines") =!= 1).count() == 0)
    assert(df.filter(!col("rule_bullet") || !col("rule_ellipsis") ||
      !col("rule_symbol")).count() == 0)
    df.unpersist()
  }

  test("t87 exact values: shared span, full duplicate, sub-window doc") {
    val s = spark
    import s.implicits._
    def run(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val span = run("s", 20)
    // the ONLY 20-token window of a 20-token span is the span itself, so a
    // shared span inside differing context yields exactly one dup window
    val docA = run("a", 5) + " " + span + " " + run("b", 5) // 30 words
    val docB = run("c", 8) + " " + span                     // 28 words
    val docC = run("u", 10)                                 // below k=20
    val out = TextOps.exactSubstringStats(
      Seq((1L, docA), (2L, docB), (3L, docC), (4L, docA))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // docA and its exact copy: all 11 windows duplicated -> run of 11
    // consecutive windows = 11 + 19 = 30 tokens (the whole doc), rejected
    for (id <- Seq(1L, 4L)) {
      assert(out(id).getAs[Long]("n_windows") == 11L)
      assert(out(id).getAs[Long]("n_dup_windows") == 11L)
      assert(out(id).getAs[Double]("dup_window_frac") == 1.0)
      assert(out(id).getAs[Long]("longest_dup_span") == 30L)
      assert(!out(id).getAs[Boolean]("keep"))
    }
    // docB: 9 windows, only the span window (pos 9) is cross-document
    assert(out(2L).getAs[Long]("n_windows") == 9L)
    assert(out(2L).getAs[Long]("n_dup_windows") == 1L)
    assert(out(2L).getAs[Long]("longest_dup_span") == 20L)
    assert(out(2L).getAs[Double]("dup_window_frac") ==
      math.floor(1e4 / 9) / 1e4)
    assert(out(2L).getAs[Boolean]("keep"))
    // docC: shorter than the window -> zero windows, kept by definition
    assert(out(3L).getAs[Long]("n_windows") == 0L)
    assert(out(3L).getAs[Long]("n_dup_windows") == 0L)
    assert(out(3L).getAs[Long]("longest_dup_span") == 0L)
    assert(out(3L).getAs[Boolean]("keep"))
    CacheRegistry.harness.release()
  }

  test("t87 corpus invariants: bounds, span/dup coupling, real hits") {
    val df = TextOps.t87ExactSubstring(spark, sf).cache()
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("n_dup_windows") > col("n_windows")).count() == 0)
    // a duplicated span exists iff a duplicated window does, and is never
    // shorter than the window
    assert(df.filter((col("n_dup_windows") === 0) =!=
      (col("longest_dup_span") === 0)).count() == 0)
    assert(df.filter(col("longest_dup_span") > 0 &&
      col("longest_dup_span") < TextOps.ExactSubstrK).count() == 0)
    assert(df.filter(col("longest_dup_span") >
      col("n_windows") + TextOps.ExactSubstrK - 1).count() == 0)
    // the corpus's near-dup families contain real cross-doc 20-token spans
    assert(df.filter(col("n_dup_windows") > 0).count() > 0)
    df.unpersist()
    CacheRegistry.harness.release()
  }

  test("t88 shuffle-shard: stable permutation, contiguous ranks, balance") {
    val a = TextOps.t88ShuffleShard(spark, sf).collect()
    val b = TextOps.t88ShuffleShard(spark, sf).collect()
    // determinism: the permutation is a pure function of (seed, doc_id) —
    // identical across runs regardless of partitioning
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == graft.Tables.documents(spark, sf).count())
    val byShard = a.groupBy(_.getAs[Int]("shard"))
    // every shard populated, ranks contiguous 1..n within each shard,
    // rows ordered by order_key within the shard
    assert(byShard.keySet == (0 until TextOps.ShuffleShards).toSet)
    byShard.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("ord")).sorted.toSeq ==
        (1L to rows.length.toLong))
      val sorted = rows.sortBy(_.getAs[Long]("ord"))
        .map(r => (r.getAs[Long]("order_key"), r.getAs[Long]("doc_id")))
      assert(sorted.toSeq == sorted.sortBy(identity).toSeq)
    }
    // hash-modulo balance: no shard more than 2x the uniform share (a
    // loose 3-sigma-plus bound at n=500, k=8)
    val n = a.length
    assert(byShard.values.map(_.length).max <= 2 * n / TextOps.ShuffleShards)
  }
}
