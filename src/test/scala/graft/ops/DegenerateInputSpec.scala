package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}

/** Degenerate-corpus hardening: real crawled corpora carry null texts, empty
  * strings, whitespace-only and single-token documents. Every text operator
  * must process such a corpus without throwing and with sensible per-doc
  * verdicts (degenerate docs drop out of token-dependent results rather
  * than poisoning them). The driver tables are clean, so this spec builds
  * its own dirty corpus.
  */
class DegenerateInputSpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    val dir = Fixtures.tempDir("graft-dirty").toString
    val s = spark
    import s.implicits._
    Seq[(java.lang.Long, String, String, String, java.lang.Long)](
      (1L, null, "en", "src0", null),
      (2L, "", "en", "src0", 0L),
      (3L, "   ", "de", "src1", 3L),
      (4L, "single", "fr", "src1", 6L),
      (5L, "two words", "en", "src0", 9L),
      (6L, "a normal document with enough words to pass the basic gates " +
        "of the quality and chunking operators in the library", "en",
        "src0", 113L),
      (7L, "a normal document with enough words to pass the basic gates " +
        "of the quality and chunking operators in the library", "zh",
        "src1", 113L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, Seq(0.0f, 0.0f), 0), (2L, Seq(1.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("token/quality/fingerprint ops survive null and empty texts") {
    val tok = TextOps.t20TokenCount(spark, dirtyDir).collect()
    // null text drops out (null metrics filtered nowhere, but null rows
    // must not throw); the rest produce defined counts
    assert(tok.length >= 5)
    val fp = TextOps.t23Fingerprint(spark, dirtyDir)
    assert(fp.count() >= 5)
    val q = TextOps.t21Quality(spark, dirtyDir)
    assert(q.count() >= 5)
  }

  test("dedup family treats the two identical real docs as duplicates") {
    // two groups: the identical real docs (6,7) AND the empty/whitespace
    // pair (2,3), whose canonical forms both collapse to "" — degenerate
    // docs dedup against each other, not against real content
    val d24 = TextOps.d24ExactDedup(spark, dirtyDir)
      .filter(col("n_docs") >= 2)
    assert(d24.count() == 2)
    val lsh = TextOps.d26MinhashLsh(spark, dirtyDir).collect()
    assert(lsh.exists(r => r.getLong(0) == 6L && r.getLong(1) == 7L),
      s"6/7 near-dup pair missed: ${lsh.mkString(",")}")
  }

  test("chunking/packing ops ignore sub-threshold docs without throwing") {
    // passage dedup needs >= chunk-width words; the dirty corpus has two
    // identical qualifying docs, so their chunks collide
    val d57 = TextOps.d57PassageDedup(spark, dirtyDir)
    assert(d57.count() > 0)
    val t69 = TextOps.t69PackSequences(spark, dirtyDir).collect()
    // null-text doc: token count is null-safe — doc must either appear
    // with a defined n_tokens or be absent; no row may carry a null shard
    assert(t69.forall(r => !r.isNullAt(1)))
    val t75 = TextOps.t75Collocations(spark, dirtyDir).collect()
    // the repeated long doc supplies bigrams with support >= 2 docs; the
    // support floor of 3 may legitimately yield an empty result — the
    // contract is "no throw", not "non-empty"
    assert(t75.forall(_.getLong(2) >= 3))
  }

  test("mixing/stats ops keep partitions consistent on the dirty corpus") {
    val stats = TextOps.t58SourceStats(spark, dirtyDir)
    val total = stats.agg(sum("n_docs")).head().getLong(0)
    assert(total == 7L)
    val mix = TextOps.t72TempMixing(spark, dirtyDir).collect()
    assert(mix.forall(r => r.getLong(3) <= r.getLong(1)))
  }

  test("substring dedup and shuffle-shard survive the dirty corpus") {
    val t87 = TextOps.t87ExactSubstring(spark, dirtyDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every doc appears — null/empty/short texts with zero windows, kept
    assert(t87.size == 7)
    for (id <- 1L to 5L) {
      assert(t87(id).getAs[Long]("n_windows") == 0L, s"doc $id")
      assert(t87(id).getAs[Boolean]("keep"), s"doc $id")
    }
    // docs 6 and 7 are the same exact 20-word text: one window each,
    // cross-document, the whole doc duplicated -> rejected
    for (id <- Seq(6L, 7L)) {
      assert(t87(id).getAs[Long]("n_windows") == 1L)
      assert(t87(id).getAs[Long]("n_dup_windows") == 1L)
      assert(t87(id).getAs[Long]("longest_dup_span") == 20L)
      assert(!t87(id).getAs[Boolean]("keep"))
    }
    CacheRegistry.harness.release()
    // sharding is text-independent: null text shards like any other doc
    val t88 = TextOps.t88ShuffleShard(spark, dirtyDir)
    assert(t88.count() == 7L)
    assert(t88.filter(col("shard").isNull || col("ord").isNull)
      .count() == 0)
  }

  test("substring removal handles a FULLY-covered doc and degenerate texts") {
    // docs 6 and 7 are the same exact 20-word text: doc 6 is the corpus
    // first occurrence and keeps every token; doc 7's single window is
    // removed, covering ALL its positions — the array_except rebuild's
    // everything-removed path (a long fully-duplicated doc is d89's
    // designed worst case)
    val d89 = TextOps.d89SubstringRemoval(spark, dirtyDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(d89.size == 7)
    assert(d89(6L).getAs[Long]("n_removed") == 0L)
    assert(d89(6L).getAs[String]("text_kept").nonEmpty)
    assert(d89(7L).getAs[Long]("n_removed") == 20L)
    assert(d89(7L).getAs[String]("text_kept") == "")
    // null/empty/short docs: no windows, nothing removed, pass through
    for (id <- 1L to 5L)
      assert(d89(id).getAs[Long]("n_removed") == 0L, s"doc $id")
    CacheRegistry.harness.release()
  }

  test("url and semantic dedup survive the dirty corpus") {
    // d93 reads only (doc_id, source): null texts are irrelevant, every
    // doc labels with a canonical URL and exactly one keeper per group
    val d93 = TextOps.d93UrlDedup(spark, dirtyDir)
    assert(d93.count() == 7L)
    assert(d93.filter(col("canon_url").isNull).count() == 0)
    CacheRegistry.harness.release()
    // d92 on two vectors, one of them all-zero: the zero vector gets the
    // pinned similarity-0 assignment and can never pair (cosine with a
    // zero norm is not >= the floor); no throw, both vectors labeled
    val d92 = VectorOps.d92IncrementalSemDedup(spark, dirtyDir).collect()
    assert(d92.length == 2)
    assert(d92.forall(_.getAs[Boolean]("keeper")))
    CacheRegistry.harness.release()
  }

  test("bigram LM one-shot and incremental agree on the dirty corpus") {
    // null/empty/one-word docs have zero adjacent pairs — they must
    // score 0 with 0 positions (not drop, not throw), and the
    // incremental == one-shot identity must hold on degenerate input
    // too (the even/odd split here puts the null-text doc in a batch)
    val one = TextOps.t157BigramLm(spark, dirtyDir)
      .collect().map(_.toSeq).toSeq
    CacheRegistry.harness.release()
    assert(one.length == 7)
    val zeroed = one.filter(r => Seq(1L, 2L, 3L, 4L)
      .contains(r.head.asInstanceOf[Long]))
    assert(zeroed.forall(r => r(1) == 0L && r(3) == 0.0),
      s"pairless docs must score 0 with 0 positions: $zeroed")
    val inc = TextOps.d158IncrementalLm(spark, dirtyDir)
      .collect().map(_.toSeq).toSeq
    CacheRegistry.harness.release()
    assert(inc == one,
      "incremental LM must equal the one-shot on the dirty corpus")
  }

  test("incremental ANN index builders survive the dirty corpus") {
    // v120 on two vectors (one all-zero, one normal): the evens-trained
    // codebook has a single list, both vectors assign to it (a one-row
    // argmax cannot throw on the zero vector's NaN similarity), and each
    // query scores exactly the other vector
    val v120 = VectorOps.v120IncrementalIvf(spark, dirtyDir).collect()
    assert(v120.length == 2)
    assert(v120.map(_.getAs[Long]("query_id")).toSet == Set(1L, 2L))
    // the all-zero query's cosines are 0/0 — the scoring path must pin
    // them to 0.0 (the ivfScore nanvl guard), never serve NaN-ranked rows
    assert(v120.forall(r => !r.getAs[Double]("sim_r").isNaN),
      s"NaN sim served for a zero-norm query: ${v120.mkString(",")}")
    CacheRegistry.harness.release()
    // v121 on dim-2 vectors: subspace slices beyond the array length are
    // empty lists, whose dot products are 0.0 — assignment degrades to the
    // cid tiebreak instead of throwing, and the ADC scores still produce
    // one row per (query, other-vector)
    val v121 = VectorOps.v121IncrementalPq(spark, dirtyDir).collect()
    assert(v121.length == 2)
    assert(v121.map(_.getAs[Long]("query_id")).toSet == Set(1L, 2L))
    CacheRegistry.harness.release()
  }
}
