package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** BPE tokenizer-family invariants (exact outputs are oracle-checked at
  * sf0.001/sf0.01; this spec pins the properties that must hold at ANY
  * corpus size or partitioning):
  *  - the delimiter-rendered `replace` application IS leftmost-greedy
  *    single-rule BPE, including the two hazard cases that break naive
  *    space-delimited encodings (overlapping candidates, prefix/suffix
  *    symbol collisions);
  *  - the learned merge table is invariant under input partitioning (the
  *    integer-count + total-order-tiebreak determinism claim);
  *  - token accounting is conserved: each merge round reduces a word's
  *    symbol count by exactly the number of applied merges, and the final
  *    per-doc BPE count is ≤ the character+marker count and ≥ the word
  *    count.
  */
class BpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def applied(seq: String, pair: String): String = {
    val s = spark
    import s.implicits._
    Seq(seq).toDF("seq")
      .select(BpeOps.applyMerge(col("seq"), lit(pair)).as("out"))
      .head().getString(0)
  }

  test("merge application is leftmost-greedy, non-overlapping") {
    // overlapping candidates: a a a a + (a,a) -> aa aa, never aa a a
    assert(applied(" a, a, a, a,", "a a") == " aa, aa,")
    // odd run: a a a -> aa a (leftmost pair wins, tail survives)
    assert(applied(" a, a, a,", "a a") == " aa, a,")
    // the merged token never cascades within the same round:
    // a b b + (a,b) -> ab b (ab != a, so the second b stays)
    assert(applied(" a, b, b,", "a b") == " ab, b,")
    assert(applied(" a, a, b,", "a b") == " a, ab,")
  }

  test("delimiters block prefix/suffix symbol collisions") {
    // PREFIX hazard: rule (a,b) must not fire on [a, bc] — 'b' is a
    // prefix of 'bc' (a space-only encoding " a b..." merges it wrongly)
    assert(applied(" a, bc,", "a b") == " a, bc,")
    // SUFFIX hazard: rule (a,b) must not fire on [ba, b] — 'a' is a
    // suffix of 'ba'
    assert(applied(" ba, b,", "a b") == " ba, b,")
    // and the legitimate occurrence still fires with longer symbols about
    assert(applied(" bc, a, b, a,", "a b") == " bc, ab, a,")
  }

  test("learned merges are invariant under input partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val r1 = BpeOps.learnBpeOn(docs)._2
    CacheRegistry.harness.release()
    val r2 = BpeOps.learnBpeOn(docs.repartition(7))._2
    CacheRegistry.harness.release()
    assert(r1 == r2, s"merge tables diverged:\n$r1\n$r2")
    assert(r1.size == BpeOps.BpeMerges)
    // rules are genuine merges: every pair has two non-empty sides and a
    // positive integer count
    assert(r1.forall(m => m.pair.split(" ").length == 2 && m.cnt > 0))
  }

  test("token accounting is conserved per round and bounded per doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val v0 = BpeOps.bpeVocab0(docs).persist()
    val (vK, rules) = BpeOps.learnBpeOn(docs)
    // chars + end marker is the symbol ceiling; every applied merge
    // removes exactly one symbol, so len0 - lenK = total merges applied
    val sy = (c: org.apache.spark.sql.Column) =>
      size(split(c.substr(lit(2), length(c) - 2), ", "))
    val joined = v0.select(col("word"), sy(col("seq")).as("n0"))
      .join(vK.select(col("word"), sy(col("seq")).as("nk")), Seq("word"))
    assert(joined.filter(col("n0") =!= length(col("word")) + 1).count() == 0)
    assert(joined.filter(col("nk") > col("n0") || col("nk") < 1)
      .count() == 0)
    // at least one word actually got shorter (10 rules on a real corpus)
    assert(joined.filter(col("nk") < col("n0")).count() > 0)
    // per-doc bounds: word count <= BPE tokens <= char+marker-ish ceiling
    val t = BpeOps.t140BpeTokenize(spark, sf).persist()
    assert(t.filter(col("n_bpe_tokens") < col("n_words")).count() == 0)
    assert(rules.size == BpeOps.BpeMerges)
    v0.unpersist()
    t.unpersist()
    CacheRegistry.harness.release()
  }

  test("rule fold == learned vocab on train words; unseen words fold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 9)
    val held = docs.filter(col("doc_id") % 10 === 9)
    val (vK, rules) = BpeOps.learnBpeOn(train)
    // the serving fold must reproduce the learned vocab's sequences for
    // every word the learning loop saw (the vocab IS a cache of the fold)
    val folded = BpeOps.tokTableFor(train, rules.map(_.pair))
    val mismatch = vK.select(col("word"), col("seq").as("learned"))
      .join(folded.select(col("word"), col("seq").as("served")), Seq("word"))
      .filter(col("learned") =!= col("served"))
    assert(mismatch.count() == 0,
      "rule fold diverged from the learned vocab on a training word")
    // the generalization claim is non-vacuous: the fold tokenizes words
    // the learning loop NEVER saw (at this sf the held-out split happens
    // to share the train vocabulary, so pin the unseen path synthetically:
    // a novel word must get a valid fold-built sequence, not a vocab row)
    val s = spark
    import s.implicits._
    val novel = Seq((0L, "zzyzxq plain")).toDF("doc_id", "text")
    val novelTok = BpeOps.tokTableFor(novel, rules.map(_.pair)).persist()
    assert(novelTok
      .join(vK.select("word"), Seq("word"), "left_anti")
      .filter(col("word") === "zzyzxq").count() == 1,
      "the synthetic word must be outside the learned vocab")
    val zz = novelTok.filter(col("word") === "zzyzxq").head()
    assert(zz.getAs[String]("seq").startsWith(" z") &&
      zz.getAs[Long]("n_toks") >= 1 && zz.getAs[Long]("n_toks") <= 7,
      "the unseen word must fold to a bounded symbol sequence")
    novelTok.unpersist()
    // and t146 covers exactly the held-out docs
    val out = BpeOps.t146BpeHeldout(spark, sf)
    assert(out.filter(col("doc_id") % 10 =!= 9).count() == 0)
    assert(out.count() == held.count())
    CacheRegistry.harness.release()
  }

  test("driver-local learn == distributed learn, rule for rule") {
    // the realistic-K production path (collect the Heaps-bounded vocab,
    // learn in memory) must produce the IDENTICAL merge sequence as the
    // oracle-checked distributed loop — same weighted counts, same
    // (count DESC, pair ASC) argmax, same leftmost-greedy application
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val local = BpeOps.learnBpeDriverLocal(docs)
    val (_, distributed) = BpeOps.learnBpeOn(docs)
    assert(local == distributed,
      s"local=$local\ndistributed=$distributed")
    CacheRegistry.harness.release()
  }

  test("served vocab (local rules + fold) == distributed loop's vocab") {
    // the r20 query path: rules learned driver-locally, the serving
    // vocab built as ONE map-side fold of those rules over vocab0 —
    // must equal the distributed loop's incrementally-built vocab row
    // for row (word, freq, seq), since the fold in learn order IS the
    // round-by-round application
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (served, localRules) = BpeOps.learnBpeServed(docs)
    val (vK, distRules) = BpeOps.learnBpeOn(docs)
    assert(localRules == distRules)
    val l = served.select(col("word"), col("freq"), col("seq"))
    val r = vK.select(col("word"), col("freq"), col("seq"))
    assert(l.exceptAll(r).count() == 0 && r.exceptAll(l).count() == 0,
      "served vocab table diverged from the distributed loop's")
    CacheRegistry.harness.release()
  }

  test("driver-local learn stops cleanly when the pair table exhausts") {
    // the realistic-K path must tolerate k far beyond what a small
    // vocabulary can supply: once every word is fully merged to one
    // symbol there are no adjacent pairs left, and the loop must return
    // the rules learned so far instead of reducing an empty collection
    val s = spark
    import s.implicits._
    val tiny = Seq((0L, "ab ab"), (1L, "ab")).toDF("doc_id", "text")
    val rules = BpeOps.learnBpeDriverLocal(tiny, k = 1000)
    assert(rules.nonEmpty && rules.length < 1000,
      s"expected early exhaustion, got ${rules.length} rules")
    // the learned prefix at the same k matches the un-exhausted learn
    val prefix = BpeOps.learnBpeDriverLocal(tiny, k = rules.length)
    assert(prefix == rules)
    CacheRegistry.harness.release()
  }

  test("pack ids consume the budget contiguously per shard") {
    val out = BpeOps.t141BpePack(spark, sf).persist()
    // offsets are within budget, pack ids non-negative and consistent
    // with the exclusive cumulative start: start = pack_id*512 + offset
    assert(out.filter(col("pack_offset") < 0 || col("pack_offset") >= 512)
      .count() == 0)
    assert(out.filter(col("pack_id") < 0).count() == 0)
    // within a shard, ordered by doc_id, starts are non-decreasing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    val bad = out
      .withColumn("start", col("pack_id") * 512 + col("pack_offset"))
      .withColumn("prev", lag("start", 1).over(w))
      .filter(col("prev").isNotNull && col("start") < col("prev"))
    assert(bad.count() == 0)
    out.unpersist()
    CacheRegistry.harness.release()
  }
}
