package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The update (CDC/re-crawl) semantics behind d131: a revision is a
  * tombstone heal plus a re-ingest under the SAME doc_id. This spec pins
  * the two keeper-state directions a revision can move —
  *
  *  - DEMOTE: the revised doc leaves its old fingerprint group; if it
  *    was that group's keeper, the next-min survivor promotes
  *    ([[TextOps.tombstoneHeal]]'s path);
  *  - PROMOTE: the revised doc's new fingerprint joins a group where its
  *    id is the minimum, demoting that group's previous keeper through
  *    the min-merge re-ingest —
  *
  * and that the composed heal+reingest state equals the one-shot keeper
  * state of the updated corpus.
  */
class UpdateReingestSpec extends SparkSpec {

  private def keeperOf(df: DataFrame): Map[String, Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("a revision can demote its old group's keeper heir and promote " +
      "itself over its new group's keeper") {
    val s = spark
    import s.implicits._
    // fingerprint stand-ins: docs 1,2 share fp "a" (keeper 1); docs
    // 5,9 share fp "b" (keeper 5). Doc 1 is revised and its new text
    // lands in group "b", where id 1 undercuts keeper 5.
    val members = Seq((1L, "a"), (2L, "a"), (5L, "b"), (9L, "b"))
      .toDF("doc_id", "fp")
    val state = members.groupBy("fp").agg(min("doc_id").as("keeper"))
    val updated = Seq(1L).toDF("doc_id")
    val live = members.join(updated, Seq("doc_id"), "left_anti")
    val healed = TextOps.tombstoneHeal(state, live, updated, "fp")
    // after the heal alone: group "a" promoted to 2 (the demote side)
    assert(keeperOf(healed) == Map("a" -> 2L, "b" -> 5L))
    // re-ingest the revised row under its new fingerprint
    val revised = Seq((1L, "b")).toDF("doc_id", "fp")
    val newState = healed
      .unionByName(revised.groupBy("fp").agg(min("doc_id").as("keeper")))
      .groupBy("fp").agg(min("keeper").as("keeper"))
    // the revised doc PROMOTES itself over group b's old keeper
    assert(keeperOf(newState) == Map("a" -> 2L, "b" -> 1L))
    // and the composition equals the one-shot state of the updated corpus
    val oneShot = live.unionByName(revised)
      .groupBy("fp").agg(min("doc_id").as("keeper"))
    assert(keeperOf(newState) == keeperOf(oneShot))
  }

  test("a revised group left empty drops; a fresh fingerprint creates " +
      "its group") {
    val s = spark
    import s.implicits._
    // doc 4 is the ONLY member of fp "c"; its revision moves it to a
    // brand-new fingerprint "d"
    val members = Seq((4L, "c"), (6L, "e")).toDF("doc_id", "fp")
    val state = members.groupBy("fp").agg(min("doc_id").as("keeper"))
    val updated = Seq(4L).toDF("doc_id")
    val live = members.join(updated, Seq("doc_id"), "left_anti")
    val healed = TextOps.tombstoneHeal(state, live, updated, "fp")
    assert(keeperOf(healed) == Map("e" -> 6L), "emptied group must leave")
    val revised = Seq((4L, "d")).toDF("doc_id", "fp")
    val newState = healed
      .unionByName(revised.groupBy("fp").agg(min("doc_id").as("keeper")))
      .groupBy("fp").agg(min("keeper").as("keeper"))
    assert(keeperOf(newState) == Map("e" -> 6L, "d" -> 4L))
  }

  test("d131 pair heal: stale pairs leave, re-probed pairs equal the " +
      "one-shot candidate set of the updated corpus") {
    val s = spark
    import s.implicits._
    // three near-identical docs (one dup class) plus one unrelated; doc
    // 2's revision changes its shingles enough to leave the class
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, base), (1L, base), (2L, base),
      (3L, "an entirely different document about distributed systems " +
        "engineering practice")).toDF("doc_id", "text")
    val revisedText = "completely rewritten content with no resemblance " +
      "to the previous page at all whatsoever"
    val updated = Seq(2L).toDF("doc_id")
    val revised = Seq((2L, revisedText)).toDF("doc_id", "text")
    val empty = TextOps.minhashSignatures(docs.filter(lit(false)))
    val (sigs1, p1) = TextOps.incrementalMinhashDedup(empty, docs)
    val sigsLive = sigs1.join(updated, Seq("doc_id"), "left_anti")
    val pairsLive = p1.select("d1", "d2")
      .join(updated.withColumnRenamed("doc_id", "d1"), Seq("d1"), "left_anti")
      .join(updated.withColumnRenamed("doc_id", "d2"), Seq("d2"), "left_anti")
    val (_, pNew) = TextOps.incrementalMinhashDedup(sigsLive, revised)
    // re-select by name: the Seq-key anti-joins move the join column
    // first, so a positional read of pairsLive would swap (d1, d2)
    val healedPairs = pairsLive.select("d1", "d2")
      .unionByName(pNew.select("d1", "d2"))
    // one-shot over the updated corpus
    val docs2 = docs.filter(col("doc_id") =!= 2L).unionByName(revised)
    val (_, oneShot) = TextOps.incrementalMinhashDedup(empty, docs2)
    val got = healedPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = oneShot.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got $got want $want")
    // the revision genuinely removed pairs: doc 2 paired before, not after
    assert(want.forall(p => p._1 != 2L && p._2 != 2L))
    assert(p1.filter(col("d1") === 2L || col("d2") === 2L).count() > 0)
    CacheRegistry.harness.release()
  }
}
