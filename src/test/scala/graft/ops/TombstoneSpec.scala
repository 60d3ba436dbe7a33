package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}

/** Tombstone-delete semantics for min-keeper dedup state (d123):
  * promotion fires only when a group's keeper dies, fully-deleted groups
  * leave the state, untouched groups pass through, and a replayed
  * tombstone batch is a no-op (the healed state is a fixpoint).
  */
class TombstoneSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "doc_id")
  }

  test("heal promotes only dead-keeper groups; empty groups leave") {
    val members = df(Seq(
      ("a", 3L), ("a", 10L), ("a", 17L), // keeper 3 dies -> promote 10
      ("b", 1L), ("b", 8L),              // untouched
      ("c", 24L),                        // fully deleted -> group leaves
      ("d", 5L), ("d", 31L)))            // non-keeper 31 dies -> keeper 5 stays
    val deleted = df(Seq(("x", 3L), ("x", 24L), ("x", 31L))).select("doc_id")
    val state0 = members.groupBy("k").agg(min("doc_id").as("keeper"))
    val live = members.join(deleted, Seq("doc_id"), "left_anti")
    val healed = TextOps.tombstoneHeal(state0, live, deleted, "k")
    val got = healed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 10L, "b" -> 1L, "d" -> 5L), got.toString)
  }

  test("replayed tombstone batch is a no-op (fixpoint)") {
    val members = df(Seq(("a", 3L), ("a", 10L), ("b", 1L)))
    val deleted = df(Seq(("x", 3L))).select("doc_id")
    val state0 = members.groupBy("k").agg(min("doc_id").as("keeper"))
    val live = members.join(deleted, Seq("doc_id"), "left_anti")
    val once = TextOps.tombstoneHeal(state0, live, deleted, "k")
    val twice = TextOps.tombstoneHeal(once, live, deleted, "k")
    assert(once.exceptAll(twice).count() == 0 &&
      twice.exceptAll(once).count() == 0)
  }

  test("null group keys promote null-safely") {
    val s = spark
    import s.implicits._
    val members = Seq((Option.empty[String], 3L), (Option.empty[String], 12L),
      (Some("a"), 5L)).toDF("k", "doc_id")
    val deleted = Seq(3L).toDF("doc_id")
    val state0 = members.groupBy("k").agg(min("doc_id").as("keeper"))
    val live = members.join(deleted, Seq("doc_id"), "left_anti")
    val healed = TextOps.tombstoneHeal(state0, live, deleted, "k")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(healed == Map(None -> 12L, Some("a") -> 5L), healed.toString)
  }

  test("d123 drops deleted docs and equals the survivor-only one-shot") {
    val d = "/root/testdata/sf0.001"
    val out = TextOps.d123TombstoneDedup(spark, d)
    assert(out.filter(col("doc_id") % 7 === 3).count() == 0)
    // survivor-only one-shot twin, built independently of the heal path
    val canon = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val live = graft.Tables.documents(spark, d)
      .filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), md5(canon).as("fp"),
        TextOps.canonicalizeUrl(
          TextOps.syntheticUrl(col("doc_id"), col("source")))
          .as("canon_url")).persist()
    CacheRegistry.harness.add(live)
    val fk = live.groupBy("fp").agg(min("doc_id").as("tkeeper"))
      .withColumnRenamed("fp", "kfp")
    val uk = live.groupBy("canon_url").agg(min("doc_id").as("ukeeper"))
    val expected = live.join(fk, col("fp") <=> col("kfp"))
      .join(uk, Seq("canon_url"))
      .select(col("doc_id"),
        (col("doc_id") === col("tkeeper")).as("keep_text"),
        (col("doc_id") === col("ukeeper")).as("keep_url"))
      .withColumn("kept", col("keep_text") && col("keep_url"))
    assert(out.exceptAll(expected).count() == 0 &&
      expected.exceptAll(out).count() == 0)
    CacheRegistry.harness.release()
  }
}
