package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariants for the round-16 curation operators (exact outputs are
  * oracle-checked at sf0.001/sf0.01; these properties must hold at ANY
  * corpus size or partitioning):
  *  - t163 decontamination: no eval-fold doc is ever flagged, overlap
  *    counts are positive and non-increasing in rank, the output is
  *    top-N-bounded, and the plan is the scale contract — the eval gram
  *    set joins BROADCAST (a benchmark is bounded regardless of corpus
  *    size) and the top-N is TakeOrderedAndProject, never a global sort;
  *  - t164 mixture sampling: the k-bounded-aggregator selection equals
  *    the window formulation row-for-row (the q73/q06 twin standard),
  *    per-domain counts equal the quota formula computed independently,
  *    and the plan contains NO Window over the corpus — the whole point
  *    of the aggregator form.
  */
class Round16OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t163 flags only train docs, bounded and ordered") {
    val out = TextOps.t163Decontamination(spark, sf).persist()
    val rows = out.collect()
    CacheRegistry.harness.release()
    assert(rows.nonEmpty && rows.length <= TextOps.DecontamTopN)
    assert(rows.forall(r =>
      r.getLong(0) % TextOps.DecontamEvalMod != TextOps.DecontamEvalRem),
      "an eval-fold doc must never be flagged as contaminated train data")
    assert(rows.forall(_.getLong(1) >= 1L),
      "every flagged doc shares at least one eval shingle")
    val ov = rows.map(_.getLong(1)).toSeq
    assert(ov == ov.sorted.reverse, "overlap must be non-increasing")
    out.unpersist()
  }

  test("t163 plan: eval grams broadcast, top-N never a global sort") {
    val plan = TextOps.t163Decontamination(spark, sf)
      .queryExecution.executedPlan.toString
    CacheRegistry.harness.release()
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval gram set must broadcast into the train side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the contamination join must never shuffle the corpus side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-N must be per-partition top-k, not a global sort:\n$plan")
  }

  test("t164 equals the window formulation and honors the quota formula") {
    val s = spark
    val got = TextOps.t164MixtureSample(s, sf).collect().map(_.toSeq).toSeq

    // independent window-form twin: rank per lang on (uh, doc_id), same
    // quota arithmetic
    val u = graft.Tables.documents(s, sf).select(col("doc_id"), col("lang"))
      .withColumn("uh",
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long"))
      .withColumn("w", when(col("lang") === "en", 4)
        .when(col("lang") === "zh", 3).otherwise(1))
      .persist()
    val tw = u.select("lang", "w").distinct()
      .agg(sum("w")).head.getLong(0)
    val win = Window.partitionBy("lang").orderBy(col("uh"), col("doc_id"))
    val expected = u
      .withColumn("rn", row_number().over(win).cast("long"))
      .filter(col("rn") <= greatest(lit(1),
        floor(lit(TextOps.MixSampleK) * col("w") / lit(tw))))
      .select("lang", "doc_id", "rn")
      .orderBy("lang", "rn")
      .collect().map(_.toSeq).toSeq
    assert(got == expected,
      "the aggregator form must equal the window form row-for-row")

    // per-domain counts == min(group size, quota)
    val sizes = u.groupBy("lang").agg(count(lit(1)).as("n"),
      first("w").as("w")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val counts = got.groupBy(_.head).view.mapValues(_.size.toLong).toMap
    sizes.foreach { case (lang, n, w) =>
      val quota = math.max(1L, TextOps.MixSampleK.toLong * w / tw)
      assert(counts(lang) == math.min(n, quota),
        s"$lang: got ${counts(lang)}, want min($n, $quota)")
    }
    u.unpersist()
  }

  test("t166 packs every token exactly once, chunk-aligned, sharded window") {
    val s = spark
    val out = TextOps.t166SequencePack(s, sf).collect()
    val l = TextOps.SeqPackLen
    // per shard: chunks contiguous from 0, boundary offsets inside their
    // chunk, and the boundary map accounts for every doc and token
    val docs = graft.Tables.documents(s, sf)
      .select(col("doc_id"), size(split(trim(lower(col("text"))), "\\s+"))
        .cast("long").as("ntok"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("uh"))
      .withColumn("shard", col("uh") % TextOps.SeqPackShards)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("ntok").as("tok"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    out.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      val chunks = rows.map(_.getLong(1)).sorted.toSeq
      assert(chunks == (0L until chunks.length).toSeq,
        s"shard $shard chunks must be contiguous from 0: $chunks")
      rows.foreach { r =>
        val (chunk, off) = (r.getLong(1), r.getLong(3))
        assert(off >= chunk * l && off < (chunk + 1) * l,
          s"boundary offset $off outside chunk $chunk")
      }
      assert(rows.map(_.getLong(4)).sum == docs(shard)._1,
        s"shard $shard boundary map must account for every doc")
      assert(rows.map(_.getLong(5)).sum == docs(shard)._2,
        s"shard $shard boundary map must account for every token")
    }
    // the prefix sum runs per shard, never unpartitioned
    val plan = TextOps.t166SequencePack(s, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(shard"),
      s"the running sum must partition by shard:\n$plan")
  }

  test("t164 plan: k-bounded aggregation, no Window over the corpus") {
    val plan = TextOps.t164MixtureSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"the per-domain selection must be the typed aggregator:\n$plan")
    assert(!plan.contains("Window"),
      s"a Window over a 5-value domain would funnel the corpus " +
        s"through 5 tasks at scale:\n$plan")
  }
}
