package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Streaming density pruning: the accumulated frozen-codebook assignment
  * state must serve the fixed-codebook one-shot's pruning decision
  * bit-exactly at every point of the lifecycle — across two ingest
  * batches, a revision (re-delivered vec_id with a new embedding, which
  * must MOVE the vector's cluster and re-rank both affected clusters),
  * and a tombstoned delete (which must shift the dead vector's cluster
  * ranks and n). The one-shot comparator is the v156 serve itself
  * (assignToCentroids + prototypicalityRanks at the same frozen
  * codebook) over the corpus as it stands after each step.
  */
class DensityStreamSpec extends SparkSpec {

  test("density-prune stream == fixed-codebook one-shot across revision and delete") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("densitystream").toString
    val state = s"$dir/assign"
    val codebookPath = s"$dir/codebook"

    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    // frozen codebook: trained offline on the even half (the v156 shape)
    graft.ops.VectorOps.trainCodebook(s,
        corpus.filter(_._1 % 2 == 0).toSeq.toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(codebookPath)
    val codebook = s.read.parquet(codebookPath)

    def oneShot(current: Seq[(Long, Seq[Float])]): Seq[Row5] = {
      val ranks = graft.ops.VectorOps.prototypicalityRanks(s,
        graft.ops.VectorOps.assignToCentroids(s,
          current.toDF("vec_id", "embedding"), codebook),
        codebook)
      collectRanks(ranks)
    }
    def served(): Seq[Row5] =
      collectRanks(StreamOps.densityPruneServed(s, state, codebookPath)
        .orderBy("vec_id"))

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.densityPruneStream(s,
      mem.toDF().toDF("vec_id", "embedding"), codebookPath, state)

    // two ingest batches
    val (b1, b2) = corpus.partition(_._1 % 2 == 0)
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    assert(served() == oneShot(corpus.toSeq),
      "two-batch state must serve the one-shot decision")

    // revision: every 17th vector re-delivers REVERSED (moves clusters)
    val revised = corpus.filter(_._1 % 17 == 0)
      .map { case (id, e) => (id, e.reverse) }
    assert(revised.nonEmpty)
    mem.addData(revised.toSeq: _*); q.processAllAvailable()
    q.stop()
    val afterRev = corpus.map { case (id, e) =>
      if (id % 17 == 0) (id, e.reverse) else (id, e) }.toSeq
    assert(served() == oneShot(afterRev),
      "a revision must move the vector and re-rank its clusters")
    // the revision genuinely moved at least one vector between clusters
    val cidOf = (rows: Seq[Row5]) => rows.map(r => r._1 -> r._2).toMap
    val before = cidOf(oneShot(corpus.toSeq))
    val after = cidOf(oneShot(afterRev))
    assert(revised.exists { case (id, _) => before(id) != after(id) },
      "the reversed re-delivery should move clusters — weak test data")

    // delete: tombstone every 23rd vector; served ranks re-close over
    // the survivors
    val dead = corpus.map(_._1).filter(_ % 23 == 0)
    assert(dead.nonEmpty)
    val tmem = MemoryStream[Long]
    val tq = StreamOps.tombstoneStream(s, tmem.toDF().toDF("vec_id"),
      state, "vec_id")
    tmem.addData(dead.toSeq: _*); tq.processAllAvailable(); tq.stop()
    assert(served() == oneShot(afterRev.filterNot(v => v._1 % 23 == 0)),
      "a tombstoned vector must leave its cluster's ranks and n")

    // compaction: the density state IS the semantic-assignment schema,
    // so compactSemanticState is its compaction; compacted serve ≡
    // direct ≡ one-shot, and a post-compaction delete re-ranks exactly
    s.sql("DROP TABLE IF EXISTS density_state_spec")
    StreamOps.compactSemanticState(s, state, "density_state_spec",
      s"$dir/compacted")
    val live = afterRev.filterNot(v => v._1 % 23 == 0)
    assert(collectRanks(StreamOps.densityPruneCompacted(s,
        "density_state_spec", codebookPath).orderBy("vec_id"))
      == oneShot(live),
      "compacted serve must equal the one-shot over the survivors")
    val lateDead = live.map(_._1).filter(_ % 29 == 3)
    assert(lateDead.nonEmpty)
    import s.implicits._
    assert(collectRanks(StreamOps.densityPruneCompacted(s,
        "density_state_spec", codebookPath,
        Some(lateDead.toDF("vec_id"))).orderBy("vec_id"))
      == oneShot(live.filterNot(v => lateDead.contains(v._1))),
      "a post-compaction delete must leave its cluster's ranks and n")
    s.sql("DROP TABLE IF EXISTS density_state_spec")
    graft.ops.CacheRegistry.harness.release()
  }

  test("within-batch double delivery collapses to one deterministic row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("densitybatch").toString
    val state = s"$dir/assign"
    val codebookPath = s"$dir/codebook"
    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .filter(_._1 < 40)
    graft.ops.VectorOps.trainCodebook(s,
        corpus.filter(_._1 % 2 == 0).toSeq.toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(codebookPath)
    val codebook = s.read.parquet(codebookPath)

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.densityPruneStream(s,
      mem.toDF().toDF("vec_id", "embedding"), codebookPath, state)
    mem.addData(corpus.toSeq: _*); q.processAllAvailable()
    // ONE trigger delivers TWO revisions of the same vec_ids — without
    // the within-batch collapse both rows share a batch id and the
    // served winner is whichever a partition-order tie-break picks; the
    // contract is the deterministic array-lexicographic max
    val dup = corpus.filter(_._1 % 5 == 0)
    assert(dup.nonEmpty)
    val both = dup.flatMap { case (id, e) =>
      Seq((id, e.reverse), (id, e.map(x => -x))) }
    mem.addData(both.toSeq: _*); q.processAllAvailable(); q.stop()

    def lexMax(a: Seq[Float], b: Seq[Float]): Seq[Float] = {
      val firstDiff = a.zip(b).collectFirst { case (x, y) if x != y => x > y }
      if (firstDiff.getOrElse(a.length >= b.length)) a else b
    }
    val expected = corpus.map { case (id, e) =>
      if (id % 5 == 0) (id, lexMax(e.reverse, e.map(x => -x))) else (id, e)
    }.toSeq
    val ranks = graft.ops.VectorOps.prototypicalityRanks(s,
      graft.ops.VectorOps.assignToCentroids(s,
        expected.toDF("vec_id", "embedding"), codebook), codebook)
    assert(collectRanks(StreamOps.densityPruneServed(s, state, codebookPath)
        .orderBy("vec_id")) == collectRanks(ranks),
      "a same-batch double delivery must serve the deterministic max")
    graft.ops.CacheRegistry.harness.release()
  }

  private type Row5 = (Long, Int, Long, Long, Boolean)

  private def collectRanks(df: org.apache.spark.sql.DataFrame): Seq[Row5] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSeq
}
