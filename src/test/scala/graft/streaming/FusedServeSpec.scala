package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.{FusionOps, TextOps, VectorOps}

/** The production hybrid-retrieval read path: fusedServe composes the two
  * COMPACTED serving layouts (term-bucketed BM25 postings + clabel-
  * bucketed residual-IVFADC codes) through the shared fusion tail, and
  * must answer bit-exactly what t150's in-query fusion answers over the
  * same corpus (the compacted-≡-direct standard DsirStreamSpec set).
  * Both sides' plan properties must survive the composition: each state
  * scan bucket-pruned, stats from the 1-row artifact, `.dl` scanned
  * once. Tombstones heal BOTH sides exactly — pinned against serving
  * layouts physically rebuilt from the survivors.
  */
class FusedServeSpec extends SparkSpec {

  test("fusedServe over compacted layouts == t150 in-query fusion") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("fusedserve").toString
    val sf = "/root/testdata/sf0.001"
    s.sql("DROP TABLE IF EXISTS fused_bm25_spec")
    s.sql("DROP TABLE IF EXISTS fused_ivfpq_spec")
    s.sql("DROP TABLE IF EXISTS fused_bm25_spec_t")
    s.sql("DROP TABLE IF EXISTS fused_ivfpq_spec_t")

    // lexical serving state: one postings partition, compacted into the
    // term-bucketed layout + .dl/.stats artifacts
    val docs = graft.Tables.documents(s, sf).select("doc_id", "text")
    val state = s"$dir/poststate"
    TextOps.docPostings(docs)
      .write.mode("overwrite").parquet(s"$state/batch=0")
    StreamOps.compactPostingsState(s, state, "fused_bm25_spec",
      s"$dir/bm25c")

    // dense serving state: the v133/v134 frozen artifacts (trained
    // exactly as the in-query chain trains them), code table compacted
    // into the clabel-bucketed layout
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").persist()
    val cent = VectorOps.ivfCodebookOn(emb).persist()
    val assigned = VectorOps.assignToIvfLists(s, emb, cent,
      carry = Seq("label"))
    val subs = VectorOps.pqSubvectors(
      VectorOps.residualOf(assigned, cent, carry = Seq("label")),
      carry = Seq("clabel", "label")).persist()
    val cb = VectorOps.trainPqCodebooksOn(s, subs,
      col("vec_id") < VectorOps.PqK).persist()
    val codes = VectorOps.encodePq(s, subs, cb,
      carry = Seq("clabel", "label"))
      .select("vec_id", "clabel", "m", "cid", "label").persist()
    VectorOps.writeIvfPqBucketedState(codes, "fused_ivfpq_spec",
      s"$dir/ivfpqc", overwrite = true)

    // query inputs — the t150 derivation (production receives these)
    val tf = TextOps.docPostings(docs).persist()
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3)
    val wq = Window.partitionBy("query_id")
      .orderBy(col("df").asc, col("term"))
    val qmap = tf.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("term"))
      .join(dfq, Seq("term"))
      .withColumn("qrn", row_number().over(wq)).filter(col("qrn") <= 3)
      .select("query_id", "term").persist()
    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding")
    val rawVecs = emb.select("vec_id", "embedding")

    val fused = StreamOps.fusedServe(s, "fused_bm25_spec", s"$dir/bm25c",
      qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs)
    val got = fused.collect().map(_.toSeq).toSeq
    val expected = FusionOps.t150HybridFusion(s, sf)
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(expected.nonEmpty)
    assert(got == expected,
      "the serving-layout fusion must answer the in-query fusion" +
        s"\ngot:      $got\nexpected: $expected")

    // both sides' plan properties survive the composition
    val exec = fused.queryExecution.executedPlan
    val prunedRoots = graft.PlanWalk.allNodesThroughCaches(exec).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.bucketedScan && f.toString.contains("SelectedBucketsCount") =>
        f.relation.location.rootPaths.head.toString
    }
    assert(prunedRoots.exists(_.contains("bm25c")),
      s"the postings scan must stay bucket-pruned in the fused plan:\n$exec")
    assert(prunedRoots.exists(_.contains("ivfpqc")),
      s"the code scan must stay bucket-pruned in the fused plan:\n$exec")
    assert(graft.PlanWalk.scansOf(exec, "bm25c.dl").size == 1,
      s"the fused plan must scan .dl exactly once:\n$exec")
    assert(graft.PlanWalk.scansOf(exec, "bm25c.stats").size == 1,
      s"corpus stats must come from the 1-row .stats artifact:\n$exec")

    // re-rank store: the raw-vector side probed from the vec_id-bucketed
    // layout must answer bit-identically to the full-scan form, with the
    // store scan bucket-pruned at the shortlist-id literal — the last
    // O(corpus) scan in the serving path, closed
    s.sql("DROP TABLE IF EXISTS fused_rerank_spec")
    VectorOps.writeRerankState(emb.select("vec_id", "embedding"),
      "fused_rerank_spec", s"$dir/rerankc")
    val fusedR = StreamOps.fusedServe(s, "fused_bm25_spec", s"$dir/bm25c",
      qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs,
      rerankTable = Some("fused_rerank_spec"))
    val gotR = fusedR.collect().map(_.toSeq).toSeq
    assert(gotR == got,
      "the store-probed re-rank must answer the full-scan form bit-exactly")
    val prunedR = graft.PlanWalk.allNodesThroughCaches(
      fusedR.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.bucketedScan && f.toString.contains("SelectedBucketsCount") =>
        f.relation.location.rootPaths.head.toString
    }
    assert(prunedR.exists(_.contains("rerankc")),
      "the re-rank store scan must be bucket-pruned at the shortlist ids")
    graft.ops.CacheRegistry.harness.release()

    // filtered serving (the t160 form): the dense predicate rides the
    // encode-carried label on the code table, the lexical allowed set
    // semi-joins the scored postings — the filtered serve must answer
    // the in-query t160 bit-exactly
    val allowed = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("doc_id"))
    val gotF = StreamOps.fusedServe(s, "fused_bm25_spec", s"$dir/bm25c",
      qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs,
      pred = col("label") % 2 === 0, allowed = Some(allowed))
      .collect().map(_.toSeq).toSeq
    val expectedF = graft.ops.FusionOps.t160FilteredFusion(s, sf)
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(gotF == expectedF,
      "the filtered serving fusion must answer the in-query t160")
    assert(gotF != got, "the predicate should move at least one slot")

    // tombstones heal BOTH sides exactly: serving with the tombstone
    // param == serving layouts physically rebuilt from the survivors
    // (same frozen dense artifacts — compaction never retrains)
    // kill a doc that HOLDS a fused slot (so the heal observably moves
    // the answer) plus a spread of bystanders that shift df/stats
    val slotHolder = got.map(r => r(1).asInstanceOf[Long]).find(_ >= 5).get
    val dead = (slotHolder +: docs.select("doc_id").collect()
      .map(_.getLong(0)).filter(id => id % 31 == 8).toSeq).distinct
    assert(dead.forall(_ >= 5))
    val tomb = dead.toDF("doc_id")
    val gotT = StreamOps.fusedServe(s, "fused_bm25_spec", s"$dir/bm25c",
      qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs, Some(tomb))
      .collect().map(_.toSeq).toSeq
    val docsLive = docs.filter(!col("doc_id").isin(dead: _*))
    val state2 = s"$dir/poststate_t"
    TextOps.docPostings(docsLive)
      .write.mode("overwrite").parquet(s"$state2/batch=0")
    StreamOps.compactPostingsState(s, state2, "fused_bm25_spec_t",
      s"$dir/bm25c_t")
    VectorOps.writeIvfPqBucketedState(
      codes.filter(!col("vec_id").isin(dead: _*)), "fused_ivfpq_spec_t",
      s"$dir/ivfpqc_t", overwrite = true)
    val expectedT = StreamOps.fusedServe(s, "fused_bm25_spec_t",
      s"$dir/bm25c_t", qmap, "fused_ivfpq_spec_t", cent, cb, queries,
      rawVecs.filter(!col("vec_id").isin(dead: _*)))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(gotT == expectedT,
      "tombstoned serving must equal the survivor-rebuilt layouts")
    assert(gotT != got, "the dead docs should have held fused slots")
    // tombstones heal the re-rank STORE path by the same anti-join: a
    // dead doc in the un-rebuilt store can neither score nor re-rank in
    val gotTR = StreamOps.fusedServe(s, "fused_bm25_spec", s"$dir/bm25c",
      qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs, Some(tomb),
      rerankTable = Some("fused_rerank_spec"))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(gotTR == gotT,
      "the tombstoned store-probed serve must equal the full-scan heal")

    // revision freshness: a post-compaction revision lands as batch=1 in
    // BOTH live states; the compacted serve is pinned STALE (documented
    // window) while fusedServeFresh — composing the live states through
    // the same tails — serves it, and must equal the serve over layouts
    // RE-compacted from the revised states (already pinned ≡ in-query)
    s.sql("DROP TABLE IF EXISTS fused_bm25_spec_r")
    s.sql("DROP TABLE IF EXISTS fused_ivfpq_spec_r")
    val ivfState = s"$dir/ivfpqstate"
    // label rides the live state too (the ingest-carry contract) so the
    // filtered-fresh section below can run its predicate on live rows
    codes.select("vec_id", "clabel", "m", "cid", "label")
      .write.mode("overwrite").parquet(s"$ivfState/batch=0")
    val q0Text = docs.filter(col("doc_id") === 0)
      .select("text").head().getString(0)
    val revDocs = docs.filter(col("doc_id") === slotHolder)
      .select(col("doc_id"), lit(q0Text).as("text"))
    TextOps.docPostings(revDocs)
      .write.mode("overwrite").parquet(s"$state/batch=1")
    val revEmbL = emb.filter(col("vec_id") === slotHolder)
      .select(col("vec_id"), col("label"),
        reverse(col("embedding")).as("embedding"))
    val revEmb = revEmbL.select("vec_id", "embedding")
    val revAssigned = VectorOps.assignToIvfLists(s, revEmbL, cent,
      carry = Seq("label"))
    VectorOps.encodePq(s,
        VectorOps.pqSubvectors(
          VectorOps.residualOf(revAssigned, cent, carry = Seq("label")),
          carry = Seq("clabel", "label")),
        cb, carry = Seq("clabel", "label"))
      .select("vec_id", "clabel", "m", "cid", "label")
      .write.mode("overwrite").parquet(s"$ivfState/batch=1")
    val rawVecsRev = emb.filter(col("vec_id") =!= slotHolder)
      .select("vec_id", "embedding")
      .unionByName(revEmb)
    val fresh = StreamOps.fusedServeFresh(s, state, qmap, ivfState,
      cent, cb, queries, rawVecsRev).collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(fresh != got,
      "the revision should move a fused slot — weak revision choice")
    val staleAgain = StreamOps.fusedServe(s, "fused_bm25_spec",
      s"$dir/bm25c", qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs)
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(staleAgain == got,
      "the compacted serve must stay pinned stale until recompaction")
    StreamOps.compactPostingsState(s, state, "fused_bm25_spec_r",
      s"$dir/bm25c_r")
    StreamOps.compactIvfPqCodes(s, ivfState, "fused_ivfpq_spec_r",
      s"$dir/ivfpqc_r")
    val expectedFresh = StreamOps.fusedServe(s, "fused_bm25_spec_r",
      s"$dir/bm25c_r", qmap, "fused_ivfpq_spec_r", cent, cb, queries,
      rawVecsRev).collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(fresh == expectedFresh,
      "the fresh serve must equal the revision-recompacted serve" +
        s"\nfresh:    $fresh\nexpected: $expectedFresh")

    // the raw-vector side composes from its MAINTAINED state: the live
    // view over a rawVecIngestStream-shaped state (batch=0 corpus,
    // batch=1 revision) is the fresh serve's rawVecs input — no
    // caller-synced side table
    val rawState = s"$dir/rawstate"
    emb.select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$rawState/batch=0")
    revEmb.write.mode("overwrite").parquet(s"$rawState/batch=1")
    val freshFromState = StreamOps.fusedServeFresh(s, state, qmap,
      ivfState, cent, cb, queries, StreamOps.liveRawVecs(s, rawState))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(freshFromState == fresh,
      "the fresh serve over the maintained raw-vector state must equal " +
        "the caller-supplied form")

    // FILTERED fresh serving (the t160 form must not lose freshness):
    // revise a doc that HOLDS a filtered fused slot — batch=2 in both
    // live states — then pin (a) the filtered COMPACTED serve stale,
    // (b) the filtered FRESH serve == the filtered serve over layouts
    // recompacted from the fully-revised states (the same convention
    // the unfiltered fresh pin uses). The dense predicate runs on the
    // label the ingest carried onto the live code rows; the lexical
    // allowed set is the same broadcast semi-join as the compacted path.
    val fSlot = gotF.map(r => r(1).asInstanceOf[Long])
      .find(id => id >= 5 && id != slotHolder).get
    TextOps.docPostings(docs.filter(col("doc_id") === fSlot)
        .select(col("doc_id"), lit(q0Text).as("text")))
      .write.mode("overwrite").parquet(s"$state/batch=2")
    val negEmbL = emb.filter(col("vec_id") === fSlot)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => -x).as("embedding"))
    VectorOps.encodePq(s,
        VectorOps.pqSubvectors(
          VectorOps.residualOf(
            VectorOps.assignToIvfLists(s, negEmbL, cent,
              carry = Seq("label")),
            cent, carry = Seq("label")),
          carry = Seq("clabel", "label")),
        cb, carry = Seq("clabel", "label"))
      .select("vec_id", "clabel", "m", "cid", "label")
      .write.mode("overwrite").parquet(s"$ivfState/batch=2")
    val rawVecsRev2 = emb.filter(!col("vec_id").isin(slotHolder, fSlot))
      .select("vec_id", "embedding")
      .unionByName(revEmb)
      .unionByName(negEmbL.select("vec_id", "embedding"))
    val freshF = StreamOps.fusedServeFresh(s, state, qmap, ivfState,
      cent, cb, queries, rawVecsRev2,
      pred = col("label") % 2 === 0, allowed = Some(allowed))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    val staleF = StreamOps.fusedServe(s, "fused_bm25_spec", s"$dir/bm25c",
      qmap, "fused_ivfpq_spec", cent, cb, queries, rawVecs,
      pred = col("label") % 2 === 0, allowed = Some(allowed))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(staleF == gotF,
      "the filtered compacted serve must stay pinned stale until " +
        "recompaction")
    assert(freshF != gotF,
      "the filtered revision should move a filtered fused slot — weak " +
        "revision choice")
    s.sql("DROP TABLE IF EXISTS fused_bm25_spec_f")
    s.sql("DROP TABLE IF EXISTS fused_ivfpq_spec_f")
    StreamOps.compactPostingsState(s, state, "fused_bm25_spec_f",
      s"$dir/bm25c_f")
    // compactIvfPqCodes must PRESERVE the ingest-carried label — the
    // recompacted layout answers the same filtered serve
    StreamOps.compactIvfPqCodes(s, ivfState, "fused_ivfpq_spec_f",
      s"$dir/ivfpqc_f")
    val expectedFreshF = StreamOps.fusedServe(s, "fused_bm25_spec_f",
      s"$dir/bm25c_f", qmap, "fused_ivfpq_spec_f", cent, cb, queries,
      rawVecsRev2, pred = col("label") % 2 === 0, allowed = Some(allowed))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(freshF == expectedFreshF,
      "the filtered fresh serve must equal the filtered serve over the " +
        s"revision-recompacted layouts\ngot:      $freshF" +
        s"\nexpected: $expectedFreshF")

    emb.unpersist(); cent.unpersist(); subs.unpersist(); cb.unpersist()
    codes.unpersist(); tf.unpersist(); qmap.unpersist()
    Seq("fused_bm25_spec", "fused_ivfpq_spec", "fused_bm25_spec_t",
      "fused_ivfpq_spec_t", "fused_rerank_spec", "fused_bm25_spec_r",
      "fused_ivfpq_spec_r", "fused_bm25_spec_f", "fused_ivfpq_spec_f")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("an oversized qmap fails fast at FusedTermLiteralCap") {
    val s = spark
    // a qmap with more distinct terms than the cap violates the bounded
    // pseudo-query contract; the gate must throw BEFORE any state read
    // (dummy table names never resolve — proof the require fires first)
    val big = s.range(StreamOps.FusedTermLiteralCap + 1L)
      .select(col("id").as("query_id"),
        concat(lit("t"), col("id")).as("term"))
    val dummy = s.range(1).select(col("id").as("vec_id"),
      array(lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      StreamOps.fusedServe(s, "no_such_bm25_table", "/no/such/path",
        big, "no_such_ivfpq_table", dummy, dummy, dummy, dummy)
    }
    assert(e.getMessage.contains("FusedTermLiteralCap") ||
      e.getMessage.contains("distinct terms"))
  }
}
