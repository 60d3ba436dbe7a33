package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Hybrid lexical+dense retrieval fusion — the t150 query, the ranking a
  * production RAG stack actually serves: the engine already has both
  * halves (BM25 — t149/`bm25Compacted`; residual IVFADC + exact re-rank —
  * v133/v134/v143), and reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009 — public method) composes their two top-k lists
  * per query without score calibration: fused(d) = Σ_modality
  * 1/(60 + rank_modality(d)), with a doc absent from a modality simply
  * contributing nothing. Reference anchor: `select` composing multiple
  * `where` predicates over one index (betfairdatabase/database.py:144-151)
  * — here the composed artifacts are two audited retrieval chains joined
  * on doc_id.
  *
  * Engine-exactness: both input rank lists are integer ranks from already
  * bit-exact chains (v134's exact re-rank; BM25's BIGINT score sums), and
  * each RRF term is integer-quantized as `1000000 div (60 + rank)` (the
  * idf_q convention — 1/(60+r) is a libm-free rational, but quantizing
  * keeps the SUM of terms a BIGINT, immune to float summation order), so
  * the fused ranking is BIGINT-exact end to end.
  *
  * Scale: the dense half is v134's audited plan (bucket-prunable ADC scan,
  * broadcast LUT, queries×R exact re-rank). The lexical half is
  * query-by-document BM25 — each query doc's 3 rarest df≥3 terms form the
  * pseudo-query, so scoring touches ONLY those ≤ 3·|queries| terms'
  * postings (the probed-list-restriction shape, via [[TextOps.bm25Scores]]'
  * broadcast query set), and the per-query score sum is a BIGINT
  * partial-agg over those postings. The fusion itself joins two top-k
  * lists — O(queries × k) rows, a full-outer join on (query_id, doc_id)
  * that never sees anything corpus-sized.
  */
object FusionOps {

  /** Reciprocal-rank fusion of two per-query rank lists. `lex` carries
    * (query_id, doc_id, lex_rn), `dense` (query_id, doc_id, dense_rn) —
    * 1-based integer ranks. Full-outer on (query_id, doc_id): a doc
    * ranked by only one modality stays in the race with the other term
    * absent (surfaced as rank 0 in the output, contributing 0). Returns
    * the per-query top-`k` by (rrf_q DESC, doc_id). Factored out of
    * [[t150HybridFusion]] so FusionSpec can pin the fusion semantics on
    * synthetic lists.
    */
  private[graft] def rrfFuse(lex: DataFrame, dense: DataFrame,
      k: Int = 3): DataFrame = {
    val dn = dense.select(col("query_id").as("dq"),
      col("doc_id").as("dd"), col("dense_rn"))
    val fused = lex.select("query_id", "doc_id", "lex_rn")
      .join(dn, col("query_id") === col("dq") && col("doc_id") === col("dd"),
        "full_outer")
      .select(
        coalesce(col("query_id"), col("dq")).as("query_id"),
        coalesce(col("doc_id"), col("dd")).as("doc_id"),
        coalesce(col("lex_rn"), lit(0L)).as("lex_rn"),
        coalesce(col("dense_rn"), lit(0L)).as("dense_rn"))
      .withColumn("rrf_q",
        when(col("lex_rn") === 0, lit(0L))
          .otherwise(expr("1000000 div (60 + lex_rn)")) +
        when(col("dense_rn") === 0, lit(0L))
          .otherwise(expr("1000000 div (60 + dense_rn)")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_q").desc, col("doc_id"))
    fused.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "doc_id", "lex_rn", "dense_rn", "rrf_q", "rn")
  }

  /** The per-query lexical top-k over BM25-scored postings: join the
    * broadcast (query_id, term) pseudo-query map onto the scored
    * postings, sum each query's terms' BIGINT scores per doc (self
    * excluded — matching the dense side's self exclusion), rank top-`k`
    * per query. The ONE lexical-half definition shared by [[
    * t150HybridFusion]] (scores built from in-query postings) and the
    * serving read path ([[graft.streaming.StreamOps.fusedServe]], scores
    * from the compacted bucket-pruned layout) — the two cannot drift.
    */
  private[graft] def lexTopK(scored: DataFrame, qmap: DataFrame,
      k: Int = 5): DataFrame = {
    val wl = Window.partitionBy("query_id")
      .orderBy(col("lex_q").desc, col("doc_id"))
    scored.join(broadcast(qmap), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id").agg(sum("score_q").as("lex_q"))
      .withColumn("lex_rn", row_number().over(wl).cast("long"))
      .filter(col("lex_rn") <= k)
      .select("query_id", "doc_id", "lex_rn")
  }

  /** The t150 query: RRF over v134's exact-re-ranked dense top-3 and a
    * query-by-document BM25 top-5, per query doc (doc_id/vec_id < 5 —
    * the v134 query set). The lexical pseudo-query is the query doc's 3
    * rarest corpus terms with df ≥ 3 (rarest = (df ASC, term) — a total
    * order, so both engines pick identical pseudo-queries); its candidate
    * scores are the summed per-term t149 BM25 scores (BIGINT — no float
    * summation), self excluded to match the dense side's self exclusion.
    */
  def t150HybridFusion(s: SparkSession, d: String): DataFrame =
    fusionOver(s, d, () => VectorOps.v134IvfPqRerank(s, d), None)

  /** Attribute-filtered hybrid fusion — the t160 query, the filtered
    * retrieval matrix cell (v122/v129/v142/v143) applied to the FUSED
    * ranking: the query a deployed RAG stack answers under a
    * license/language/modality predicate ("top-k over docs I may
    * train on"). The predicate runs BELOW each side's score and ABOVE
    * its rank — the v142 convention: corpus statistics (coarse/PQ
    * artifacts; BM25 df/dl/stats) describe the whole index and do not
    * shift per query filter, while post-rank filtering would under-fill
    * k whenever a non-matching doc out-ranked a matching one. Dense half
    * = v143's filtered two-stage serve (predicate in the ADC stage, so
    * the shortlist is attribute-pure); lexical half = the t150 scorer
    * with the allowed-id set semi-joined onto the scored postings before
    * the per-query top-5. Both halves are label-pure, so every fused
    * candidate satisfies the predicate by construction. Scale: the
    * allowed-id restriction is one broadcast semi-join on the
    * queries×candidates-bounded scored rows (the dense side's filter
    * pushes into the bucketed scan — FilteredIvfPqSpec's property,
    * unchanged here).
    */
  def t160FilteredFusion(s: SparkSession, d: String): DataFrame = {
    val allowed = embeddings(s, d).filter(col("label") % 2 === 0)
      .select(col("vec_id").as("doc_id"))
    fusionOver(s, d, () => VectorOps.v143FilteredRerank(s, d), Some(allowed))
  }

  /** The fusion body shared by t150 (unfiltered) and t160 (candidate
    * restriction below the lexical score, above its rank): `denseRkF`
    * CONSTRUCTS the dense side's exact-re-ranked (query_id, neighbor_id,
    * rnk) list; `restrict` holds the allowed doc_ids.
    *
    * The two halves are independent until the fusion join, and each has
    * eager driver-sequential work (the dense construction runs the
    * probed-list collect over the whole training chain; the lexical list
    * is a postings/tokenize pass) — so they run on two driver threads
    * (guide §2.6, the d118 Par pattern): the dense side is constructed
    * while the lexical top-k list is persisted and primed. Results are
    * unchanged (both halves are pure functions of their inputs; the
    * oracle gate re-proves it).
    */
  private def fusionOver(s: SparkSession, d: String,
      denseRkF: () => DataFrame, restrict: Option[DataFrame]): DataFrame = {
    val Seq(denseRk, lex) = Par.run[DataFrame](s)(
      // lineageCheckpoint at the fusion boundary: the dense list is a
      // queries×k table, but its PLAN embeds the whole training chain's
      // text (persist does not cut plan-description size — an
      // InMemoryRelation prints its cached plan), and AQE regenerates
      // that description on every action over the fused plan
      () => TextOps.lineageCheckpoint(denseRkF(), CacheRegistry.harness),
      () => {
        // checkpoint, not persist, for the same plan-text reason; the
        // count() keeps the priming eager inside the overlap window
        val l = TextOps.lineageCheckpoint(
          lexListFor(s, d, restrict), CacheRegistry.harness)
        l.count()
        l
      })
    rrfFuse(lex, denseOf(denseRk))
      .orderBy("query_id", "rn")
  }

  /** A re-ranked dense chain's (query_id, neighbor_id, rnk) list in the
    * fusion tail's column contract.
    */
  private def denseOf(denseRk: DataFrame): DataFrame =
    denseRk.select(col("query_id"), col("neighbor_id").as("doc_id"),
      col("rnk").as("dense_rn"))

  /** The t150 lexical top-5 list built from the corpus — the
    * query-by-document BM25 chain factored out of [[fusionOver]] so the
    * fused-recall report ([[t162FusionRecall]]) can fuse ONE lexical
    * list against two dense lists without tokenizing the corpus twice.
    */
  private def lexListFor(s: SparkSession, d: String,
      restrict: Option[DataFrame]): DataFrame = {
    val docs = documents(s, d).select("doc_id", "text")
    // tf feeds df, dl, the query-term pick, and the scored join — persist
    // (the t149/t71 multi-consumer finding)
    val tf = CacheRegistry.harness.add(TextOps.docPostings(docs).persist())
    val dl = CacheRegistry.harness.add(
      tf.groupBy("doc_id").agg(sum("tf").as("dl")).persist())
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3)
    val wq = Window.partitionBy("query_id")
      .orderBy(col("df").asc, col("term"))
    val qmap = CacheRegistry.harness.add(
      tf.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("term"))
        .join(df, Seq("term"))
        .withColumn("qrn", row_number().over(wq))
        .filter(col("qrn") <= 3)
        .select("query_id", "term").persist())
    val scored0 = TextOps.bm25Scores(tf, dl, qmap.select("term").distinct())
    val scored = restrict.fold(scored0)(a =>
      scored0.join(broadcast(a), Seq("doc_id"), "left_semi"))
    lexTopK(scored, qmap)
  }

  /** Minimum fused-slot overlap with the ground truth for a query's
    * `recall_ok` flag — 2 of 3 slots: the fused ranking may legitimately
    * reorder the boundary slot (the ADC shortlist is approximate by
    * design), but losing a majority of the exact fusion's slots means
    * the dense index is mis-serving this query.
    */
  val FusedRecallMinHits = 2L

  /** Fused-ranking quality report — the t162 query, v80's recall@k
    * methodology applied to the FUSION (the capstone closing the quality
    * loop: FusedServeSpec proves the serving path EQUALS t150, this
    * query machine-checks that what t150 computes is GOOD): per query,
    * the fused top-3 with the production dense side (v134's
    * residual-IVFADC + exact re-rank — approximate, probe misses are
    * possible) is compared against the ground-truth fusion whose dense
    * side is the exact brute-force cosine top-3
    * ([[VectorOps.exactDenseTop3]] — one window over the exact scores).
    * The lexical side is already exact (full postings scan), so it is
    * built ONCE ([[lexListFor]]) and fused against both dense lists —
    * any recall loss is attributable to the dense index alone. Output:
    * hits3 = fused∩truth slot overlap, recall3 (4dp-floor — the v80
    * quantization), and the in-row `recall_ok` assertion (hits3 ≥
    * [[FusedRecallMinHits]]) a deployment alerts on.
    *
    * Scale: the ground-truth brute force is the only corpus×queries
    * cosine here — the price of a recall AUDIT, run at the evaluation
    * cadence, never per serve (v80's own contract); everything else is
    * the audited t150 plan plus one O(queries) join of two 3-slot lists.
    */
  def t162FusionRecall(s: SparkSession, d: String): DataFrame =
    recallReportOn(s, d, () => VectorOps.v134IvfPqRerank(s, d))

  /** The fused-recall report at a GIVEN production dense side — shared
    * by [[t162FusionRecall]] (the compacted-layout twin: v134's one-shot
    * chain, which FusedServeSpec pins ≡ the compacted serve) and
    * [[d173FreshRecall]] (the live-state twin), so the two serving
    * modes' quality floors are the same computation against the same
    * ground truth.
    */
  private def recallReportOn(s: SparkSession, d: String,
      denseRkF: () => DataFrame): DataFrame = {
    // persist(): the lexical list fuses against BOTH dense lists. The
    // dense construction (training-chain collects), the lexical priming,
    // and the ground-truth brute-force top-3 are three independent
    // inputs of the final report — three driver threads (the fusionOver
    // overlap; guide §2.6)
    val Seq(denseRk, lex, truthRk) = Par.run[DataFrame](s)(
      // checkpoint at the boundary — see fusionOver: the report's plan
      // would otherwise embed the full training-chain text twice (once
      // per fused list) and regenerate it per action
      () => TextOps.lineageCheckpoint(denseRkF(), CacheRegistry.harness),
      () => {
        // checkpoint, not persist (plan text — see fusionOver); the list
        // fuses against BOTH dense lists, which a checkpoint serves the
        // same way a cache does
        val l = TextOps.lineageCheckpoint(
          lexListFor(s, d, None), CacheRegistry.harness)
        l.count()
        l
      },
      () => {
        val g = TextOps.lineageCheckpoint(
          VectorOps.exactDenseTop3(s, d), CacheRegistry.harness)
        g.count()
        g
      })
    val approx = rrfFuse(lex, denseOf(denseRk))
      .select("query_id", "doc_id")
    val truth = rrfFuse(lex, denseOf(truthRk))
      .select("query_id", "doc_id")
    val a = approx.groupBy("query_id")
      .agg(sort_array(collect_list("doc_id")).as("aset"))
    val g = truth.groupBy("query_id")
      .agg(sort_array(collect_list("doc_id")).as("gset"))
    a.join(g, Seq("query_id"))
      .withColumn("hits3",
        size(array_intersect(col("aset"), col("gset"))).cast("long"))
      .select(col("query_id"), col("hits3"),
        (floor(col("hits3").cast("double") / 3 * 1e4) / 1e4).as("recall3"),
        (col("hits3") >= FusedRecallMinHits).as("recall_ok"))
      .orderBy("query_id")
  }

  /** Fresh-path recall floor — the d173 query, closing the quality loop
    * for BOTH serving modes: t162 audits the fusion whose dense side is
    * the one-shot/compacted chain; this query runs the SAME report with
    * the dense side served from the latest-batch-wins LIVE code state —
    * the [[graft.streaming.StreamOps.fusedServeFresh]] dense half's
    * definitions (`latestWholeItem` collapse + `listLutAdcScore` +
    * `exactRerankOn`) over a two-wave ingest in which wave 2 additionally
    * REPLAYS a quarter of wave 1's vectors (the at-least-once delivery
    * the whole-item contract exists for). The collapse must erase the
    * replay exactly, so the live-state dense list equals v134's and the
    * oracle is the t162 SQL verbatim (the d165/d169 convention: the
    * incremental member's oracle IS the one-shot's).
    *
    * Scale: the state collapse is the max-batch aggregate + self-join
    * every live read pays (the documented freshness trade); the
    * ground-truth brute force is t162's audit price, unchanged.
    */
  def d173FreshRecall(s: SparkSession, d: String): DataFrame =
    // the dense-side construction below is a thunk: recallReportOn runs
    // it on a driver thread concurrently with the lexical priming (the
    // probed-list collect at the end executes the whole training chain)
    recallReportOn(s, d, () => d173DenseRk(s, d))

  private def d173DenseRk(s: SparkSession, d: String): DataFrame = {
    import VectorOps._
    // the v133 frozen artifacts, trained exactly as the one-shot trains
    val emb = CacheRegistry.harness.add(
      embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val cent = CacheRegistry.harness.add(ivfCodebookOn(emb).persist())
    val subs = CacheRegistry.harness.add(
      pqSubvectors(residualOf(assignToIvfLists(s, emb, cent), cent),
        carry = Seq("clabel")).persist())
    val cb = CacheRegistry.harness.add(
      trainPqCodebooksOn(s, subs, col("vec_id") < PqK).persist())
    val codes = CacheRegistry.harness.add(
      encodePq(s, subs, cb, carry = Seq("clabel")).persist())
    // two ingest waves; wave 2 re-delivers every vec_id % 4 == 0 item
    // (whole-item: a vector's M rows travel together in one batch)
    val state = codes.filter(col("vec_id") % 2 === 0)
      .withColumn("batch", lit(0L))
      .unionByName(codes.filter(col("vec_id") % 2 === 1)
        .withColumn("batch", lit(1L)))
      .unionByName(codes.filter(col("vec_id") % 4 === 0)
        .withColumn("batch", lit(1L)))
    val live = graft.streaming.StreamOps.latestWholeItem(state, "vec_id")
      .select("vec_id", "clabel", "m", "cid")
    val queries = emb.filter(col("vec_id") < 5)
    val lut = residualLut(s, ivfQueryProbes(s, queries, cent), cent, cb)
    exactRerankOn(s,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
      listLutAdcScore(live, lut))
  }
}
