package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariants for the round-14 curation operators (exact outputs are
  * oracle-checked at sf0.001/sf0.01; these properties must hold at ANY
  * corpus size or partitioning):
  *  - t152 DSIR selection: the selection never contains a target-source
  *    doc, ranks are contiguous from 1 with weights non-increasing, the
  *    result is exactly min(DsirK, pool) rows, and the plan shapes are
  *    the scale contract — the 4096-row bucket-score table is the BUILD
  *    side of a broadcast join and the selection is
  *    TakeOrderedAndProject, never a global sort;
  *  - t153 HITS: one score pair per doc, non-negative, each family
  *    renormalized to mean ~1e6 micro-units (the integer L1 contract),
  *    and a node with no inbound links has authority exactly 0;
  *  - v154 density pruning: per cluster the prototypicality ranks are a
  *    permutation of 1..n, the drop set is exactly the floor(n/4) BEST
  *    ranks (the integer cut rule), and cluster ids come from the v60
  *    codebook's domain.
  */
class CurationOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t152 selects only pool docs, ranked by non-increasing weight") {
    val sel = TextOps.t152DsirSelect(spark, sf).persist()
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).persist()

    val poolN = docs.filter(col("source") =!= TextOps.DsirTargetSource)
      .count()
    assert(sel.count() == math.min(TextOps.DsirK.toLong, poolN),
      "selection must be exactly min(k, pool)")

    // no target-source doc can be selected
    assert(sel.join(docs, Seq("doc_id"))
      .filter(col("source") === TextOps.DsirTargetSource).count() == 0)

    // ranks contiguous from 1; weight non-increasing in rank
    val n = sel.count()
    assert(sel.agg(min("rnk")).head.getLong(0) == 1L)
    assert(sel.agg(max("rnk")).head.getLong(0) == n)
    assert(sel.select(countDistinct("rnk")).head.getLong(0) == n)
    val w = org.apache.spark.sql.expressions.Window.orderBy("rnk")
    val inversions = sel
      .withColumn("prev_w", lag("dsir_q", 1).over(w))
      .filter(col("prev_w").isNotNull && col("dsir_q") > col("prev_w"))
    assert(inversions.count() == 0, "weights must be non-increasing in rank")

    sel.unpersist(); docs.unpersist()
    CacheRegistry.harness.release()
  }

  test("t152 plan: broadcast bucket scores, TakeOrderedAndProject top-k") {
    val plan = TextOps.t152DsirSelect(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must be per-partition top-k, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the bucket-score table must broadcast onto the feature stream:\n" +
        plan)
    CacheRegistry.harness.release()
  }

  test("d155 incremental postings serve the one-shot t152 selection") {
    // the d84/d101 standard: two ingest batches (one with re-delivered
    // docs the novelty anti-join must drop) followed by a serve must be
    // indistinguishable from the one-shot score — same rows, same order
    val one = TextOps.t152DsirSelect(spark, sf).collect().toSeq
    CacheRegistry.harness.release()
    val inc = TextOps.d155IncrementalDsir(spark, sf).collect().toSeq
    assert(one == inc,
      "incremental DSIR must be hash-indistinguishable from one-shot")
    CacheRegistry.harness.release()
  }

  test("t153 scores are per-doc, non-negative, mean-1e6 renormalized") {
    val h = TextOps.t153Hits(spark, sf).persist()
    val docs = graft.Tables.documents(spark, sf).select("doc_id").persist()
    val nn = docs.count()

    assert(h.count() == nn, "one score pair per doc")
    assert(h.filter(col("auth_q") < 0 || col("hub_q") < 0).count() == 0)

    // the integer L1 renormalization keeps each family's total at
    // ~nn * 1e6 micro-units (floor losses are < 1 unit per node plus the
    // denominator's own floor — a generous 1% band catches a broken
    // normalization without flaking on rounding)
    val sums = h.agg(sum("auth_q").as("sa"), sum("hub_q").as("sh")).head
    val lo = (nn * 1e6 * 0.99).toLong
    val hi = (nn * 1e6 * 1.01).toLong
    assert(sums.getLong(0) >= lo && sums.getLong(0) <= hi,
      s"authority mass ${sums.getLong(0)} outside [$lo, $hi]")
    assert(sums.getLong(1) >= lo && sums.getLong(1) <= hi,
      s"hub mass ${sums.getLong(1)} outside [$lo, $hi]")

    // a node nothing links to has authority exactly 0 — rebuild the
    // deterministic edge rule (h48 of "src#j" mod N, self-links dropped)
    // and check the inbound-less set
    val h48 = (c: org.apache.spark.sql.Column) =>
      conv(substr(md5(c), lit(1), lit(12)), 16, 10).cast("long")
    val dsts = docs
      .select(col("doc_id").as("src"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("j"))
      .select(col("src"), (h48(concat(col("src").cast("string"), lit("#"),
        col("j").cast("string"))) % nn).as("dst"))
      .filter(col("dst") =!= col("src"))
      .select(col("dst").as("doc_id")).distinct()
    val inboundless = docs.join(dsts, Seq("doc_id"), "left_anti")
    val nonzero = h.join(inboundless, Seq("doc_id"))
      .filter(col("auth_q") =!= 0L)
    assert(nonzero.count() == 0, "inbound-less nodes must have authority 0")

    h.unpersist(); docs.unpersist()
    CacheRegistry.harness.release()
  }

  test("t157 scores every position; train docs never back off") {
    val lm = TextOps.t157BigramLm(spark, sf).persist()
    val t20 = TextOps.t20TokenCount(spark, sf)

    // one row per doc; scored positions = whitespace tokens - 1
    assert(lm.count() ==
      graft.Tables.documents(spark, sf).count())
    val bad = lm.join(t20, Seq("doc_id"))
      .filter(col("n_scored") =!=
        greatest(col("ws_tokens") - 1, lit(0L)))
    assert(bad.count() == 0, "scored positions must tile every doc")

    // every bigram of a train-half doc is in the model by construction
    assert(lm.filter(col("doc_id") % 2 === 0 && col("n_backoff") > 0)
      .count() == 0, "train docs can never back off")
    // held-out docs genuinely exercise the backoff path
    assert(lm.filter(col("doc_id") % 2 === 1 && col("n_backoff") > 0)
      .count() > 0, "no held-out doc backed off — the split is broken")
    // backoff count is bounded by scored positions; scores non-negative
    assert(lm.filter(col("n_backoff") > col("n_scored") ||
      col("lm2_score") < 0).count() == 0)

    lm.unpersist()
    CacheRegistry.harness.release()
  }

  test("d158 incremental LM == one-shot t157, replay dropped") {
    // the oracle gate pins d158 against t157's SQL; here the identity is
    // also pinned engine-side (shared scorer over merged partials), plus
    // the replay sensitivity: without the roster novelty anti-join the
    // re-delivered subset would double its train counts and move scores
    val one = TextOps.t157BigramLm(spark, sf).collect().toSeq
    CacheRegistry.harness.release()
    val inc = TextOps.d158IncrementalLm(spark, sf).collect().toSeq
    CacheRegistry.harness.release()
    assert(inc == one,
      "incremental LM must serve the one-shot scores bit-exactly")

    // sanity that the replay subset is non-empty at this sf (the
    // anti-join has something to drop)
    assert(graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0).count() > 0)
  }

  test("v156 keeps the v154 invariants over the frozen-codebook state") {
    // the oracle gate pins v156 == fixed-centroid one-shot; here: the
    // structural invariants hold on the incremental state too, and the
    // re-delivered subset did not duplicate state rows
    val p = VectorOps.v156IncrementalPrune(spark, sf).persist()
    val emb = graft.Tables.embeddings(spark, sf)
    assert(p.count() == emb.count(),
      "replayed vectors must not duplicate state rows")
    assert(p.select(countDistinct("vec_id")).head.getLong(0) == p.count())
    val bad = p.groupBy("cid")
      .agg(count(lit(1)).as("n"), min("proto_rank").as("rmin"),
        max("proto_rank").as("rmax"),
        countDistinct("proto_rank").as("rdist"))
      .filter(col("rmin") =!= 1 || col("rmax") =!= col("n") ||
        col("rdist") =!= col("n"))
    assert(bad.count() == 0, "ranks must be a per-cluster permutation")
    p.unpersist()
    CacheRegistry.harness.release()
  }

  test("v154 ranks are per-cluster permutations; drop set = floor(n/4)") {
    val p = VectorOps.v154DensityPrune(spark, sf).persist()
    val emb = graft.Tables.embeddings(spark, sf)

    assert(p.count() == emb.count(), "one verdict per vector")
    assert(p.select(countDistinct("vec_id")).head.getLong(0) == p.count())

    // per cluster: ranks are a permutation of 1..n_vecs and n_vecs is
    // the actual cluster size
    val bad = p.groupBy("cid")
      .agg(count(lit(1)).as("n"), min("proto_rank").as("rmin"),
        max("proto_rank").as("rmax"),
        countDistinct("proto_rank").as("rdist"),
        max("n_vecs").as("nv"), min("n_vecs").as("nv2"))
      .filter(col("rmin") =!= 1 || col("rmax") =!= col("n") ||
        col("rdist") =!= col("n") || col("nv") =!= col("n") ||
        col("nv2") =!= col("n"))
    assert(bad.count() == 0, "ranks must be a per-cluster permutation")

    // the keep rule is exactly the integer cut: dropped ⇔ 4·rank ≤ n
    val wrong = p.filter(
      (col("keep") && col("proto_rank") * 4 <= col("n_vecs")) ||
        (!col("keep") && col("proto_rank") * 4 > col("n_vecs")))
    assert(wrong.count() == 0, "keep rule must be 4*rank > n_vecs")

    // per cluster the drop count is n div 4 (the most-prototypical quarter)
    val dropBad = p.groupBy("cid")
      .agg(count(lit(1)).as("n"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("dropped"))
      .filter(col("dropped") =!= expr("n div 4"))
    assert(dropBad.count() == 0, "drop count must be floor(n/4) per cluster")

    // cluster ids live in the v60 codebook domain
    assert(p.filter(col("cid") < 0 ||
      col("cid") >= VectorOps.KmeansK).count() == 0)

    p.unpersist()
    CacheRegistry.harness.release()
  }
}
