package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Epoch-seeded reshuffling for sequence packing and mixture sampling:
  * a trainer reshuffles between epochs, and the `seed` parameter folds
  * the epoch key into the deterministic h48 shuffle hash — each epoch
  * draws an independent deterministic order over the SAME doc set. The
  * claims pinned here:
  *
  *  - two seeds produce DIFFERENT shard/concat orders (the reshuffle is
  *    real, not a no-op on the constant);
  *  - token/doc conservation holds across epochs — packing moves docs
  *    between shards and chunks but never invents or loses one;
  *  - the default (empty) seed is byte-for-byte the t166/t164 parity
  *    computation, so the existing oracle rows stand;
  *  - mixture quotas are epoch-invariant: the drawn doc SET changes with
  *    the seed, but each domain's draw COUNT is a pure function of the
  *    weights and the pool — epochs resample membership, never the mix.
  */
class EpochSeedSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("two epoch seeds repack the same corpus: different order, " +
      "conserved tokens") {
    val s = spark
    val docs = graft.Tables.documents(s, sf).select("doc_id", "text")
    val e1 = TextOps.sequencePackOn(docs).collect().map(_.toSeq).toSeq
    val e2 = TextOps.sequencePackOn(docs, seed = TextOps.EpochSeed2)
      .collect().map(_.toSeq).toSeq
    assert(e1 != e2, "the epoch seed must change the shard/concat order")
    // the default seed IS the t166 parity epoch
    val t166 = TextOps.t166SequencePack(s, sf).collect().map(_.toSeq).toSeq
    assert(t166 == e1, "the default seed must be the t166 parity order")
    // conservation is checkable from the boundary maps only while they
    // are complete (under the 100-chunk report cut) — skip VISIBLY at a
    // larger sf rather than fail (r19 ADVICE: assume(), not a silent if;
    // it runs last so the divergence/parity assertions above stay
    // unconditional)
    def totals(r: Seq[Seq[Any]]): (Long, Long) =
      (r.map(_(4).asInstanceOf[Long]).sum, r.map(_(5).asInstanceOf[Long]).sum)
    assume(e1.size < 100 && e2.size < 100,
      "conservation check skipped: the 100-chunk report cut truncates " +
        "the boundary maps at this sf")
    assert(totals(e1) == totals(e2),
      "epoch reshuffling must conserve total docs and tokens")
  }

  test("two epoch seeds redraw the mixture: different manifest, " +
      "identical per-domain counts") {
    val s = spark
    val pool = graft.Tables.documents(s, sf).select("doc_id", "lang")
    val m1 = TextOps.mixtureSampleOn(pool).collect().map(_.toSeq).toSeq
    val m2 = TextOps.mixtureSampleOn(pool, seed = TextOps.EpochSeed2)
      .collect().map(_.toSeq).toSeq
    assert(m1 != m2, "the epoch seed must redraw the manifest")
    def counts(r: Seq[Seq[Any]]): Map[Any, Int] =
      r.groupBy(_(0)).map { case (k, v) => k -> v.size }
    // the membership-divergence assertion is only meaningful for a domain
    // whose pool is STRICTLY larger than its quota — a quota that swallows
    // a whole domain draws the same set at every seed (correctly), so the
    // assertion would fail spuriously at an SF where MixSampleK reaches a
    // pool size. Guard on at least one undersampled domain existing.
    val poolSizes = pool.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val undersampled = counts(m1).exists { case (lang, drawn) =>
      poolSizes(lang.asInstanceOf[String]) > drawn
    }
    if (undersampled)
      assert(m1.map(_(1)).toSet != m2.map(_(1)).toSet,
        "the drawn doc sets should differ between epochs")
    assert(counts(m1) == counts(m2),
      "per-domain draw counts are quota-determined and epoch-invariant")
  }

  test("the full plane reshuffles across epochs: divergent order, each " +
      "epoch's pack accounting for exactly its epoch's draw") {
    val s = spark
    val e1 = TextOps.t170TrainingPlane(s, sf).collect().map(_.toSeq).toSeq
    CacheRegistry.harness.release()
    val e2 = TextOps.t178EpochPlane(s, sf).collect().map(_.toSeq).toSeq
    CacheRegistry.harness.release()
    assert(e1 != e2,
      "the epoch seed must reshuffle the composed plane, not just stages")
    // capstone-level doc conservation: each epoch's boundary map must
    // account for every doc of ITS OWN epoch's mixture draw exactly once
    // (the draw differs per epoch; the accounting must not). The check
    // is sized for the small SFs — at a larger scale factor the packed
    // plane outgrows it, so SKIP rather than fail (r18 ADVICE): the
    // divergence assertions above stay unconditional.
    val docs = graft.Tables.documents(s, sf)
    val sel = TextOps.t168CleanSelect(s, sf).select("doc_id")
    val pool = docs.join(broadcast(sel), Seq("doc_id"), "left_semi")
      .select("doc_id", "lang")
    if (e1.size < 100 && e2.size < 100) {
      for ((seed, packed) <- Seq(("", e1), (TextOps.EpochSeed2, e2))) {
        val drawn = TextOps.mixtureSampleOn(pool, seed).count()
        CacheRegistry.harness.release()
        assert(packed.map(_(4).asInstanceOf[Long]).sum == drawn,
          s"epoch '$seed': the pack must account for its draw exactly once")
      }
    }
    // the per-domain mix is epoch-invariant at the capstone's pool too
    def mix(seed: String): Map[String, Long] =
      TextOps.mixtureSampleOn(pool, seed).groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (x1, x2) = (mix(""), mix(TextOps.EpochSeed2))
    CacheRegistry.harness.release()
    assert(x1 == x2, "epochs resample membership, never the mix")
  }
}
