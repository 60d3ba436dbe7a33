package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.betfair.SparkSpec

/** Property tests for the [[MisraGries]] typed Aggregator.
  *
  * The load-bearing claim at 100 TB is the mergeable-summaries guarantee:
  * for ANY partitioning of the input into partial states and ANY merge
  * order, every item with true frequency > n/(k+1) survives to the final
  * candidate set. A plain example test cannot pin "any partitioning" — the
  * ScalaCheck properties here drive random inputs, random chunk boundaries,
  * and a shuffled merge order through the exact reduce/merge/finish calls
  * Spark makes.
  */
class MisraGriesPropertySpec extends SparkSpec {

  private def runPartitioned(agg: MisraGries, chunks: Seq[Seq[String]],
      mergeOrder: Seq[Int]): Seq[String] = {
    val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val merged = mergeOrder.map(partials).foldLeft(agg.zero)(agg.merge)
    agg.finish(merged)
  }

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val inputGen: Gen[(Int, List[String], List[Int], Long)] = for {
    k <- Gen.choose(1, 8)
    // small alphabet + skewed picks so heavy hitters actually occur
    n <- Gen.choose(0, 400)
    items <- Gen.listOfN(n,
      Gen.frequency(6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        2 -> Gen.oneOf("a", "b", "c", "d"),
        1 -> Gen.alphaLowerStr.map(_.take(3))))
    nChunks <- Gen.choose(1, 8)
    cuts <- Gen.listOfN(nChunks - 1, Gen.choose(0, math.max(n, 1)))
    seed <- Gen.long
  } yield (k, items, cuts, seed)

  test("MG guarantee holds under any partitioning and merge order") {
    checkProp(Prop.forAll(inputGen) { case (k, items, cuts, seed) =>
      val agg = new MisraGries(k)
      val bounds = (0 +: cuts.sorted :+ items.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
        items.slice(a, b)
      }
      val order = new scala.util.Random(seed).shuffle(chunks.indices.toList)
      val out = runPartitioned(agg, chunks, order).toSet
      val freq = items.groupMapReduce(identity)(_ => 1L)(_ + _)
      val mustSurvive = freq.collect {
        case (w, c) if c * (k + 1) > items.length => w
      }
      Prop(mustSurvive.forall(out.contains)) :| s"missing=${
        mustSurvive.filterNot(out.contains)} out=$out k=$k"
    })
  }

  test("single-partition reduce obeys the same guarantee") {
    checkProp(Prop.forAll(inputGen) { case (k, items, _, _) =>
      val agg = new MisraGries(k)
      val out = agg.finish(items.foldLeft(agg.zero)(agg.reduce)).toSet
      val freq = items.groupMapReduce(identity)(_ => 1L)(_ + _)
      Prop(freq.forall { case (w, c) =>
        c * (k + 1) <= items.length || out.contains(w)
      })
    })
  }

  test("null items are skipped, not inserted (no NPE, guarantee intact)") {
    checkProp(Prop.forAll(inputGen) { case (k, items, cuts, seed) =>
      val agg = new MisraGries(k)
      // interleave nulls everywhere a real column could produce them
      val withNulls = items.flatMap(i => List(null, i)) :+ null
      val bounds = (0 +: cuts.sorted :+ withNulls.length).distinct.sorted
        .filter(_ <= withNulls.length)
      val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
        withNulls.slice(a, b)
      }
      val order = new scala.util.Random(seed).shuffle(chunks.indices.toList)
      val out = runPartitioned(agg, chunks, order)
      // nulls contribute nothing: guarantee is over the non-null multiset
      val freq = items.groupMapReduce(identity)(_ => 1L)(_ + _)
      val mustSurvive = freq.collect {
        case (w, c) if c * (k + 1) > items.length => w
      }
      Prop(!out.contains(null) && mustSurvive.forall(out.toSet.contains))
    })
  }

  test("candidate list is canonically sorted and bounded by k") {
    checkProp(Prop.forAll(inputGen) { case (k, items, cuts, seed) =>
      val agg = new MisraGries(k)
      val bounds = (0 +: cuts.sorted :+ items.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
        items.slice(a, b)
      }
      val order = new scala.util.Random(seed).shuffle(chunks.indices.toList)
      val out = runPartitioned(agg, chunks, order)
      Prop(out.length <= k && out == out.sorted && out.distinct == out)
    })
  }

  test("q49 regression: udaf path tolerates null keys end-to-end") {
    val s = spark
    import s.implicits._
    val df = Seq("x", "x", "x", null, "y", null, "x", "z")
      .toDF("item")
    val mg = udaf(new MisraGries(3), org.apache.spark.sql.Encoders.STRING)
    // repartition(3): forces real partial states + merges through the
    // encoder boundary, not a single in-memory fold
    val out = df.repartition(3).agg(mg(col("item")).as("hh"))
      .collect()(0).getSeq[String](0)
    assert(out.contains("x"))  // freq 4 of 6 non-null > 6/4
    assert(!out.contains(null))
  }
}
