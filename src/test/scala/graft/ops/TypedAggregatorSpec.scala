package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.betfair.SparkSpec

/** Custom typed Aggregator (the UDAF surface of SURVEY §2.C): a
  * numerically-stable streaming mean+variance (Welford/Chan parallel
  * merge) — the canonical "custom aggregation state Spark lacks" example.
  * Partial states merge associatively, so the aggregate is map-side
  * combinable exactly like a built-in.
  */
object WelfordVariance
    extends Aggregator[Double, (Long, Double, Double), java.lang.Double] {
  def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
  def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) = {
    val (n, mean, m2) = b
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    (n1, mean1, m2 + d * (x - mean1))
  }
  def merge(a: (Long, Double, Double), b: (Long, Double, Double))
      : (Long, Double, Double) = {
    val (na, ma, m2a) = a
    val (nb, mb, m2b) = b
    if (na == 0) b
    else if (nb == 0) a
    else {
      val n = na + nb
      val d = mb - ma
      (n, ma + d * nb / n, m2a + m2b + d * d * na * nb / n)
    }
  }
  // n<2 yields NULL, matching the built-in var_samp (NULL since Spark 3.1)
  def finish(r: (Long, Double, Double)): java.lang.Double =
    if (r._1 < 2) null else r._3 / (r._1 - 1)
  def bufferEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
      Encoders.scalaDouble)
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

class TypedAggregatorSpec extends SparkSpec {

  test("typed Welford aggregator matches built-in var_samp across partitions") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // group 7 has exactly ONE row: both sides must yield NULL there
    val values = (1 to 10000).map(i => ((i % 7).toLong, i * 0.37 % 13)) :+
      ((7L, 1.23))
    // repartition forces real partial-state merges, not one reduce chain
    val df = values.toDF("k", "x").repartition(8)
    val welford = udaf(WelfordVariance)
    val got = df.groupBy("k")
      .agg(welford(col("x")).as("wv"), var_samp(col("x")).as("vs"))
      .collect()
    assert(got.length == 8)
    got.foreach { r =>
      if (r.getLong(0) == 7L) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
        s"k=${r.getLong(0)}")
    }
  }
}
