package graft

import graft.betfair.SparkSpec

/** Proves the spark.sql.extensions entry point injects the native vector
  * expressions: a brand-new session (fresh function registry, no imperative
  * register call anywhere) resolves them in SQL.
  */
class ExtensionsSpec extends SparkSpec {

  test("cosine_sim/dot_product resolve in a fresh session via extensions") {
    val fresh = spark.newSession()
    val r = fresh.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
                           CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS cs,
           dot_product(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
                       CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS dp""")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
  }

  test("nfc_normalize resolves via extensions and composes decomposed text") {
    val fresh = spark.newSession()
    // 'e' + U+0301 combining acute must compose to U+00E9
    val decomposed = "cafe\u0301"
    val composed = "caf\u00E9"
    val r = fresh.sql(
      s"SELECT nfc_normalize('$decomposed') AS n, length('$decomposed') AS lr")
      .head()
    assert(r.getString(0) == composed)
    assert(r.getString(0).length == 4 && r.getInt(1) == 5)
    // ASCII fast path returns the input unchanged
    assert(fresh.sql("SELECT nfc_normalize('plain ascii') AS n")
      .head().getString(0) == "plain ascii")
  }
}
