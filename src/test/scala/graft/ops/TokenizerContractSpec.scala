package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.betfair.SparkSpec

/** Pins the cross-engine contract of [[TextOps.words]] (see its scaladoc).
  *
  * Seven oracle-checked queries share this tokenizer, so a silent
  * Spark/DuckDB divergence would redden six rows at once with no hint at
  * the cause. The DuckDB side cannot run in this JVM; instead the spec
  * pins the SPARK side to an executable model of the agreed contract —
  * Java/RE2 common semantics, probed empirically against DuckDB
  * (string_split_regex/trim/lower, 2026-08: every case in `edgeBattery`
  * verified identical) — plus explicit assertions on each known divergence
  * class, so any engine drift or refactor that moves the boundary fails
  * HERE first.
  */
class TokenizerContractSpec extends SparkSpec {

  /** Separators both engines agree on: Java \s ∩ RE2 \s minus U+000B. */
  private val seps = Set(' ', '\t', '\n', '\f', '\r')

  /** Exotic Unicode whitespace that is NOT a separator in either engine:
    * NBSP, OGHAM SPACE, EN QUAD, LINE SEP, PARA SEP, NARROW NBSP,
    * IDEOGRAPHIC SPACE, NEL.
    */
  private val exotics = Seq(' ', ' ', ' ', ' ',
    ' ', ' ', '　', '')

  /** Executable model of the contract: trim U+0020 only, lowercase
    * (trivial over the generated alphabet), split on separator RUNS with
    * Java split(limit = -1) semantics — a leading separator yields a
    * leading empty token, a trailing one a trailing empty token, and the
    * empty string is one empty token.
    */
  private def modelWords(text: String): Seq[String] = {
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val trimmed = lowered.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
      .reverse
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inSep = false
    trimmed.foreach { ch =>
      if (seps(ch)) {
        if (!inSep) { out += cur.toString; cur.clear(); inSep = true }
      } else { cur += ch; inSep = false }
    }
    out += cur.toString
    out.result()
  }

  private def sparkWords(inputs: Seq[String]): Seq[Seq[String]] = {
    val s = spark
    import s.implicits._
    inputs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .select(col("id"), TextOps.words(col("t")).as("ws"))
      .orderBy("id").collect().map(_.getSeq[String](1).toSeq).toSeq
  }

  /** Hand-picked boundary cases (each verified identical in DuckDB by the
    * recorded probe): leading/trailing/only separators, runs, CRLF, every
    * exotic mid-token, mixed case, empty.
    */
  private val edgeBattery: Seq[String] =
    Seq("", " ", "  ", "a", " a", "a ", "  a  ", "a b", "a  b", "a\tb",
      "a\r\nb", "\tx", "x\f", "\fx\t", "A Bé", "MiXeD CaSe WORDS",
      "a . b - c # d", "中 文 words") ++
      exotics.map(e => s"a${e}b") ++
      exotics.map(e => s"foo${e}bar baz")

  test("edge battery: Spark words() matches the contract model exactly") {
    val got = sparkWords(edgeBattery)
    edgeBattery.zip(got).foreach { case (in, ws) =>
      assert(ws == modelWords(in),
        s"input=${in.map(c => f"\\u${c.toInt}%04x").mkString} " +
          s"spark=$ws model=${modelWords(in)}")
    }
  }

  test("fuzz: 400 generated strings over the contract alphabet agree") {
    val alphabet: Gen[Char] = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('A', 'Z', 'Q'),
      1 -> Gen.oneOf('.', '-', '#', '*', 'é', '中'),
      4 -> Gen.oneOf(seps.toSeq),
      2 -> Gen.oneOf(exotics))
    val strGen: Gen[String] = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, alphabet)
    } yield cs.mkString
    // deterministic sampling: fixed seed stream, one Spark job for all
    val inputs = (0 until 400).flatMap { i =>
      strGen.apply(Gen.Parameters.default, Seed(42L).reseed(i.toLong))
    }
    assert(inputs.length >= 390) // Gen.apply rarely returns None; guard
    val got = sparkWords(inputs)
    inputs.zip(got).foreach { case (in, ws) =>
      assert(ws == modelWords(in),
        s"input=${in.map(c => f"\\u${c.toInt}%04x").mkString} " +
          s"spark=$ws model=${modelWords(in)}")
    }
  }

  test("divergence class 1: U+000B splits in Spark (Java \\s), not DuckDB") {
    // DuckDB probe: string_split_regex('a' || chr(11) || 'b', '\s+') keeps
    // ONE token. If this assertion ever flips, Spark moved to RE2-style \s
    // and the divergence class is GONE — update the words() contract note.
    assert(sparkWords(Seq("ab")) == Seq(Seq("a", "b")))
  }

  test("divergence class 2: Spark trim strips only U+0020, DuckDB all Zs") {
    // DuckDB probe: trim(NBSP||'a'||NBSP) = 'a' (whole Zs category);
    // Spark keeps the NBSPs, so the single token retains them.
    assert(sparkWords(Seq(" a ")) == Seq(Seq(" a ")))
    // ...while plain-space padding trims identically in both engines
    assert(sparkWords(Seq("  a  ")) == Seq(Seq("a")))
  }

  test("divergence class 3: U+0130 lowercases to two chars in Spark") {
    // Java: U+0130 -> 'i' + U+0307 combining dot; DuckDB: plain 'i'.
    // Either way it stays ONE token — the divergence is in token bytes,
    // not count.
    val got = sparkWords(Seq("İ")).head
    assert(got.length == 1)
    assert(got.head == "i̇" || got.head == "i",
      s"unexpected lowering: ${got.head.map(c => f"\\u${c.toInt}%04x")}")
  }
}
