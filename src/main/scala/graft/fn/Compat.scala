package graft.fn

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** SQLite-compat scalar functions for the reference's raw-`where` query
  * surface (SURVEY.md §2.B6/B7; reference `betfairdatabase/database.py:144-151`
  * splices user SQL verbatim into SQLite, whose tests use `time()` and
  * `strftime()`).
  *
  * Two tiers:
  *  - Column helpers ([[time]], [[strftime]]) that translate to native
  *    `date_format` at plan time → whole-stage codegen, no UDF in the hot path.
  *    Use these whenever the format string is a literal (it always is in the
  *    reference's tests).
  *  - Registered UDFs (`sqlite_time`, `sqlite_strftime`) so raw SQL strings
  *    containing those calls keep working through `expr(where)`.
  */
object Compat {

  /** SQLite `time(ts)` → "HH:mm:ss". */
  def time(ts: Column): Column = date_format(ts, "HH:mm:ss")

  /** SQLite `strftime(fmt, ts)` for literal fmt — rewritten to date_format.
    * Codes without a java.time pattern equivalent (`%w` weekday 0=Sunday,
    * `%u` ISO weekday 1=Monday, `%s` epoch seconds — Spark's proleptic
    * formatter rejects or renumbers their pattern letters) compile to
    * arithmetic columns concatenated between date_format segments.
    */
  def strftime(fmt: String, ts: Column): Column = tokenize(fmt) match {
    case Seq(PatternSeg(p)) => date_format(ts, p)
    case toks =>
      concat(toks.map {
        case PatternSeg(p) => date_format(ts, p)
        // Spark dayofweek: 1=Sunday..7=Saturday
        case ComputedSeg('w') => (dayofweek(ts) - 1).cast("string")
        case ComputedSeg('u') => ((dayofweek(ts) + 5) % 7 + 1).cast("string")
        case ComputedSeg('s') => unix_timestamp(ts).cast("string")
        case ComputedSeg(other) => throw new IllegalStateException(s"%$other")
      }: _*)
  }

  private[graft] sealed trait Seg
  private[graft] final case class PatternSeg(pattern: String) extends Seg
  private[graft] final case class ComputedSeg(code: Char) extends Seg

  /** Tokenize an SQLite %-code format string into java.time pattern segments
    * interleaved with `%w` markers. Covers the codes used by SQLite
    * docs/tests; unknown codes throw. Literal text is quoted so pattern
    * letters in it stay literal.
    */
  private[graft] def tokenize(fmt: String): Seq[Seg] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seg]
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      // quote anything containing letters; keep pure punctuation as-is
      if (s.exists(_.isLetter)) sb.append("'").append(s.replace("'", "''")).append("'")
      else sb.append(s)
      lit.clear()
    }
    def flushPattern(): Unit = { flushLit(); if (sb.nonEmpty) { out += PatternSeg(sb.toString); sb.clear() } }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        flushLit()
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'f' => sb.append("ss.SSS") // fractional seconds SS.SSS
          case 'j' => sb.append("DDD")
          case 'A' => sb.append("EEEE")
          case 'p' => sb.append("a") // AM/PM
          case 'R' => sb.append("HH:mm")
          case 'T' => sb.append("HH:mm:ss")
          case c @ ('w' | 'u' | 's') => flushPattern(); out += ComputedSeg(c)
          case '%' => lit.append('%')
          case other =>
            throw new IllegalArgumentException(s"unsupported strftime code %$other")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushPattern()
    if (out.isEmpty) out += PatternSeg("")
    out.toSeq
  }

  /** The java.time pattern for formats without `%w` (spec/back-compat). */
  private[graft] def translate(fmt: String): String = tokenize(fmt) match {
    case Seq(PatternSeg(p)) => p
    case _ => throw new IllegalArgumentException(
      "%w/%u/%s have no pattern equivalent; use strftime(fmt, col)")
  }

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Concat,
    DateFormatClass, DayOfWeek, Expression, ExpressionInfo, Literal, Pmod,
    Subtract, UnixTimestamp}
  import org.apache.spark.sql.types.StringType

  /** The same strftime translation as [[strftime]], but as a raw Catalyst
    * expression tree — used by the native `strftime`/`time` FunctionRegistry
    * builders so the raw-SQL `where` path stays inside whole-stage codegen
    * (no UDF). Semantics follow the session time zone (set UTC for SQLite
    * parity, as every entry point here does).
    */
  private def strftimeExpr(fmt: String, ts: Expression): Expression =
    tokenize(fmt) match {
      case Seq(PatternSeg(p)) => DateFormatClass(ts, Literal(p))
      case toks =>
        Concat(toks.map {
          case PatternSeg(p) => DateFormatClass(ts, Literal(p))
          case ComputedSeg('w') =>
            Cast(Subtract(DayOfWeek(ts), Literal(1)), StringType)
          case ComputedSeg('u') =>
            Cast(Add(Pmod(Add(DayOfWeek(ts), Literal(5)), Literal(7)),
              Literal(1)), StringType)
          case ComputedSeg('s') =>
            Cast(new UnixTimestamp(ts), StringType)
          case ComputedSeg(other) =>
            throw new IllegalStateException(s"%$other")
        })
    }

  private def literalString(e: Expression): Option[String] = e match {
    case Literal(v, StringType) if v != null => Some(v.toString)
    case _ => None
  }

  /** Register the SQLite-compat functions for raw-SQL `where` strings.
    * `strftime`/`time` are NATIVE FunctionRegistry builders that expand to
    * date_format/arithmetic expression trees at analysis time (codegen'd;
    * requires a literal format string — always true on the reference's
    * query surface). `sqlite_strftime`/`sqlite_time` remain UDFs for the
    * dynamic-format corner. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val fmtTs = (fmt: String, ts: java.sql.Timestamp) =>
      if (ts == null || fmt == null) null
      else {
        val zdt = ts.toInstant.atZone(java.time.ZoneOffset.UTC)
        tokenize(fmt).map {
          case PatternSeg(p) =>
            zdt.format(java.time.format.DateTimeFormatter.ofPattern(p))
          // SQLite %w: 0=Sunday; java DayOfWeek: Monday=1..Sunday=7
          case ComputedSeg('w') => (zdt.getDayOfWeek.getValue % 7).toString
          case ComputedSeg('u') => zdt.getDayOfWeek.getValue.toString
          case ComputedSeg('s') => zdt.toInstant.getEpochSecond.toString
          case ComputedSeg(other) => throw new IllegalStateException(s"%$other")
        }.mkString
      }
    val timeFn = (ts: java.sql.Timestamp) =>
      if (ts == null) null
      else ts.toInstant.atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
    spark.udf.register("sqlite_strftime", fmtTs)
    spark.udf.register("sqlite_time", timeFn)
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("strftime"),
      new ExpressionInfo(Compat.getClass.getName, "strftime"),
      (children: Seq[Expression]) => children match {
        // SQLite: strftime(NULL, ts) IS NULL
        case Seq(Literal(null, _), _) => Literal(null, StringType)
        case Seq(fmt, ts) =>
          literalString(fmt) match {
            case Some(f) => strftimeExpr(f, ts)
            case None =>
              // dynamic-format corner (format is a column, not a literal):
              // the expansion can't happen at analysis time, so fall back to
              // the row-at-a-time sqlite_strftime UDF registered above —
              // slower than the codegen'd tree, but the query still runs
              reg.lookupFunctionBuilder(
                  FunctionIdentifier("sqlite_strftime"))
                .map(b => b(Seq(fmt, ts)))
                .getOrElse(throw new IllegalArgumentException(
                  "strftime: dynamic format requires sqlite_strftime, " +
                    "which is not registered"))
          }
        case _ => throw new IllegalArgumentException(
          "strftime(fmt, ts) takes exactly two arguments")
      })
    reg.registerFunction(
      FunctionIdentifier("time"),
      new ExpressionInfo(Compat.getClass.getName, "time"),
      (children: Seq[Expression]) => children match {
        case Seq(ts) => DateFormatClass(ts, Literal("HH:mm:ss"))
        case _ =>
          throw new IllegalArgumentException("time(ts) takes one argument")
      })
  }
}
