package graft.betfair

import org.scalatest.funsuite.AnyFunSuite

/** CLI argv parsing contract (reference cli.py uses argparse, which accepts
  * interleaved options and consumes option values — values must never leak
  * into the positional list).
  */
class CliSpec extends AnyFunSuite {

  test("value-taking option values do not leak into positionals") {
    // `insert <db> -p flat <src>`: "flat" is the pattern, not the source
    val p = Cli.parse(Array("insert", "db", "-p", "flat", "src"))
    assert(p.positionals == Vector("insert", "db", "src"))
    assert(p.values("-p") == "flat")
    // `insert -d skip <db> <src>`: "skip" is the policy, not the db dir
    val q = Cli.parse(Array("insert", "-d", "skip", "db", "src"))
    assert(q.positionals == Vector("insert", "db", "src"))
    assert(q.values("-d") == "skip")
  }

  test("where/columns/limit values are consumed, flags collected") {
    val p = Cli.parse(Array("select", "db", "--where", "marketType = 'WIN'",
      "--columns", "marketId,venue", "--limit", "5"))
    assert(p.positionals == Vector("select", "db"))
    assert(p.values("--where") == "marketType = 'WIN'")
    assert(p.values("--columns") == "marketId,venue")
    assert(p.values("--limit") == "5")
    val q = Cli.parse(Array("insert", "db", "src", "-c", "-p", "flat"))
    assert(q.positionals == Vector("insert", "db", "src"))
    assert(q.flags.contains("-c"))
  }

  test("--option=value form is accepted like argparse") {
    val p = Cli.parse(Array("select", "db", "--limit=5",
      "--where=marketType = 'WIN'"))
    assert(p.positionals == Vector("select", "db"))
    assert(p.values("--limit") == "5")
    assert(p.values("--where") == "marketType = 'WIN'")
    val q = Cli.parse(Array("insert", "db", "src", "--pattern=flat",
      "--on-duplicates=skip"))
    assert(q.positionals == Vector("insert", "db", "src"))
    assert(q.values("--pattern") == "flat")
    assert(q.values("--on-duplicates") == "skip")
  }

  test("-V is a version request only before the subcommand") {
    assert(Cli.parse(Array("-V")).version)
    assert(Cli.parse(Array("--version", "index", "db")).version)
    // like argparse, an option name where a value is expected is a missing
    // value, not the value...
    val e = intercept[Cli.CliExit] {
      Cli.parse(Array("select", "db", "--where", "-V"))
    }
    assert(e.code == 2 && e.msg.contains("expected one argument"))
    // ...and a literal "-V" value goes through the = form
    val p = Cli.parse(Array("select", "db", "--where=-V"))
    assert(!p.version)
    assert(p.values("--where") == "-V")
  }

  test("a value-option followed by another option reports a missing value") {
    // `--limit --where x` must fail immediately, not bind "--where" as the
    // limit and surface a confusing parse error later
    val e = intercept[Cli.CliExit] {
      Cli.parse(Array("select", "db", "--limit", "--where", "x"))
    }
    assert(e.code == 2 && e.msg == "option --limit: expected one argument")
    val atEnd = intercept[Cli.CliExit] {
      Cli.parse(Array("select", "db", "--limit"))
    }
    assert(atEnd.code == 2)
  }
}
