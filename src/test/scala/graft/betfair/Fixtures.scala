package graft.betfair

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

/** Synthesized market fixtures (no reference data copied): catalogue +
  * definition JSON shapes follow the published Betfair exchange API schema as
  * characterized in SURVEY.md §1.3.
  */
object Fixtures {

  def catalogueJson(marketId: String, marketName: String, marketType: String,
      eventTypeId: String, eventTypeName: String, venue: String,
      countryCode: String = "GB", timezone: String = "Europe/London",
      startTime: String = "2023-06-01T17:09:37.000Z",
      eventId: String = "31000001", eventName: String = "Test Event",
      openDate: String = "2023-06-01T16:00:00.000Z",
      nRunners: Int = 6, bsp: Boolean = true): String = {
    val runners = (1 to nRunners).map(i =>
      s"""{"selectionId":${1000 + i},"runnerName":"Runner $i","sortPriority":$i}""")
      .mkString("[", ",", "]")
    val venueJson = if (venue == null) "null" else s""""$venue""""
    s"""{"marketId":"$marketId","marketName":"$marketName",
       |"marketStartTime":"$startTime",
       |"description":{"persistenceEnabled":true,"bspMarket":$bsp,
       |"marketTime":"$startTime","suspendTime":"$startTime",
       |"bettingType":"ODDS","turnInPlayEnabled":false,
       |"marketType":"$marketType",
       |"priceLadderDescription":{"type":"CLASSIC"}},
       |"eventType":{"id":"$eventTypeId","name":"$eventTypeName"},
       |"event":{"id":"$eventId","name":"$eventName",
       |"countryCode":"$countryCode","timezone":"$timezone","venue":$venueJson,
       |"openDate":"$openDate"},
       |"runners":$runners}""".stripMargin.replace("\n", "")
  }

  def definitionStreamLines(marketId: String, name: String,
      marketType: String = "PLACE", eventTypeId: String = "4339",
      marketTime: String = "2022-04-19T18:26:00.000Z",
      venue: String = "Sheffield", countryCode: String = "GB",
      timezone: String = "Europe/London", eventId: String = "31389771",
      openDate: String = "2022-04-19T17:00:00.000Z",
      nRunners: Int = 6): Seq[String] = {
    def defJson(status: String) = {
      val runners = (1 to nRunners).map(i =>
        s"""{"status":"ACTIVE","sortPriority":$i,"id":${44000000 + i}}""")
        .mkString("[", ",", "]")
      s"""{"bspMarket":true,"turnInPlayEnabled":false,
         |"persistenceEnabled":false,"eventId":"$eventId",
         |"eventTypeId":"$eventTypeId","numberOfWinners":2,
         |"bettingType":"ODDS","marketType":"$marketType","name":"$name",
         |"marketTime":"$marketTime","suspendTime":"$marketTime",
         |"venue":"$venue","countryCode":"$countryCode",
         |"timezone":"$timezone","openDate":"$openDate","status":"$status",
         |"runners":$runners}""".stripMargin.replace("\n", "")
    }
    Seq(
      s"""{"op":"mcm","clk":"1","pt":1650390000000,"mc":[{"id":"$marketId","marketDefinition":${defJson("OPEN")},"rc":[]}]}""",
      s"""{"op":"mcm","clk":"2","pt":1650390001000,"mc":[{"id":"$marketId","rc":[{"atb":[[2.0,10.5]],"id":44000001}]}]}""",
      s"""{"op":"mcm","clk":"3","pt":1650390002000,"mc":[{"id":"$marketId","marketDefinition":${defJson("CLOSED")},"rc":[]}]}""")
  }

  def write(path: Path, content: String): Path = {
    Files.createDirectories(path.getParent)
    Files.write(path, content.getBytes(StandardCharsets.UTF_8))
  }

  def writeLines(path: Path, lines: Seq[String]): Path =
    write(path, lines.mkString("\n") + "\n")

  def writeGz(path: Path, lines: Seq[String]): Path = {
    Files.createDirectories(path.getParent)
    val out = new GZIPOutputStream(
      new BufferedOutputStream(new FileOutputStream(path.toFile)))
    out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    path
  }

  def writeZip(path: Path, entryName: String, lines: Seq[String]): Path = {
    Files.createDirectories(path.getParent)
    val out = new ZipOutputStream(new FileOutputStream(path.toFile))
    out.putNextEntry(new ZipEntry(entryName))
    out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    out.closeEntry()
    out.close()
    path
  }

  def writeBz2(path: Path, lines: Seq[String]): Path = {
    Files.createDirectories(path.getParent)
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(new FileOutputStream(path.toFile))
    out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    path
  }

  /** A small multi-sport database:
    *  - 4 greyhound (4339) Sheffield markets: WIN "A2 462m" + PLACE of the
    *    same race (catalogue + plaintext data)
    *  - 1 horse (7) Ascot WIN "2m Mdn Hrd" (catalogue + plaintext data)
    *  - 1 football catalogue market (non-racing)
    *  - 1 stream-only market (.gz, no catalogue -> definition extraction)
    *  - 1 stream-only market (.zip)
    *  - 1 metadata-without-data orphan
    *  - 1 corrupt metadata file with data
    * Total indexable markets: 6 (stems: 8; 1 without data, 1 corrupt).
    */
  def multiSportDb(root: Path): Unit = {
    val day = "2023-06-01T17:09:37.000Z"
    // greyhound race: WIN + PLACE share (typeId, country, venue, start)
    write(root.resolve("gh/1.200000001.json"),
      catalogueJson("1.200000001", "A2 462m", "WIN", "4339",
        "Greyhound Racing", "Sheffield", startTime = day))
    writeLines(root.resolve("gh/1.200000001"),
      Seq("""{"op":"mcm","mc":[{"id":"1.200000001","rc":[]}]}"""))
    write(root.resolve("gh/1.200000002.json"),
      catalogueJson("1.200000002", "To Be Placed", "PLACE", "4339",
        "Greyhound Racing", "Sheffield", startTime = day))
    writeLines(root.resolve("gh/1.200000002"),
      Seq("""{"op":"mcm","mc":[{"id":"1.200000002","rc":[]}]}"""))
    // horse WIN
    write(root.resolve("horse/1.200000003.json"),
      catalogueJson("1.200000003", "2m Mdn Hrd", "WIN", "7", "Horse Racing",
        "Ascot", startTime = day))
    writeLines(root.resolve("horse/1.200000003"),
      Seq("""{"op":"mcm","mc":[{"id":"1.200000003","rc":[]}]}"""))
    // football (non-racing)
    write(root.resolve("foot/1.200000004.json"),
      catalogueJson("1.200000004", "Match Odds", "MATCH_ODDS", "1", "Soccer",
        null, countryCode = "DE", timezone = "Europe/Berlin",
        startTime = "2023-06-02T19:30:00.000Z"))
    writeLines(root.resolve("foot/1.200000004"),
      Seq("""{"op":"mcm","mc":[{"id":"1.200000004","rc":[]}]}"""))
    // stream-only .gz
    writeGz(root.resolve("streams/1.200000005.gz"),
      definitionStreamLines("1.200000005", "R4 405m Gr3/4", "WIN"))
    // stream-only .zip
    writeZip(root.resolve("streams/1.200000006.zip"), "1.200000006",
      definitionStreamLines("1.200000006", "To Be Placed", "PLACE"))
    // metadata without data
    write(root.resolve("orphans/1.200000007.json"),
      catalogueJson("1.200000007", "Orphan", "WIN", "7", "Horse Racing",
        "Epsom"))
    // corrupt metadata with data
    write(root.resolve("bad/1.200000008.json"), "{not valid json!!")
    writeLines(root.resolve("bad/1.200000008"),
      Seq("""{"op":"mcm","mc":[{"id":"1.200000008","rc":[]}]}"""))
  }

  def tempDir(prefix: String): Path =
    Files.createTempDirectory(prefix)
}
