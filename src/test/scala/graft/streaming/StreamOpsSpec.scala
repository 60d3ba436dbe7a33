package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}

class StreamOpsSpec extends SparkSpec {

  test("windowed counts with watermark over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedCounts(df, "1 minute", "1 hour")
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0),
      (t(11, 10), "buy", 5.0))
    q.processAllAvailable()
    val out = s.sql("select * from wc").collect()
    q.stop()
    assert(out.length == 2)
    val clicks = out.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[Long]("cnt") == 2)
    assert(clicks.getAs[Double]("sum_value") == 3.0)
  }

  test("end-to-end streaming document pipeline: filter, dedup, sink") {
    // the composed training-data shape: ingest -> quality gate ->
    // watermark-bounded exact dedup -> append sink
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val gated = docs.filter(length(col("text")) >= 10)
    val deduped = StreamOps.dedupStream(gated, "5 minutes")
    val q = deduped.writeStream.format("memory").queryName("pipe")
      .outputMode("append").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData(
      (t(0), 1L, "a good long document body"),
      (t(1), 2L, "short"), // fails the quality gate
      (t(2), 3L, "A GOOD, long document body!"), // dup of 1 after normalize
      (t(3), 4L, "another acceptable document"))
    q.processAllAvailable()
    val out = s.sql("select doc_id from pipe").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(out == Set(1L, 4L))
  }

  test("streaming gopher quality gate matches the batch verdict") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // long enough that no single 3/4-gram's characters breach the 18%/16%
    // caps (a 15-word doc fails those arithmetically, by design)
    val good = "the quick brown fox jumps over a lazy dog near the old " +
      "stone bridge today while seven curious children watch small " +
      "boats drift slowly down the quiet river under bright morning skies"
    val tooShort = "way too short"
    val bulletSpam = "the quick brown fox jumps over a lazy dog today\n" +
      (1 to 28).map(_ => "- item alpha").mkString("\n")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamOps.qualityGateStream(docs)
      .writeStream.format("memory").queryName("qg")
      .outputMode("append").start()
    mem.addData((1L, good), (2L, tooShort), (3L, bulletSpam))
    q.processAllAvailable()
    val out = s.sql("select doc_id, keep_quality from qg").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q.stop()
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
    // batch/streaming parity: the SAME texts through the batch-side Column
    // produce the SAME verdicts (shared single source of truth)
    val batch = Seq((1L, good), (2L, tooShort), (3L, bulletSpam))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.ops.TextOps.gopherKeep(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch == out)
  }

  test("streaming C4 gate matches the batch page verdict") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val keepPage = (1 to 4)
      .map(i => s"this is sentence number $i in full form.").mkString("\n")
    val fewLines = "one good sentence that terminates properly today."
    val braced = keepPage + "\nfunction() { code }"
    val lorem = keepPage + "\nlorem ipsum dolor sit amet."
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.c4GateStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("c4g")
      .outputMode("append").start()
    mem.addData((1L, keepPage), (2L, fewLines), (3L, braced), (4L, lorem))
    q.processAllAvailable()
    val out = s.sql("select doc_id, keep_c4 from c4g").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q.stop()
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // batch/streaming parity: the SAME texts through the shared c4Keep
    // Column produce the SAME page verdicts
    val batch = Seq((1L, keepPage), (2L, fewLines), (3L, braced),
      (4L, lorem)).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.ops.TextOps.c4Keep(split(col("text"), "\n")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch == out)
  }

  test("incremental dedup stream accumulates state and reproduces batch pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("incdedup").toString
    val state = s"$dir/sigs"
    // real corpus texts (they carry actual near-dup structure), streamed in
    // two disjoint batches
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = corpus.partition(_._1 < 250)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamOps.incrementalDedupStream(s, docs, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // accumulated pairs across micro-batches == one-shot full recompute
    val streamed = s.read.parquet(s"$state.pairs")
      .select("d1", "d2", "n_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val allDocs = corpus.toSeq.toDF("doc_id", "text")
    val empty = graft.ops.TextOps.minhashSignatures(allDocs.filter(lit(false)))
    val (fullSigs, fullPairs) =
      graft.ops.TextOps.incrementalMinhashDedup(empty, allDocs)
    val expected = fullPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == expected)
    assert(expected.nonEmpty)
    // the published snapshot carries every document's signature
    assert(s.read.parquet(state).count() == fullSigs.count())
  }

  test("image dedup stream accumulates 8-byte hash state and reproduces " +
      "the one-shot d98 pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("imgdedup").toString
    val state = s"$dir/hashes"
    // real synthesized PNG payloads (they carry the d98 class structure),
    // streamed in two disjoint batches
    val payloads = graft.multimodal.Multimodal.imageDedupPayload(
        graft.Tables.documents(s, "/root/testdata/sf0.001")
          .select("doc_id"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val (b1, b2) = payloads.partition(_._1 < 250)
    val mem = MemoryStream[(Long, Array[Byte])]
    val media = mem.toDF().toDF("doc_id", "payload")
    val q = StreamOps.imageDedupStream(s, media, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.read.parquet(s"$state.pairs")
      .select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = graft.multimodal.Multimodal
      .d98ImageNearDup(s, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == expected)
    assert(expected.nonEmpty)
    // the published snapshot holds one 8-byte hash per document
    assert(s.read.parquet(state).count() == payloads.length)
    graft.ops.CacheRegistry.harness.release()
  }

  test("semantic dedup stream accumulates assignments and reproduces the " +
      "fixed-centroid one-shot pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("semdedup").toString
    val state = s"$dir/assign"
    val codebookPath = s"$dir/codebook"
    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val half = corpus.map(_._1).sorted.apply(corpus.length / 2)
    // offline step: train the frozen codebook on the early half, persist
    graft.ops.VectorOps.trainCodebook(s,
        corpus.filter(_._1 < half).toSeq.toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(codebookPath)
    val (b1, b2) = corpus.partition(_._1 < half)
    val mem = MemoryStream[(Long, Seq[Float])]
    val emb = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.semanticDedupStream(s, emb, codebookPath, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.read.parquet(s"$state.pairs")
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-shot at the SAME frozen codebook: assign everything, one pair
    // search over the whole assignment table (empty prior side)
    val codebook = s.read.parquet(codebookPath)
    val allAssigned = graft.ops.VectorOps.assignToCentroids(s,
      corpus.toSeq.toDF("vec_id", "embedding"), codebook)
    val expected = graft.ops.VectorOps.semanticPairs(s,
        allAssigned.filter(lit(false)), allAssigned)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected)
    assert(expected.nonEmpty)
    // the published state carries every vector's stored assignment, and
    // stored cids agree with a fresh assignment against the codebook
    val stateRows = s.read.parquet(state).select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val freshRows = allAssigned.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(stateRows == freshRows)
    graft.ops.CacheRegistry.harness.release()
  }

  test("ann ingest stream accumulates inverted lists and serves the " +
      "one-shot top-k") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("annindex").toString
    val state = s"$dir/index"
    val codebookPath = s"$dir/codebook"
    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val half = corpus.map(_._1).sorted.apply(corpus.length / 2)
    // offline step: train the frozen coarse quantizer on the early half
    graft.ops.VectorOps.ivfCodebookOn(
        corpus.filter(_._1 < half).toSeq.toDF("vec_id", "label", "embedding"))
      .write.mode("overwrite").parquet(codebookPath)
    val vecs = corpus.map(t => (t._1, t._3))
    val (b1, b2) = vecs.partition(_._1 < half)
    val mem = MemoryStream[(Long, Seq[Float])]
    val emb = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.annIngestStream(s, emb, codebookPath, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // the accumulated index holds one stored assignment per vector
    assert(s.read.parquet(state).count() == corpus.length)
    val queries = vecs.filter(_._1 < 10).toSeq.toDF("vec_id", "embedding")
    val served = StreamOps.annIndexQuery(s, state, codebookPath, queries)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // one-shot at the SAME frozen codebook: assign everything in one go,
    // probe through the same shared definitions
    val codebook = s.read.parquet(codebookPath)
    val allAssigned = graft.ops.VectorOps.assignToIvfLists(s,
      vecs.toSeq.toDF("vec_id", "embedding"), codebook)
    val expected = graft.ops.VectorOps.ivfTopK(
        graft.ops.VectorOps.ivfProbeCandidates(s, allAssigned,
          graft.ops.VectorOps.ivfQueryProbes(s, queries, codebook)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(served.nonEmpty)
    assert(served.toSeq == expected.toSeq)
    // compaction: the streamed batch=N layout rewrites into the bucketed
    // serving layout, and the served answers are unchanged
    s.sql("DROP TABLE IF EXISTS g_ann_compact")
    StreamOps.compactAnnIndex(s, state, "g_ann_compact", s"$dir/compact")
    val probes = graft.ops.VectorOps.ivfQueryProbes(s, queries, codebook)
    val compacted = graft.ops.VectorOps.ivfTopK(
        graft.ops.VectorOps.probeIvfBucketedState(s, "g_ann_compact", probes))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(compacted.toSeq == expected.toSeq)
    s.sql("DROP TABLE IF EXISTS g_ann_compact")
    graft.ops.CacheRegistry.harness.release()
  }

  test("stream-static decontamination flags docs overlapping the eval set") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    // static benchmark shingles (3-grams of the protected eval text)
    val bench = Seq("the quick brown", "quick brown fox").toDF("sh")
    val q = StreamOps.decontaminateStream(docs, bench, "5 minutes")
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData(
      (t(0), 1L, "the quick brown fox jumps"), // 2 shared shingles
      (t(1), 2L, "a completely unrelated document body"),
      (t(2), 3L, "short one")) // under 3 words after gate
    q.processAllAvailable()
    // advance the watermark past the window so append emits
    mem.addData((t(30), 99L, "late watermark advancer text"))
    q.processAllAvailable()
    val out = s.sql("select window_start, doc_id, n_shared from decon")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getTimestamp(0)))
    q.stop()
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L,
      s"got ${out.mkString(",")}")
    assert(out.head._3 != null)
  }

  test("stream-stream attribution join bounds clicks to the prior hour") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def df(m: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
    val q = StreamOps.attributionJoin(df(clicks), df(purchases))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: click 30 min before purchase (joins), click 2h before (outside
    // window), click AFTER purchase (excluded); user 2: no purchase
    clicks.addData((1L, 100L, t(10, 0)), (1L, 101L, t(11, 30)),
      (1L, 102L, t(12, 30)), (2L, 200L, t(11, 0)))
    purchases.addData((1L, 900L, t(12, 0)))
    q.processAllAvailable()
    val out = s.sql("select * from attr").collect()
    q.stop()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("click_id") == 101L)
    assert(out.head.getAs[Long]("purchase_id") == 900L)
  }

  test("sessionization: gap closes a session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMillis = 60 * 1000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    def ev(user: Long, sec: Int) = StreamOps.Event(user,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:00:${sec % 60}%02d")
        match { case ts => new java.sql.Timestamp(ts.getTime + (sec / 60) * 60000L) },
      "click", 1.0)
    // two bursts 5 minutes apart: first burst must close when second arrives
    mem.addData(ev(1, 0), ev(1, 10))
    q.processAllAvailable()
    mem.addData(StreamOps.Event(1,
      java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 2.0))
    q.processAllAvailable()
    val sessions = s.sql("select * from sess").collect()
    q.stop()
    assert(sessions.length == 1)
    assert(sessions.head.getAs[Long]("n_events") == 2)
  }

  test("streaming market-definition ingestion from stream files") {
    val dir = Fixtures.tempDir("graftstream")
    Fixtures.writeLines(dir.resolve("1.500000001"),
      Fixtures.definitionStreamLines("1.500000001", "6f Mdn", "WIN"))
    val df = StreamOps.streamMarketDefinitions(spark, dir.toString)
    val q = df.writeStream.format("memory").queryName("defs")
      .outputMode("append").start()
    q.processAllAvailable()
    val defs = spark.sql("select * from defs").collect()
    q.stop()
    // both marketDefinition lines of the capture surface; latest by pt is
    // the upsert winner downstream
    assert(defs.length == 2)
    val latest = defs.maxBy(_.getAs[Long]("pt"))
    assert(latest.getAs[Long]("pt") == 1650390002000L)
    assert(latest.getAs[org.apache.spark.sql.Row]("definition")
      .getAs[String]("name") == "6f Mdn")
    assert(defs.forall(_.getAs[String]("marketId") == "1.500000001"))
  }

  test("continuous index upserts the latest definition per market") {
    val dir = Fixtures.tempDir("graftcont")
    val in = dir.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val idx = dir.resolve("index.parquet").toString
    Fixtures.writeLines(in.resolve("1.600000001"),
      Fixtures.definitionStreamLines("1.600000001", "6f Mdn", "WIN"))
    val q = StreamOps.continuousIndex(spark, in.toString, idx)
    q.processAllAvailable()
    val after1 = spark.read.parquet(idx).collect()
    assert(after1.length == 1)
    assert(after1.head.getAs[Long]("pt") == 1650390002000L)
    assert(after1.head.getAs[org.apache.spark.sql.Row]("definition")
      .getAs[String]("name") == "6f Mdn")
    // a later capture file for a second market arrives: incremental upsert
    Fixtures.writeLines(in.resolve("1.600000002"),
      Fixtures.definitionStreamLines("1.600000002", "7f Nov", "WIN"))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.read.parquet(idx).collect()
    assert(after2.length == 2)
    assert(after2.map(_.getAs[String]("marketId")).sorted.toSeq ==
      Seq("1.600000001", "1.600000002"))
  }

  test("continuous index recovers a swap that crashed between retire and publish") {
    val dir = Fixtures.tempDir("graftcrash")
    val in = dir.resolve("in")
    java.nio.file.Files.createDirectories(in)
    val idx = dir.resolve("index.parquet").toString
    Fixtures.writeLines(in.resolve("1.700000001"),
      Fixtures.definitionStreamLines("1.700000001", "6f Mdn", "WIN"))
    val q1 = StreamOps.continuousIndex(spark, in.toString, idx)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(idx).count() == 1)
    // simulate the crash window: live index retired to _old, publish never ran
    val live = new org.apache.hadoop.fs.Path(idx)
    val retired = new org.apache.hadoop.fs.Path(s"${idx}_old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(live, retired))
    assert(!fs.exists(live) && fs.exists(retired))
    // next batch must first restore the retired snapshot, then merge onto it
    Fixtures.writeLines(in.resolve("1.700000002"),
      Fixtures.definitionStreamLines("1.700000002", "7f Nov", "WIN"))
    val q2 = StreamOps.continuousIndex(spark, in.toString, idx)
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(idx).collect()
    assert(after.map(_.getAs[String]("marketId")).sorted.toSeq ==
      Seq("1.700000001", "1.700000002"))
    assert(!fs.exists(retired))
  }

  test("streaming dedup drops in-watermark duplicate fingerprints") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.dedupStream(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // same normalized fingerprint for 1 and 2 ("Hello,  World!" ≡ "hello world")
    mem.addData((t(0), 1L, "Hello,  World!"), (t(1), 2L, "hello world"),
      (t(2), 3L, "different doc"))
    q.processAllAvailable()
    mem.addData((t(3), 4L, "HELLO world."))
    q.processAllAvailable()
    val out = s.sql("select doc_id from dedup").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("streaming url dedup drops in-watermark canonical-URL duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "url")
    val q = StreamOps.urlDedupStream(df, "10 minutes")
      .writeStream.format("memory").queryName("urldedup")
      .outputMode("append").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // 1, 2 and 4 are the same page fetched three messy ways; 3 differs
    mem.addData(
      (t(0), 1L, "https://www.Example.com/a/3/?utm_source=feed"),
      (t(1), 2L, "http://example.com/a/3"),
      (t(2), 3L, "http://example.com/a/4"))
    q.processAllAvailable()
    mem.addData((t(3), 4L, "HTTPS://EXAMPLE.COM/a/3#frag"))
    q.processAllAvailable()
    val out = s.sql("select doc_id, canon_url from urldedup").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    q.stop()
    assert(out.map(_._1).toSeq == Seq(1L, 3L))
    // batch/stream parity: the shared canonicalizeUrl produced the
    // identical canonical form the d93 batch op would
    assert(out.head._2 == "example.com/a/3")
  }

  test("audio dedup stream accumulates 8-byte hash state and reproduces " +
      "the one-shot d102 pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("auddedup").toString
    val state = s"$dir/hashes"
    // real synthesized WAV payloads, streamed in two disjoint batches
    val payloads = graft.multimodal.Multimodal.audioDedupPayload(
        graft.Tables.documents(s, "/root/testdata/sf0.001")
          .select("doc_id"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val (b1, b2) = payloads.partition(_._1 < 250)
    val mem = MemoryStream[(Long, Array[Byte])]
    val media = mem.toDF().toDF("doc_id", "payload")
    val q = StreamOps.audioDedupStream(s, media, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.read.parquet(s"$state.pairs")
      .select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = graft.multimodal.Multimodal
      .d102AudioNearDup(s, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == expected)
    assert(expected.nonEmpty)
    assert(s.read.parquet(state).count() == payloads.length)
    graft.ops.CacheRegistry.harness.release()
  }

  test("video dedup stream accumulates frame state and reproduces the " +
      "one-shot d103 containment pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("viddedup").toString
    val state = s"$dir/frames"
    // the d103 synthetic frame tables, streamed whole-video per batch
    val oneShot = graft.multimodal.Multimodal
      .d103VideoOverlap(s, "/root/testdata/sf0.001")
    val cls = col("doc_id") % graft.multimodal.Multimodal.VideoDupClasses
    val off = (expr(s"doc_id div ${graft.multimodal.Multimodal.VideoDupClasses}") % 4) * 16
    val n = lit(64) + (cls % 3) * 16
    val frames = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        explode(transform(sequence(off, off + n - 1),
          k => md5(concat(lit("vid:"), cls.cast("string"), lit(":"),
            k.cast("string"))))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = frames.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, String)]
    val fdf = mem.toDF().toDF("doc_id", "fp")
    val q = StreamOps.videoDedupStream(s, fdf, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.read.parquet(s"$state.pairs")
      .select("d1", "d2", "inter", "containment_q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = oneShot
      .select("d1", "d2", "inter", "containment_q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == expected)
    assert(expected.nonEmpty)
    // state carries every frame row exactly once
    assert(s.read.parquet(state).count() == frames.length)
    graft.ops.CacheRegistry.harness.release()
  }

  test("retention stream accumulates activity state and reproduces the one-shot q107 matrix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("retention").toString
    val state = s"$dir/act"
    // real events, streamed in two disjoint micro-batches (event_id parity
    // — users and weeks STRADDLE the batches, which is what makes the
    // read-time distinct-merge necessary and the test meaningful)
    val corpus = graft.Tables.events(s, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val (b1, b2) = corpus.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val ev = mem.toDF().toDF("event_id", "user_id", "ts")
    val q = StreamOps.retentionStream(s, ev, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = StreamOps.retentionMatrix(s, state)
    val oneShot = graft.ops.Relational
      .q107RetentionCohorts(s, "/root/testdata/sf0.001")
    assert(streamed.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
    // the state really is per-batch partials: two published partitions,
    // and their union contains duplicates that the read-time merge drops
    val partials = s.read.parquet(state)
    assert(partials.select("batch").distinct().count() == 2)
    assert(partials.count() >=
      partials.select("user_id", "wk").distinct().count())
  }

  test("tombstone stream: live view heals the hash state; probes match " +
      "the surviving-prior incremental pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("tombstream").toString
    val state = s"$dir/hashes"
    val hashes = graft.multimodal.Multimodal.aHash64(
        graft.multimodal.Multimodal.imageDedupPayload(
          graft.Tables.documents(s, "/root/testdata/sf0.001")
            .select("doc_id")))
      .filter(col("ahash").isNotNull).persist()
    graft.ops.CacheRegistry.harness.add(hashes)
    val rows = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val (prior, batch) = rows.partition(_._1 < 250)
    // ingest the prior half as two state partitions (the sink layout)
    prior.filter(_._1 % 2 == 0).toSeq.toDF("doc_id", "ahash")
      .write.parquet(s"$state/batch=0")
    prior.filter(_._1 % 2 == 1).toSeq.toDF("doc_id", "ahash")
      .write.parquet(s"$state/batch=1")
    // no tombstones yet: the live view IS the state
    assert(StreamOps.liveState(s, state).count() == prior.length)
    // stream two delete batches (with an overlap — re-deleting an id is
    // one anti-join fact, not an error)
    val mem = MemoryStream[Long]
    val q = StreamOps.tombstoneStream(s, mem.toDF().toDF("doc_id"), state)
    val dels = prior.map(_._1).filter(_ % 7 == 3)
    val (d1, d2) = dels.splitAt(dels.length / 2)
    mem.addData(d1.toSeq: _*)
    q.processAllAvailable()
    mem.addData((d2 ++ d1.take(2)).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val live = StreamOps.liveState(s, state)
    assert(live.count() == prior.length - dels.length)
    assert(live.filter(col("doc_id") % 7 === 3).count() == 0)
    // a new batch probing the healed view sees exactly the pairs of the
    // surviving prior — deleted docs are gone from candidate generation
    val batchDf = batch.toSeq.toDF("doc_id", "ahash")
    val survivingPrior = prior.filterNot(p => dels.contains(p._1)).toSeq
      .toDF("doc_id", "ahash")
    val got = graft.multimodal.Multimodal
      .incrementalHammingPairs(live, batchDf)
    val expected = graft.multimodal.Multimodal
      .incrementalHammingPairs(survivingPrior, batchDf)
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0)
    // the docstring's full lifecycle, end to end: sink partitions →
    // tombstoneStream → compaction → bucketed serving probe. Compaction
    // applies the streamed tombstones PHYSICALLY (no deleted id reaches
    // the serving tables), and the probe over the compacted layout serves
    // the same survivor-only pairs as the in-memory probe above.
    Seq("g_ts_ham_m", "g_ts_ham_b")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    StreamOps.compactHammingState(s, state, "g_ts_ham_m", s"$dir/m",
      "g_ts_ham_b", s"$dir/b")
    assert(s.table("g_ts_ham_m").filter(col("doc_id") % 7 === 3)
      .count() == 0, "a streamed tombstone was resurrected by compaction")
    val served = graft.multimodal.Multimodal.probeHammingBucketedState(
      s, "g_ts_ham_m", "g_ts_ham_b", batchDf)
    assert(served.exceptAll(expected).count() == 0 &&
      expected.exceptAll(served).count() == 0)
    Seq("g_ts_ham_m", "g_ts_ham_b")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    graft.ops.CacheRegistry.harness.release()
  }

  test("pq ingest stream accumulates code rows and serves the one-shot " +
      "ADC top-k; tombstones heal; compaction collapses and replaces") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("pqindex").toString
    val state = s"$dir/codes"
    val codebookPath = s"$dir/codebook"
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    graft.ops.CacheRegistry.harness.add(emb)
    // offline step: frozen per-subspace codebooks on the even half
    val evenSubs = graft.ops.VectorOps.pqSubvectors(
      emb.filter(col("vec_id") % 2 === 0))
    graft.ops.VectorOps.trainPqCodebooksOn(s, evenSubs,
        col("vec_id") < 2 * graft.ops.VectorOps.PqK)
      .write.mode("overwrite").parquet(codebookPath)
    val vecs = emb.as[(Long, Seq[Float])].collect()
    val (b1, b2) = vecs.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.pqIngestStream(s,
      mem.toDF().toDF("vec_id", "embedding"), codebookPath, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // M code rows per vector, one batch each
    assert(s.read.parquet(state).count() ==
      vecs.length.toLong * graft.ops.VectorOps.PqM)
    val queries = emb.filter(col("vec_id") < 5)
    val served = StreamOps.pqIndexQuery(s, state, codebookPath, queries)
    // one-shot at the SAME frozen codebooks == the v121 identity
    val cb = s.read.parquet(codebookPath)
    val allSubs = graft.ops.VectorOps.pqSubvectors(emb)
    def expectedOver(subs: org.apache.spark.sql.DataFrame) =
      graft.ops.VectorOps.pqTopK(graft.ops.VectorOps.pqAdcScore(s,
        graft.ops.VectorOps.encodePq(s, subs, cb),
        graft.ops.VectorOps.pqSubvectors(queries), cb))
    val expected = expectedOver(allSubs)
    assert(served.exceptAll(expected).count() == 0 &&
      expected.exceptAll(served).count() == 0)
    assert(served.count() > 0)
    // tombstones: the query path heals, the compaction applies physically
    emb.filter(col("vec_id") % 7 === 3).select("vec_id")
      .write.parquet(s"$state.tombstones/batch=0")
    val survivorSubs = allSubs.filter(col("vec_id") % 7 =!= 3)
    val expectedLive = expectedOver(survivorSubs)
    val servedLive = StreamOps.pqIndexQuery(s, state, codebookPath, queries)
    assert(servedLive.exceptAll(expectedLive).count() == 0 &&
      expectedLive.exceptAll(servedLive).count() == 0)
    StreamOps.compactPqCodes(s, state, s"$dir/compact")
    val compacted = s.read.parquet(s"$dir/compact")
    assert(compacted.filter(col("vec_id") % 7 === 3).count() == 0)
    val n1 = compacted.count()
    StreamOps.compactPqCodes(s, state, s"$dir/compact")
    assert(s.read.parquet(s"$dir/compact").count() == n1,
      "re-running the compaction must replace, not double")
    val servedCompact = graft.ops.VectorOps.pqTopK(
      graft.ops.VectorOps.pqAdcScore(s,
        s.read.parquet(s"$dir/compact"),
        graft.ops.VectorOps.pqSubvectors(queries), cb))
    assert(servedCompact.exceptAll(expectedLive).count() == 0 &&
      expectedLive.exceptAll(servedCompact).count() == 0)
    graft.ops.CacheRegistry.harness.release()
  }

  test("update stream: a revision in one micro-batch supersedes the " +
      "stored doc and retracts its stale pairs — views equal the " +
      "one-shot over the current corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("updstream").toString
    val state = s"$dir/sigs"
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (evens, odds) = corpus.partition(_._1 % 2 == 0)
    def revise(t: (Long, String)) =
      (t._1, s"${t._2} revised edition ${t._1 % 3}")
    // batch 1 = evens as first crawled; batch 2 = the odds PLUS re-crawls
    // of every doc_id % 10 == 0 (changed text under the same id); batch 3
    // revises one of those AGAIN (supersede must take max upto)
    val rev1 = evens.filter(_._1 % 10 == 0).map(revise)
    val rev2 = rev1.take(1).map(revise)
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.updateDedupStream(s, mem.toDF().toDF("doc_id", "text"),
      state)
    mem.addData(evens.toSeq: _*)
    q.processAllAvailable()
    mem.addData((odds ++ rev1).toSeq: _*)
    q.processAllAvailable()
    mem.addData(rev2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // the CURRENT corpus: odds + evens with their latest revisions
    val current = (odds ++ evens.filterNot(_._1 % 10 == 0) ++
      rev1.filterNot(t => rev2.exists(_._1 == t._1)) ++ rev2).toSeq
      .toDF("doc_id", "text")
    // doc-state view: latest row per doc == signatures of current text
    val stateView = StreamOps.updatedState(s, state)
    val oneShotSigs = graft.ops.TextOps.minhashSignaturesWithKeys(current)
    assert(stateView.exceptAll(oneShotSigs).count() == 0 &&
      oneShotSigs.exceptAll(stateView).count() == 0)
    // pair view: stale pairs of revised docs retracted, their new text's
    // pairs (emitted by the SAME batch as the supersede) kept — equals
    // the one-shot candidate pairs of the current corpus
    val pairView = StreamOps.updatedPairs(s, state)
    val empty = graft.ops.TextOps.minhashSignatures(current.filter(lit(false)))
    val (_, oneShotPairs) =
      graft.ops.TextOps.incrementalMinhashDedup(empty, current)
    assert(pairView.exceptAll(oneShotPairs).count() == 0 &&
      oneShotPairs.exceptAll(pairView).count() == 0)
    assert(pairView.count() > 0)
    graft.ops.CacheRegistry.harness.release()
  }
}
