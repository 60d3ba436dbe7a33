package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Distributed byte-pair-encoding tokenizer family — t139 (merge-rule
  * learning), t140 (corpus tokenization under the frozen merges), t141
  * (the t69 packing consumer re-expressed over BPE token counts).
  *
  * BPE (Sennrich et al., ACL 2016 — public method) is the subword
  * tokenizer every modern pretraining pipeline runs; until now the repo's
  * token accounting (t69 packing budgets, t125 manifest, t136 weights)
  * counted WHITESPACE words. The reference's analog is its fixed derive
  * stage (`betfairdatabase/metadata.py:40-72`): a learned-then-frozen
  * per-row transform.
  *
  * Distributed design — the two-table shape that makes BPE scale:
  *  - the CORPUS is touched exactly twice: once to build the word-frequency
  *    vocabulary (one map-side explode + count aggregation; by Heaps' law
  *    the distinct-word table is orders of magnitude smaller than 100 TB of
  *    text), and once at tokenize time to join words to their final symbol
  *    sequences. Merge learning never reads the corpus again — the
  *    frequency weights stand in for every occurrence.
  *  - one learning round over the vocab = map-side adjacent-pair explode
  *    (each word contributes len-1 weighted pairs), a partial-aggregated
  *    `sum(freq)` per pair, and `orderBy(cnt desc, pair).limit(1)` — Spark
  *    plans TakeOrderedAndProject (per-partition top-1, merge of 1-row
  *    partials), never a global sort. The winning rule is collected (one
  *    ~10-byte row — see [[learnBpeOn]] on why that cut is load-bearing)
  *    and applied to the vocab as a literal map-side `replace`.
  *    [[BpeMerges]] rounds total, each O(vocab), zero corpus passes.
  *  - the learned merge table is a FROZEN offline artifact (the
  *    v60-codebook / d92-centroid contract): production learns it once,
  *    ships it, and tokenizes any later batch under it — which is why t140
  *    tokenizes via the vocab table the learning loop already carries
  *    (word → fully-merged symbol sequence) instead of re-applying K rules
  *    per occurrence.
  *
  * Engine-exactness — integers and strings only, no floats anywhere:
  *  - pair counts are BIGINT sums of BIGINT frequencies; the per-round
  *    argmax is (count DESC, pair ASC) — a total order, so ties cannot
  *    diverge between engines or partitionings (BpeSpec pins this under
  *    repartitioning).
  *  - a symbol sequence is rendered as the string `" s1, s2, …, sK,"`:
  *    every symbol occurrence is wrapped as `' ' + sym + ','`, so one
  *    merge application is ONE literal `replace(seq, ' a, b,', ' ab,')`.
  *    Both delimiters are load-bearing: the leading space stops the rule's
  *    first symbol matching a longer symbol's SUFFIX (`ba` vs rule
  *    `(a, b)`), the trailing comma stops its second symbol matching a
  *    longer symbol's PREFIX (`bc` vs rule `(a, b)`) — and because each
  *    match consumes both symbols' full delimiters, adjacent candidate
  *    matches share no characters, making left-to-right non-overlapping
  *    `replace` (the semantics of BOTH Spark's UTF8String.replace and
  *    DuckDB's replace) exactly the textbook leftmost-greedy single-rule
  *    application: `a a a a` + rule (a,a) → `aa aa`, never `aa a a`
  *    (BpeSpec pins both hazard cases). Symbols are `[a-z_]` only — the
  *    vocabulary admits purely-alphabetic words plus the `_` end-of-word
  *    marker — so neither delimiter can occur INSIDE a symbol.
  */
object BpeOps {

  /** Fixed number of learned merge rules — small so the oracle can unroll
    * the rounds as CTEs (the v60/t135 fixed-iteration convention); the
    * loop shape is K-independent.
    */
  val BpeMerges = 10

  /** Token budget for the t141 packing consumer (t69's budget). */
  private val PackBudget = 512L

  /** BPE-token budget per retrieval chunk for the t147 chunker. */
  private val ChunkBudget = 64L

  /** Symbols of a rendered sequence string: strip the leading space and
    * trailing comma, split on the `", "` joint. `" t, h, e, _,"` →
    * `[t, h, e, _]`.
    */
  private def syms(seq: Column): Column =
    split(seq.substr(lit(2), length(seq) - 2), ", ")

  /** Adjacent symbol pairs as `"a b"` strings — each word of length L
    * contributes L−1 (overlapping) pairs, the textbook BPE count.
    */
  private def adjacentPairs(sy: Column): Column =
    transform(slice(sy, lit(1), size(sy) - 1),
      (x, i) => concat(x, lit(" "), element_at(sy, i + 2)))

  /** The word-frequency vocabulary with initial symbol sequences: distinct
    * purely-alphabetic words (so `' '` and `','` are free delimiters and
    * `_` a free marker), corpus occurrence counts as weights, each word
    * rendered as its characters plus the end-of-word marker.
    *
    * Deliberately NOT Spread (unlike shingleTableN/docPostings): the BPE
    * corpus passes pipeline straight into a word-keyed aggregation whose
    * exchange the doc-keyed spread cannot elide, so the extra exchange is
    * pure cost — measured +1.7 s across the six BPE queries when tried
    * (OPTIMIZATION_r19.md round 19).
    */
  def bpeVocab0(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq", render(col("word")))

  /** A word's initial rendered sequence: each character wrapped as
    * `' c,'` plus the `' _,'` end-of-word marker.
    */
  private def render(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1,"), lit(" _,"))

  /** One merge application = one literal replace on the rendered sequence
    * (see the class note on why the `' a, b,'` shape makes non-overlapping
    * replace exactly leftmost-greedy BPE). `pair` is the `"a b"` rule
    * string.
    */
  private[ops] def applyMerge(seq: Column, pair: Column): Column =
    call_function("replace", seq,
      concat(lit(" "),
        call_function("replace", pair, lit(" "), lit(", ")), lit(",")),
      concat(lit(" "),
        call_function("replace", pair, lit(" "), lit("")), lit(",")))

  /** One learned merge rule: `pair` is the `"a b"` rule string, `cnt` its
    * winning weighted adjacent-pair count, `rnk` its 1-based learn order.
    */
  final case class MergeRule(rnk: Long, pair: String, cnt: Long)

  /** Run the [[BpeMerges]]-round learning loop over a documents table.
    * Returns (the vocab with all merges applied — word → final symbol
    * sequence — and the learned rules in order). Each round's vocab is
    * persisted (and registered with the harness registry) because round
    * r+1's pair counts and the final tokenize both re-read it.
    *
    * The per-round argmax is a 1-row TakeOrderedAndProject COLLECTED to
    * the driver — the bounded frozen-artifact cut (the probed-list-literal
    * convention: the collect IS the artifact production ships). It is also
    * what keeps the lazy plan LINEAR across rounds: leaving the argmax
    * in-plan as a broadcast join makes vocab_r reference vocab_{r−1}
    * TWICE (the projected side and inside the argmax), doubling the
    * logical tree per round — Catalyst analysis goes exponential in K and
    * a 10-rule learn never reaches execution. BPE learning is inherently
    * sequential in its rules, so the K tiny driver actions are the
    * algorithm's own critical path, not an artifact.
    */
  def learnBpeOn(docs: DataFrame): (DataFrame, Seq[MergeRule]) = {
    var vocab = CacheRegistry.harness.add(bpeVocab0(docs).persist())
    // at most TWO vocab snapshots stay cached at any point: round r's
    // argmax action fills round r−1's cache, after which round r−2's
    // snapshot can never be read again (each round reads only its direct
    // predecessor) — unpersist it eagerly instead of holding K+1
    // Heaps-sized tables until the harness registry drains (bounded at
    // K=10, a genuine cache leak at a realistic 30k-merge K)
    var prev: DataFrame = null
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    for (r <- 1 to BpeMerges) {
      val row = vocab
        .select(col("freq"),
          explode(adjacentPairs(syms(col("seq")))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .head()
      if (prev != null) prev.unpersist()
      prev = vocab
      rules += MergeRule(r.toLong, row.getString(0), row.getLong(1))
      vocab = CacheRegistry.harness.add(
        vocab.select(col("word"), col("freq"),
          applyMerge(col("seq"), lit(row.getString(0))).as("seq"))
          .persist())
    }
    // materialize the final vocab before dropping its predecessor — an
    // unpersisted ancestor chain would otherwise force a full relearn on
    // the caller's first action
    vocab.count()
    if (prev != null) prev.unpersist()
    (vocab, rules.toSeq)
  }

  /** Learn + serve on the PRODUCTION path (r20): one corpus pass builds
    * the Heaps'-law-bounded vocab0 (persisted — it is both the learn
    * input and the serving base), the K merge rounds run DRIVER-LOCALLY
    * over the collected vocabulary ([[learnBpeDriverLocal]]'s documented
    * shape — the vocab is bounded metadata, not data, exactly the
    * probed-list-collect convention), and the serving vocab table is the
    * K-rule fold ([[applyMerges]]) applied map-side over vocab0's initial
    * sequences — the same fold t146 already ships for held-out words.
    *
    * Semantics are EQUAL to [[learnBpeOn]] by construction: the local
    * loop computes the same weighted pair counts and argmax (BpeSpec
    * asserts rule-sequence equality), and folding the K rules in learn
    * order over the initial render IS the incremental application the
    * distributed loop performs round by round (BpeSpec asserts the
    * served vocab table equals the distributed loop's). What changes is
    * the COST: the distributed loop is K sequential driver round-trips
    * (each a tiny argmax job plus a fresh plan + codegen, since the rule
    * literal changes the generated source every round) plus K cache
    * layers — measured 3.5 s warm at sf0.1 against 0.3 s for
    * vocab0-pass + collect + local loop (guide §1.2 step 1: the job
    * floor was the cost, not the argmax itself).
    */
  def learnBpeServed(docs: DataFrame): (DataFrame, Seq[MergeRule]) = {
    val v0 = CacheRegistry.harness.add(bpeVocab0(docs).persist())
    val rules = learnLocalRules(collectVocab(v0), BpeMerges)
    val vocab = v0.select(col("word"), col("freq"),
      applyMerges(col("seq"), rules.map(_.pair)).as("seq"))
    (vocab, rules)
  }

  def learnBpe(s: SparkSession, d: String): (DataFrame, Seq[MergeRule]) =
    learnBpeServed(documents(s, d))

  /** Driver-local merge learning over the COLLECTED vocabulary — the
    * REALISTIC-K production path, and the documented K-scaling decision:
    *
    * [[learnBpeOn]] is the oracle-checkable distributed reference, but
    * its shape assumes small K — at a production vocabulary (30k-100k
    * merges) the learn loop is K sequential Spark jobs (each a cluster
    * round-trip for one argmax over a driver-collectable table) and the
    * K-deep literal-replace serving fold ([[applyMerges]]) exceeds any
    * codegen budget. The honest production shape follows from the
    * two-table design's own premise: merge learning never touches the
    * corpus — only the Heaps'-law-bounded word-frequency vocabulary,
    * which FITS ON THE DRIVER (that bound is precisely why the corpus is
    * touched once to build it). So: collect the vocab once, run the K
    * rounds as in-memory loops with zero per-round job latency, ship the
    * rules as the frozen artifact, and SERVE via the word→sequence vocab
    * table join (t140's path — one corpus equi-join, K-independent),
    * never the K-deep fold. The fold remains the serving path only for
    * out-of-vocabulary words (t146/streaming), which production handles
    * with the same local loop applied batch-side.
    *
    * Semantics are EQUAL to the distributed loop by construction — same
    * weighted adjacent-pair counts, same (count DESC, pair ASC) integer
    * argmax (symbols are ASCII, so Java string order ≡ Spark's UTF8
    * binary order), same leftmost-greedy non-overlapping merge
    * application (the property BpeSpec pins for the literal-replace
    * trick) — and BpeSpec asserts rule-sequence equality against
    * [[learnBpeOn]] at K=[[BpeMerges]]. Each round here is O(vocab); a
    * tuned implementation would maintain the pair→words inverted index
    * and update counts incrementally (Sennrich's reference
    * implementation), an in-memory optimization orthogonal to the
    * distributed design.
    */
  def learnBpeDriverLocal(docs: DataFrame,
      k: Int = BpeMerges): Seq[MergeRule] =
    learnLocalRules(collectVocab(bpeVocab0(docs)), k)

  /** Collect a vocab0 frame to the driver as (symbol sequence, freq)
    * rows — the Heaps'-bounded artifact the local learn loop runs over.
    */
  private def collectVocab(v0: DataFrame): Array[(Vector[String], Long)] =
    v0.select("word", "freq").collect()
      .map(r => (r.getString(0).map(_.toString).toVector :+ "_",
        r.getLong(1)))

  /** The in-memory K-round merge loop over a collected vocabulary — the
    * core of [[learnBpeDriverLocal]], shared with [[learnBpeServed]] so
    * the query path collects vocab0 exactly once.
    */
  private def learnLocalRules(vocab0: Array[(Vector[String], Long)],
      k: Int): Seq[MergeRule] = {
    var vocab = vocab0
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    for (r <- 1 to k) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((sy, f) <- vocab; i <- 0 until sy.length - 1) {
        val p = (sy(i), sy(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      // a small vocabulary can exhaust its adjacent pairs before k rounds
      // (every word fully merged to one symbol) — and this is the path
      // advertised for realistic K, where that is plausible: stop with
      // the rules learned so far instead of reducing an empty collection
      if (counts.isEmpty) return rules.toSeq
      val (pair, cnt) = counts.reduceLeft { (a, b) =>
        val (pa, pb) = (s"${a._1._1} ${a._1._2}", s"${b._1._1} ${b._1._2}")
        if (b._2 > a._2 || (b._2 == a._2 && pb < pa)) b else a
      }
      rules += MergeRule(r.toLong, s"${pair._1} ${pair._2}", cnt)
      vocab = vocab.map { case (sy, f) => (mergeLocal(sy, pair), f) }
    }
    rules.toSeq
  }

  /** Leftmost-greedy non-overlapping single-rule application — the local
    * twin of [[applyMerge]]'s delimiter-replace trick (BpeSpec pins both
    * against the same hazard cases).
    */
  private def mergeLocal(sy: Vector[String],
      p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sy.length) {
      if (i < sy.length - 1 && sy(i) == p._1 && sy(i + 1) == p._2) {
        out += sy(i) + sy(i + 1); i += 2
      } else { out += sy(i); i += 1 }
    }
    out.result()
  }

  /** Merge-rule learning — the t139 query: the [[BpeMerges]] learned rules
    * in order, each with its winning adjacent-pair count. Oracle: the same
    * rounds unrolled as CTE triples (pair counts → argmax → applied vocab).
    */
  def t139BpeLearn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    learnBpe(s, d)._2
      .map(r => (r.rnk, r.pair, r.pair.replace(" ", ""), r.cnt))
      .toDF("rnk", "pair", "merged", "cnt")
      .orderBy("rnk")
  }

  /** Per-doc word/piece table under a frozen word→sequence table — the
    * shared tail of t140/t141 (vocab from the learning loop), t146
    * (held-out vocab built by the rule fold), and the streaming tokenizer:
    * posexploded words joined to `tok` (alpha words get their merged
    * symbol sequence and token count; anything else is one opaque token).
    */
  private[graft] def piecesOver(docs: DataFrame, tok: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextOps.words(col("text"))).as(Seq("pos", "word")))
      .join(tok, Seq("word"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("seq").isNotNull, col("seq"))
          .otherwise(concat(lit(" "), col("word"), lit(","))).as("piece"),
        coalesce(col("n_toks"), lit(1L)).as("n_toks"),
        col("seq").isNotNull.as("alpha"))

  /** Per-doc token accounting over a piece table — t140's output shape,
    * shared with t146 and the streaming tokenizer: word / alpha / BPE
    * token counts plus the md5 fingerprint of the document-order rendered
    * token stream.
    */
  private[graft] def docSummary(pieces: DataFrame): DataFrame =
    pieces
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("alpha"), lit(1L)).otherwise(lit(0L))).as("n_alpha"),
        sum("n_toks").as("n_bpe_tokens"),
        array_sort(collect_list(struct(col("pos"), col("piece")))).as("ps"))
      .select(col("doc_id"), col("n_words"), col("n_alpha"),
        col("n_bpe_tokens"),
        md5(array_join(transform(col("ps"), x => x.getField("piece")), ""))
          .as("fp"))

  private def bpePieces(s: SparkSession, d: String): DataFrame = {
    val (vocab, _) = learnBpe(s, d)
    val tok = vocab.select(col("word"), col("seq"),
      size(syms(col("seq"))).cast("long").as("n_toks"))
    piecesOver(documents(s, d), tok)
  }

  /** Corpus tokenization under the frozen merges — the t140 query: per
    * doc, the word count, BPE token count, alpha-word count, and an md5
    * fingerprint of the full rendered token stream in document order (the
    * t23-fingerprint convention — equality of streams, not just counts).
    *
    * Scale: the only corpus-sized work is the posexplode + ONE equi-join
    * to the vocab table on `word` (broadcastable while the vocab fits,
    * shuffle-on-word beyond — either way O(corpus), never O(corpus ×
    * rules)); the per-doc assembly is a partial-aggregated groupBy whose
    * collect_list holds one doc's pieces, never a corpus window.
    */
  def t140BpeTokenize(s: SparkSession, d: String): DataFrame =
    docSummary(bpePieces(s, d)).orderBy("doc_id")

  /** Sequence packing over BPE token counts — the t141 query: t69's
    * sharded greedy packing (hash-sharded independent token streams, so
    * the cumulative window partitions by shard and parallelizes to any
    * executor count) with the budget consumed in LEARNED-subword tokens
    * instead of whitespace words — the accounting a real context-window
    * builder runs. Shard rule, budget, and window shape are t69's exactly,
    * so the two queries differ only in the token measure.
    */
  def t141BpePack(s: SparkSession, d: String): DataFrame = {
    val toks = bpePieces(s, d)
      .groupBy("doc_id")
      .agg(sum("n_toks").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(16L)))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("start_tok") / PackBudget.toDouble).cast("long")
          .as("pack_id"),
        (col("start_tok") % PackBudget).as("pack_offset"))
      .orderBy("doc_id")
  }

  /** Apply the K frozen merge rules in learn order as a FOLD of literal
    * replaces — one map-side projection, no joins, no shuffles. This is
    * the serving form of the frozen artifact: t140's vocab table is a
    * cache of exactly this fold over the training words, and any word the
    * vocab has never seen (a held-out split, a streaming micro-batch)
    * tokenizes by running the fold directly. K is small and frozen, so
    * the K-deep expression stays inside whole-stage codegen.
    */
  private[graft] def applyMerges(seq: Column, pairs: Seq[String]): Column =
    pairs.foldLeft(seq)((c, p) => applyMerge(c, lit(p)))

  /** The word→(seq, n_toks) table for an arbitrary docs batch under the
    * frozen rules: distinct alpha words, rendered and rule-folded. Shared
    * by t146 (held-out split) and the streaming tokenizer.
    */
  private[graft] def tokTableFor(docs: DataFrame,
      pairs: Seq[String]): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .distinct()
      .withColumn("seq", applyMerges(render(col("word")), pairs))
      .select(col("word"), col("seq"),
        size(syms(col("seq"))).cast("long").as("n_toks"))

  /** Held-out tokenization under train-learned merges — the t146 query,
    * the generalization test every production tokenizer runs: rules are
    * learned on a TRAINING split (docs with `doc_id % 10 ≠ 9`) and then
    * applied to the HELD-OUT split (`doc_id % 10 = 9`), whose words the
    * learning loop never saw. t140 cannot exercise this path — its vocab
    * covers the whole corpus by construction; here the held-out word set
    * is tokenized by [[applyMerges]], the rule fold production ships to
    * tokenize ANY later batch (the streaming tokenizer reuses it
    * verbatim).
    *
    * Scale: learning touches only the train vocab (the t139 story); the
    * held-out side is one distinct-word aggregation (Heaps'-law small), a
    * K-deep map-side fold over it, and ONE equi-join of the held-out
    * corpus words to that table — O(batch), zero recompute of the frozen
    * rules. Oracle: the same train-split learning CTEs, the same K
    * replace stages over the held-out word set.
    */
  def t146BpeHeldout(s: SparkSession, d: String): DataFrame = {
    val train = documents(s, d).filter(col("doc_id") % 10 =!= 9)
    val held = CacheRegistry.harness.add(
      documents(s, d).filter(col("doc_id") % 10 === 9).persist())
    // rules only (no train vocab table is served here), so the cheap
    // local learn applies directly — see [[learnBpeServed]]
    val rules = learnBpeDriverLocal(train)
    val tok = tokTableFor(held, rules.map(_.pair))
    docSummary(piecesOver(held, tok)).orderBy("doc_id")
  }

  /** Token-budget chunking under the frozen merges — the t147 query, the
    * boundary every retrieval/RAG indexer and pretraining sequence builder
    * actually cuts on: each document's word stream is split into chunks of
    * at most [[ChunkBudget]] BPE tokens (a word lands in the chunk where
    * its first token STARTS, so chunk k covers start offsets
    * `[k·B, (k+1)·B)` — a word overhanging the boundary stays whole, the
    * no-mid-word-split rule). Per (doc, chunk): word/token counts, the
    * 1-based word-position span, and the md5 fingerprint of the chunk's
    * rendered token stream (the t23/t140 stream-equality convention).
    *
    * Scale: the corpus-sized work is t140's (posexplode + one vocab
    * equi-join); the cumulative-offset window partitions BY DOC — each
    * doc's stream is independent, so the chunker parallelizes to any
    * executor count with no global ordering anywhere (the t69-shard
    * lesson, already per-doc here by the problem's own shape). Chunk
    * assembly is a partial-aggregated groupBy holding one chunk's pieces.
    * Integer-only arithmetic — offsets and budgets are BIGINTs.
    */
  def t147BpeChunk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bpePieces(s, d)
      .withColumn("start_tok", sum("n_toks").over(w) - col("n_toks"))
      .withColumn("chunk_id",
        floor(col("start_tok") / ChunkBudget.toDouble).cast("long"))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_toks").as("n_tokens"),
        (min("pos") + 1).cast("long").as("first_pos"),
        (max("pos") + 1).cast("long").as("last_pos"),
        array_sort(collect_list(struct(col("pos"), col("piece")))).as("ps"))
      .select(col("doc_id"), col("chunk_id"), col("n_words"),
        col("n_tokens"), col("first_pos"), col("last_pos"),
        md5(array_join(transform(col("ps"), x => x.getField("piece")), ""))
          .as("fp"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Tokenizer efficiency by source — the t148 query: per-domain
    * compression and fertility of the learned tokenizer (chars per BPE
    * token, BPE tokens per word), the metric a pipeline watches to catch a
    * vocabulary that under-serves a domain (code vs prose vs a new crawl
    * slice). Ratios are integer-quantized permille ((sum·1000) div denom —
    * the t71 idf_q convention), so the whole query is BIGINT-exact.
    *
    * Scale: t140's corpus pass, one broadcastable doc_id join to the
    * documents dimension columns, and a partial-aggregated groupBy on the
    * low-cardinality source key.
    */
  def t148BpeEfficiency(s: SparkSession, d: String): DataFrame =
    documents(s, d).select("doc_id", "source", "n_chars")
      .join(docSummary(bpePieces(s, d))
        .select("doc_id", "n_words", "n_bpe_tokens"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("n_bpe_tokens").as("sum_toks"),
        sum("n_words").as("sum_words"))
      .withColumn("chars_per_tok_q", expr("(sum_chars * 1000) div sum_toks"))
      .withColumn("toks_per_word_q", expr("(sum_toks * 1000) div sum_words"))
      .orderBy("source")
}
