package graft

import graft.ops.{TextOps, VectorOps}

/** Programmatically-generated DuckDB oracle SQL for the ops whose SQL is
  * repetitive (k minhashes, 32 simhash bits, LSH plane literals). Kept in
  * lockstep with the Spark implementations in graft.ops.
  */
object OracleGen {

  /** The 3-gram shingle CTE chain over an arbitrary (doc_id, text)
    * source — `documents` everywhere except the d131 update oracle,
    * which shingles the REVISED corpus. One definition, so the shingle
    * universe cannot drift between the one-shot and update twins.
    */
  private def shingleCteOn(src: String): String =
    s"""w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM $src
         WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
       sh0 AS (
         SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS sh
         FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
       sh AS (SELECT DISTINCT doc_id, sh FROM sh0)"""

  private val shingleCte = "WITH " + shingleCteOn("documents")

  /** The capped-Jaccard CTE chain (rare/shc/sizes/inter — assumes the
    * `sh` CTE is already in scope): ONE definition of the capped shingle
    * universe shared by [[ngramJaccard]] and [[lshRecall]], mirroring the
    * Spark-side `cappedJaccardInter` factoring so the d25 ranking and the
    * d95 ground truth can never drift apart.
    */
  private val cappedJaccardCtes: String =
    s"""rare AS (SELECT sh FROM sh GROUP BY sh
                HAVING count(*) <= ${graft.ops.TextOps.ShingleDfCap}),
       shc AS (SELECT sh.doc_id, sh.sh FROM sh JOIN rare USING (sh)),
       sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY 1, 2)"""

  /** The minhash signature + LSH band CTE chain (sigs/bands — assumes
    * `sh`): one definition of the signature constants and the band-key
    * format, shared by [[minhashLsh]] and [[lshRecall]].
    */
  private val sigBandCtes: String = {
    val P = graft.ops.TextOps.MinhashP
    val sigExprs = (0 until 16).map { i =>
      val a = graft.ops.TextOps.minhashA(i)
      val b = graft.ops.TextOps.minhashB(i)
      s"min(($a * ('0x' || substr(md5(sh), 1, 12))::BIGINT + $b) % $P) AS s$i"
    }.mkString(",\n         ")
    val bandSelects = (0 until 4).map { b =>
      val key = (0 until 4).map(r => s"s${b * 4 + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM sigs"
    }.mkString("\n         UNION ALL ")
    s"""sigs AS (
         SELECT doc_id,
         $sigExprs
         FROM sh GROUP BY doc_id),
       bands AS (
         $bandSelects)"""
  }

  val ngramJaccard: String =
    s"""$shingleCte,
       $cappedJaccardCtes
     SELECT d1, d2, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
     FROM inter
     JOIN sizes sa ON sa.doc_id = d1
     JOIN sizes sb ON sb.doc_id = d2
     ORDER BY jaccard DESC, d1, d2 LIMIT 20"""

  val minhashLsh: String =
    s"""$shingleCte,
       $sigBandCtes
     SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
     FROM bands a
     JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
       AND a.doc_id < b.doc_id
     GROUP BY 1, 2 ORDER BY d1, d2"""

  /** n-gram repetition CTE block for n = 2, 3, 4 — shared by gopherFilter,
    * ngramRepetition, and cleanPipeline so thresholds and tie-breaks stay in
    * lockstep with [[graft.ops.TextOps]]. Requires a prior CTE
    * `gw(doc_id, ws)` carrying the word array; emits, per n,
    * `topN(doc_id, topN_cnt, topN_chars)` (most frequent n-gram; ties break
    * to the lexicographically smallest, matching the Spark sorted-array
    * scan) and `dupN(doc_id, dupN_chars)` (chars in n-grams occurring ≥ 2
    * times). Every aggregate is CAST to BIGINT — DuckDB widens sums (and
    * windowed sums) of BIGINT to HUGEINT, which poisons the driver's
    * type-sensitive hash (the t69 lesson).
    */
  private val ngramCtes: String = (2 to 4).map { n =>
    s"""g$n AS (
         SELECT doc_id, unnest(list_transform(range(1, len(ws) - $n + 2),
           i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS gram
         FROM gw
         WHERE len(ws) <= 100000),
       c$n AS (
         SELECT doc_id, gram, count(*) AS cnt,
           length(gram) - ${n - 1} AS glen
         FROM g$n GROUP BY doc_id, gram),
       top$n AS (
         SELECT doc_id, CAST(cnt AS BIGINT) AS top${n}_cnt,
           CAST(cnt * glen AS BIGINT) AS top${n}_chars
         FROM c$n
         QUALIFY row_number() OVER (PARTITION BY doc_id
           ORDER BY cnt DESC, gram) = 1),
       dup$n AS (
         SELECT doc_id,
           CAST(COALESCE(sum(cnt * glen) FILTER (WHERE cnt >= 2), 0)
             AS BIGINT) AS dup${n}_chars
         FROM c$n GROUP BY doc_id)"""
  }.mkString(",\n       ")

  private val gwCte: String =
    """gw AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
         FROM documents)"""

  /** Line-level Gopher metrics over an arbitrary text expression — DuckDB
    * twin of [[graft.ops.TextOps.lineMetrics]]: newline split, bullet-start
    * / ellipsis-end line counts, alpha-word count over the shared
    * whitespace tokenizer, '#' and '...' symbol counts. Kept as a
    * SELECT-column template so both the raw-text (t59/t65) and payload
    * (t81) variants stay in lockstep with the Scala source of truth.
    */
  private def lineMetricCols(text: String): String =
    s"""CAST(len(str_split($text, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(list_filter(str_split($text, chr(10)),
             l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))
             AS BIGINT) AS bullet_lines,
           CAST(len(list_filter(str_split($text, chr(10)),
             l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
             AS BIGINT) AS ellipsis_lines,
           CAST(len(list_filter(string_split_regex(trim(lower($text)), '\\s+'),
             w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_words,
           CAST(length($text) - length(regexp_replace($text, '#', '', 'g'))
             AS BIGINT) AS n_hash,
           CAST(len(regexp_extract_all($text, '\\.\\.\\.|…')) AS BIGINT)
             AS n_ellipsis"""

  /** The line-rule conjunction terms (integer-compare forms of ≤90% bullet
    * lines, ≤30% ellipsis lines, ≥80% alpha words, ≤0.10 symbol-to-word).
    */
  private val lineRuleConj: String =
    """bullet_lines * 10 <= n_lines * 9
             AND ellipsis_lines * 10 <= n_lines * 3
             AND alpha_words * 5 >= n_words * 4
             AND n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words"""

  /** Gopher composite filter (t59) with the published top-2/3/4-gram
    * character-fraction caps folded into the conjunction (integer-compare
    * forms: 0.20 = 1/5, 0.18 = 9/50, 0.16 = 4/25).
    */
  val gopherFilter: String = {
    val conj =
      s"""(n_words >= 15 AND n_words <= 100000)
             AND (n_alpha >= n_words * 3 AND n_alpha <= n_words * 10)
             AND n_stop >= 1 AND top_cnt * 5 <= n_words
             AND COALESCE(top2_chars, 0) * 5 <= n_alpha
             AND COALESCE(top3_chars, 0) * 50 <= n_alpha * 9
             AND COALESCE(top4_chars, 0) * 25 <= n_alpha * 4
             AND $lineRuleConj"""
    s"""WITH $gwCte,
       $ngramCtes,
       lm AS (
           SELECT doc_id,
           ${lineMetricCols("text")}
           FROM documents),
       m AS (
           SELECT doc_id,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_words,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
               AS n_alpha,
             CAST(len(regexp_extract_all(lower(text),
               '\\b(the|a|of|and|to|in|is)\\b')) AS BIGINT) AS n_stop,
             (SELECT CAST(max(c) AS BIGINT) FROM (
                SELECT count(*) AS c
                FROM unnest(string_split_regex(trim(lower(text)), '\\s+'))
                  AS t(word)
                GROUP BY word) q) AS top_cnt
           FROM documents)
         SELECT m.doc_id, n_words, n_alpha, n_stop, top_cnt,
           COALESCE(top2_chars, 0) AS top2g_chars,
           COALESCE(top3_chars, 0) AS top3g_chars,
           COALESCE(top4_chars, 0) AS top4g_chars,
           n_lines, bullet_lines, ellipsis_lines, alpha_words, n_hash,
           n_ellipsis,
           n_words >= 15 AND n_words <= 100000 AS rule_wc,
           n_alpha >= n_words * 3 AND n_alpha <= n_words * 10 AS rule_mwl,
           n_stop >= 1 AS rule_stop,
           top_cnt * 5 <= n_words AS rule_rep,
           COALESCE(top2_chars, 0) * 5 <= n_alpha AS rule_2g,
           COALESCE(top3_chars, 0) * 50 <= n_alpha * 9 AS rule_3g,
           COALESCE(top4_chars, 0) * 25 <= n_alpha * 4 AS rule_4g,
           bullet_lines * 10 <= n_lines * 9 AS rule_bullet,
           ellipsis_lines * 10 <= n_lines * 3 AS rule_ellipsis,
           alpha_words * 5 >= n_words * 4 AS rule_alpha,
           n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words
             AS rule_symbol,
           $conj AS keep
         FROM m
         JOIN lm ON lm.doc_id = m.doc_id
         LEFT JOIN top2 ON top2.doc_id = m.doc_id
         LEFT JOIN top3 ON top3.doc_id = m.doc_id
         LEFT JOIN top4 ON top4.doc_id = m.doc_id
         ORDER BY m.doc_id"""
  }

  /** Lined payload CTE — DuckDB twin of [[graft.ops.TextOps.linedLines]]
    * (d85/t86): 10-word chunks of the doc's own words plus doc_id-keyed
    * boilerplate lines. Term-by-term lockstep with the Scala source.
    */
  private val linedCte: String =
    """lined AS (
         SELECT doc_id, list_concat(
           list_transform(
             generate_series(1, CAST(ceil(len(ws) / 10.0) AS BIGINT)),
             c -> array_to_string(
               list_slice(ws, (c-1)*10 + 1, (c-1)*10 + 10), ' ')
               || CASE WHEN (doc_id + c) % 2 = 0 THEN '.' ELSE '' END),
           list_filter([
             CASE WHEN doc_id % 3 = 0
               THEN 'subscribe to our newsletter today.' END,
             CASE WHEN doc_id % 4 = 0 THEN 'all rights reserved' END,
             CASE WHEN doc_id % 5 = 0
               THEN 'click here to read more articles.' END,
             CASE WHEN doc_id % 7 = 0
               THEN 'function() { return javascript; }' END,
             CASE WHEN doc_id % 13 = 0
               THEN 'lorem ipsum dolor sit amet.' END],
             x -> x IS NOT NULL)) AS lns
         FROM (SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
               FROM documents))"""

  /** C4 corpus-wide line dedup + reassembly (d85): first occurrence by
    * (doc_id, pos) wins per distinct line; surviving lines re-join in
    * original order.
    */
  val lineDedup: String =
    s"""WITH $linedCte,
       l AS (
         SELECT doc_id, unnest(list_transform(generate_series(1, len(lns)),
           i -> {'pos': i, 'line': lns[i]})) AS pl
         FROM lined),
       k AS (
         SELECT doc_id, pl.pos AS pos, pl.line AS line,
           row_number() OVER (PARTITION BY pl.line
             ORDER BY doc_id, pl.pos) AS rk
         FROM l),
       r AS (
         SELECT doc_id, count(*) AS n_kept,
           string_agg(line, chr(10) ORDER BY pos) AS text_kept
         FROM k WHERE rk = 1 GROUP BY doc_id)
       SELECT lined.doc_id, CAST(len(lns) AS BIGINT) AS n_lines,
         CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
         COALESCE(text_kept, '') AS text_kept
       FROM lined LEFT JOIN r ON r.doc_id = lined.doc_id
       ORDER BY lined.doc_id"""

  /** C4 line/page heuristics (t86) over the lined payload. */
  val c4Rules: String =
    s"""WITH $linedCte,
       m AS (
         SELECT doc_id, CAST(len(lns) AS BIGINT) AS n_lines,
           CAST(len(list_filter(lns, l ->
             substr(l, -1, 1) IN ('.', '!', '?', '"')
             AND len(string_split(l, ' ')) >= 5
             AND NOT contains(l, 'javascript'))) AS BIGINT) AS n_kept,
           len(list_filter(lns, l -> contains(l, 'lorem ipsum'))) > 0
             AS has_lorem,
           len(list_filter(lns, l -> contains(l, '{'))) > 0 AS has_brace
         FROM lined)
       SELECT doc_id, n_lines, n_kept, has_lorem, has_brace,
         n_kept >= 3 AND NOT has_lorem AND NOT has_brace AS keep
       FROM m ORDER BY doc_id"""

  /** Exact duplicated-substring stats (t87): stride-1 20-token windows,
    * cross-document iff min(doc_id) <> max(doc_id) over the window text,
    * runs merged gaps-and-islands. Mirrors
    * [[graft.ops.TextOps.exactSubstringStats]] term by term: truncated
    * (not rounded) fraction, integer-exact keep, docs under 20 words kept
    * with zero windows (generate_series(1, n<=0) is empty in DuckDB while
    * Spark's sequence would count DOWN — both engines filter >= 20 before
    * windowing).
    */
  val exactSubstring: String =
    """WITH w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
         FROM documents),
       wf AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 20),
       win AS (
         SELECT doc_id, i AS pos, array_to_string(ws[i:i+19], ' ') AS wtext
         FROM wf, unnest(generate_series(1, len(ws) - 19)) AS t(i)),
       dup AS (
         SELECT wtext FROM win GROUP BY wtext
         HAVING min(doc_id) <> max(doc_id)),
       dp AS (
         SELECT doc_id, pos FROM win
         WHERE wtext IN (SELECT wtext FROM dup)),
       runs AS (
         SELECT doc_id,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
         FROM dp),
       rl AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS rl
         FROM runs GROUP BY doc_id, g),
       st AS (
         SELECT doc_id, CAST(sum(rl) AS BIGINT) AS n_dup,
           max(rl) AS max_rl
         FROM rl GROUP BY doc_id)
       SELECT w.doc_id,
         CAST(greatest(len(w.ws) - 19, 0) AS BIGINT) AS n_windows,
         COALESCE(st.n_dup, 0) AS n_dup_windows,
         CASE WHEN len(w.ws) <= 19 THEN 0.0
              ELSE floor(COALESCE(st.n_dup, 0) * 1e4 / (len(w.ws) - 19))
                / 1e4 END AS dup_window_frac,
         COALESCE(st.max_rl + 19, 0) AS longest_dup_span,
         COALESCE(st.n_dup, 0) * 2 <= greatest(len(w.ws) - 19, 0) AS keep
       FROM w LEFT JOIN st USING (doc_id)
       ORDER BY doc_id"""

  /** Exact duplicated-substring removal + reassembly (d89) matching
    * [[graft.ops.TextOps.substringRemoval]]: corpus-wide first occurrence
    * of each cross-document 20-token window (by (doc_id, pos)) keeps its
    * tokens, every other occurrence removes its 20 covered positions,
    * surviving tokens re-join in order. The oracle ranks occurrences with
    * a window (fine at oracle scale); the Spark side's min(struct) picks
    * the identical first occurrence.
    */
  val substringRemoval: String =
    """WITH w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
         FROM documents),
       wf AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 20),
       win AS (
         SELECT doc_id, i AS pos, array_to_string(ws[i:i+19], ' ') AS wtext
         FROM wf, unnest(generate_series(1, len(ws) - 19)) AS t(i)),
       dup AS (
         SELECT wtext FROM win GROUP BY wtext
         HAVING min(doc_id) <> max(doc_id)),
       dp AS (
         SELECT doc_id, pos, wtext FROM win
         WHERE wtext IN (SELECT wtext FROM dup)),
       rem AS (
         SELECT doc_id, pos FROM (
           SELECT doc_id, pos, row_number() OVER (PARTITION BY wtext
             ORDER BY doc_id, pos) AS rk
           FROM dp)
         WHERE rk > 1),
       cov AS (
         SELECT doc_id,
           list_sort(list_distinct(flatten(
             list(generate_series(pos, pos + 19))))) AS cv
         FROM rem GROUP BY doc_id)
       SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens,
         CAST(COALESCE(len(cov.cv), 0) AS BIGINT) AS n_removed,
         COALESCE(array_to_string(list_transform(
           list_filter(generate_series(1, len(w.ws)),
             i -> NOT list_contains(COALESCE(cov.cv, []), i)),
           i -> w.ws[i]), ' '), '') AS text_kept
       FROM w LEFT JOIN cov ON cov.doc_id = w.doc_id
       ORDER BY w.doc_id"""

  /** Deterministic shuffle-shard (t88): h48(seed:doc_id) order keys,
    * modulo sharding, rank within shard — mirrors
    * [[graft.ops.TextOps.t88ShuffleShard]] (seed and shard count are the
    * Spark side's constants; h48 is the shared '0x'||md5-prefix cast).
    */
  val shuffleShard: String =
    """WITH a AS (
         SELECT doc_id,
           ('0x' || substr(md5('graft-shuffle-42:'
             || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS order_key
         FROM documents),
       b AS (
         SELECT doc_id, order_key,
           CAST(order_key % 8 AS INTEGER) AS shard
         FROM a)
       SELECT doc_id, order_key, shard,
         CAST(row_number() OVER (PARTITION BY shard
           ORDER BY order_key, doc_id) AS BIGINT) AS ord
       FROM b ORDER BY shard, ord"""

  /** LSH recall/precision vs exact-Jaccard ground truth (d95) matching
    * [[graft.ops.TextOps.d95LshRecall]]: truth = capped-shingle pairs with
    * 2·inter ≥ union (integer-exact Jaccard ≥ 1/2), candidates = the d26
    * band pairs, counts cumulated per shared-band threshold with
    * integer-quantized ratios. Composes the d25 and d26 oracle CTEs.
    */
  /** Containment near-dup pairs (d97) matching
    * [[graft.ops.TextOps.d97Containment]] — the shared capped-Jaccard CTEs
    * with the integer-exact 5·inter ≥ 4·min(sz) containment filter.
    */
  val containment: String =
    s"""$shingleCte,
       $cappedJaccardCtes
     SELECT d1, d2, i AS inter, sa.sz AS sz1, sb.sz AS sz2,
       (i * 10000) // least(sa.sz, sb.sz) AS containment_q,
       CASE WHEN sa.sz <= sb.sz THEN d1 ELSE d2 END AS contained_doc
     FROM inter
     JOIN sizes sa ON sa.doc_id = d1
     JOIN sizes sb ON sb.doc_id = d2
     WHERE 5 * i >= 4 * least(sa.sz, sb.sz)
     ORDER BY d1, d2"""

  val lshRecall: String = {
    s"""$shingleCte,
       $cappedJaccardCtes,
       truth AS (
         SELECT d1, d2 FROM inter
         JOIN sizes sa ON sa.doc_id = d1
         JOIN sizes sb ON sb.doc_id = d2
         WHERE 2 * i >= sa.sz + sb.sz - i),
       tn AS (SELECT count(*) AS n_truth FROM truth),
       $sigBandCtes,
       cand AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
         FROM bands a
         JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
           AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       tagged AS (
         SELECT c.d1, c.d2, c.n_bands,
           CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END AS is_true
         FROM cand c LEFT JOIN truth t ON t.d1 = c.d1 AND t.d2 = c.d2),
       cum AS (
         SELECT th.b AS band_threshold,
           count(g.d1) AS n_cand,
           CAST(COALESCE(sum(g.is_true), 0) AS BIGINT) AS n_true
         FROM (VALUES (1), (2), (3), (4)) th(b)
         LEFT JOIN tagged g ON g.n_bands >= th.b
         GROUP BY th.b)
     SELECT CAST(c.band_threshold AS INTEGER) AS band_threshold,
       c.n_cand, c.n_true, tn.n_truth,
       CASE WHEN tn.n_truth = 0 THEN 0
            ELSE (c.n_true * 10000) // tn.n_truth END AS recall_q,
       CASE WHEN c.n_cand = 0 THEN 0
            ELSE (c.n_true * 10000) // c.n_cand END AS prec_q
     FROM cum c CROSS JOIN tn ORDER BY band_threshold"""
  }

  /** URL canonicalization + first-per-canonical-URL dedup (d93) matching
    * [[graft.ops.TextOps.d93UrlDedup]] — the same deterministic synthetic
    * URL build and the same ordered regexp chain. DuckDB's regexp_replace
    * is first-match-only by default, Spark's replaces all; every pattern
    * here matches at most once per URL by construction, and the 'g' flag
    * is passed anyway so the engines agree on arbitrary input.
    */
  /** Synthetic URL build + canonicalization chain (u/c CTEs) — ONE
    * definition shared by [[urlDedup]] and [[blocklistFilter]] (and the
    * d99 incremental-URL oracle, which reuses [[urlDedup]] whole), so the
    * URL twins can never drift from the Spark-side
    * syntheticUrl/canonicalizeUrl pair.
    */
  private val urlCanonCtes: String =
    """u AS (
         SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
           (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
           (CASE WHEN doc_id % 17 = 0 THEN upper(source) ELSE source END) ||
           '.example.com/a/' || CAST(doc_id % 50 AS VARCHAR) ||
           (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
           (CASE WHEN doc_id % 13 = 0 THEN '?page=2' ELSE '' END) ||
           (CASE WHEN doc_id % 5 = 0 THEN
              (CASE WHEN doc_id % 13 = 0 THEN '&utm_source=feed'
                    ELSE '?utm_source=feed' END)
            ELSE '' END) ||
           (CASE WHEN doc_id % 11 = 0 THEN '#section-3' ELSE '' END) AS url
         FROM documents),
       c AS (
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(lower(url),
             '^https?://', '', 'g'),
             '^www\.', '', 'g'),
             '#.*$', '', 'g'),
             '([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
             '\?&+', '?', 'g'),
             '&&+', '&', 'g'),
             '[?&]+$', '', 'g'),
             '/\?', '?', 'g'),
             '/$', '', 'g') AS canon_url
         FROM u)"""

  val urlDedup: String =
    s"""WITH $urlCanonCtes,
       g AS (SELECT canon_url, min(doc_id) AS keeper_id,
               count(*) AS n_docs
             FROM c GROUP BY canon_url)
     SELECT c.doc_id, c.canon_url, g.n_docs,
       c.doc_id = g.keeper_id AS keeper
     FROM c JOIN g USING (canon_url) ORDER BY c.doc_id"""

  /** Tombstone-delete dedup (d123) matching
    * [[graft.ops.TextOps.d123TombstoneDedup]]: the one-shot keeper verdict
    * over the SURVIVING corpus (doc_id % 7 <> 3) for both group keys —
    * the healed incremental state must be indistinguishable from never
    * having ingested the deleted docs. Null-text fingerprints join
    * null-safely (IS NOT DISTINCT FROM), mirroring the Spark `<=>`.
    */
  val tombstoneDedup: String =
    s"""WITH $urlCanonCtes,
       live AS (
         SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fp
         FROM documents WHERE doc_id % 7 <> 3),
       fk AS (SELECT fp, min(doc_id) AS tkeeper FROM live GROUP BY fp),
       cu AS (SELECT doc_id, canon_url FROM c WHERE doc_id % 7 <> 3),
       uk AS (SELECT canon_url, min(doc_id) AS ukeeper
              FROM cu GROUP BY canon_url)
     SELECT live.doc_id,
       live.doc_id = fk.tkeeper AS keep_text,
       cu.doc_id = uk.ukeeper AS keep_url,
       (live.doc_id = fk.tkeeper AND cu.doc_id = uk.ukeeper) AS kept
     FROM live
     JOIN fk ON live.fp IS NOT DISTINCT FROM fk.fp
     JOIN cu ON cu.doc_id = live.doc_id
     JOIN uk USING (canon_url)
     ORDER BY live.doc_id"""

  /** Update-as-delete+reingest (d131) matching
    * [[graft.ops.TextOps.d131UpdateReingest]]: the one-shot verdicts over
    * the UPDATED corpus (docs with doc_id % 5 = 2 carry revised text) —
    * the healed+re-ingested keeper and pair states must be
    * indistinguishable from a corpus that always had the revisions.
    * `kept_text` is the min-doc_id keeper verdict per exact-text
    * fingerprint group; `n_pairs` counts the minhash candidate pairs the
    * doc participates in. Null-text docs keep null fps (grouped
    * null-safely) and drop out of the shingle universe — both exactly as
    * the original-corpus twins do.
    */
  val updateReingest: String =
    s"""WITH docs2 AS (
         SELECT doc_id,
           CASE WHEN doc_id % 5 = 2
                THEN text || ' u' || CAST(doc_id % 3 AS VARCHAR)
                ELSE text END AS text
         FROM documents),
       ${shingleCteOn("docs2")},
       $sigBandCtes,
       mp AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a
         JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
           AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       np AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs FROM (
           SELECT d1 AS doc_id FROM mp
           UNION ALL SELECT d2 AS doc_id FROM mp) u
         GROUP BY doc_id),
       f AS (
         SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fp
         FROM docs2),
       fk AS (SELECT fp, min(doc_id) AS keeper FROM f GROUP BY fp)
     SELECT f.doc_id, f.doc_id = fk.keeper AS kept_text,
       COALESCE(np.n_pairs, 0) AS n_pairs
     FROM f
     JOIN fk ON f.fp IS NOT DISTINCT FROM fk.fp
     LEFT JOIN np USING (doc_id)
     ORDER BY f.doc_id"""

  /** C4 blocklist page filter (t99) matching
    * [[graft.ops.TextOps.t99BlocklistFilter]]: blocked-token count,
    * canonical-domain block verdict, and the page gate composed with
    * t86's C4 rules. The word and domain lists render from the SAME
    * Scala Seqs the Spark query and streaming gate read
    * ([[graft.ops.TextOps.BlockedWords]]/[[graft.ops.TextOps.BlockedDomains]]).
    */
  val blocklistFilter: String = {
    val badList = graft.ops.TextOps.BlockedWords
      .map(w => s"'$w'").mkString(", ")
    val domList = graft.ops.TextOps.BlockedDomains
      .map(w => s"'$w'").mkString(", ")
    s"""WITH $urlCanonCtes,
       $linedCte,
       toks AS (SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
         FROM documents),
       nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bad
         FROM toks WHERE w IN ($badList) GROUP BY doc_id),
       pg AS (SELECT doc_id,
           CAST(len(list_filter(lns, l ->
             substr(l, -1, 1) IN ('.', '!', '?', '"')
             AND len(string_split(l, ' ')) >= 5
             AND NOT contains(l, 'javascript'))) AS BIGINT) >= 3
           AND len(list_filter(lns, l -> contains(l, 'lorem ipsum'))) = 0
           AND len(list_filter(lns, l -> contains(l, '{'))) = 0
             AS page_keep
         FROM lined),
       dom AS (SELECT doc_id,
           regexp_extract(canon_url, '^[^/?]+', 0) AS domain
         FROM c)
     SELECT d.doc_id, coalesce(nb.n_bad, 0) AS n_bad, dom.domain,
       dom.domain IN ($domList) AS domain_blocked,
       (coalesce(nb.n_bad, 0) = 0 AND dom.domain NOT IN ($domList))
         AS keep_blocklist,
       (pg.page_keep AND coalesce(nb.n_bad, 0) = 0
         AND dom.domain NOT IN ($domList)) AS keep_page
     FROM documents d
     JOIN dom USING (doc_id)
     JOIN pg USING (doc_id)
     LEFT JOIN nb USING (doc_id)
     ORDER BY d.doc_id"""
  }

  /** Brute-force Hamming≤3 pair tail over an `ah(doc_id, ahash)` CTE —
    * shared by the d98 and d102 oracles (ground truth is all-pairs, so
    * the Spark side's bucketing recall is checked, not assumed).
    */
  private val hammingPairTail: String =
    """SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
     FROM ah a JOIN ah b ON a.doc_id < b.doc_id
     WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
     ORDER BY d1, d2"""

  /** Signed-64 power term for bit index `bitExpr` — bit 63 is written as
    * (-9223372036854775807 - 1) so summing distinct powers reproduces the
    * Java `1L << 63` bit pattern without overflowing DuckDB's BIGINT
    * (distinct powers of two never carry).
    */
  private def bitPowerTerm(bitExpr: String): String =
    s"""CASE WHEN $bitExpr = 63 THEN -9223372036854775807 - 1
            ELSE (1::BIGINT << ($bitExpr)) END"""

  /** Image perceptual-hash near-dup (d98) matching
    * [[graft.multimodal.Multimodal.d98ImageNearDup]]: the aHash is
    * recomputed ANALYTICALLY from the deterministic pixel-generator
    * contract (`imageGenParams`: class-keyed 24-bit md5 base, 3-bit
    * perturbation, class-keyed dims; pixel = base XOR (x·31+y), masked to
    * 24 bits) — the Spark side decodes REAL PNG bytes, the oracle
    * re-derives the same pixels in SQL, and the two must agree bit for
    * bit because every step is integer arithmetic (grayscale = r+g+b,
    * bit = blockSum·64 > totalSum with equal-size blocks). Ground truth
    * is the BRUTE-FORCE all-pairs Hamming scan, so the rotated-prefix
    * bucketing's exact-recall claim is oracle-checked, not assumed.
    * Bit 63's power term is written as (-9223372036854775807 - 1) + the
    * positive powers: distinct powers of two never carry, so the signed
    * 64-bit sum reproduces the Java `1L << 63` bit pattern without
    * overflowing DuckDB's BIGINT.
    */
  val imageNearDup: String = {
    val m = graft.multimodal.Multimodal.ImageDupClasses
    val powerTerm = bitPowerTerm("by * 8 + bx")
    s"""WITH img AS (
         SELECT doc_id,
           xor(('0x' || substr(md5('img:' ||
                 CAST(doc_id % $m AS VARCHAR)), 1, 6))::BIGINT,
               ((doc_id // $m) % 8) * 9) AS base,
           32 + ((doc_id % $m) % 5) * 8 AS w,
           32 + ((doc_id % $m) % 3) * 8 AS h
         FROM documents),
       px AS (
         SELECT doc_id, w, h, x, y,
           xor(base, ((x * 31 + y) * 2654435761) & 16777215) & 16777215 AS p
         FROM img,
           unnest(generate_series(0, w - 1)) AS tx(x),
           unnest(generate_series(0, h - 1)) AS ty(y)),
       g AS (
         SELECT doc_id, y // (h // 8) AS by, x // (w // 8) AS bx,
           ((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255) AS gray
         FROM px),
       bs AS (
         SELECT doc_id, by, bx, CAST(sum(gray) AS BIGINT) AS s
         FROM g GROUP BY 1, 2, 3),
       tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS t
         FROM bs GROUP BY 1),
       ah AS (
         SELECT bs.doc_id,
           CAST(sum(CASE WHEN s * 64 > t THEN $powerTerm ELSE 0 END)
             AS BIGINT) AS ahash
         FROM bs JOIN tot USING (doc_id) GROUP BY 1)
     $hammingPairTail"""
  }

  /** Audio energy-hash near-dup (d102) matching
    * [[graft.multimodal.Multimodal.d102AudioNearDup]]: the 64-window
    * energy hash recomputed analytically from the PCM generator contract
    * (`audioGenParams`: class-keyed odd multiplier, per-doc XOR
    * perturbation on sample bits 7-9, class-keyed frame count; WAV is
    * lossless so the Spark side's real decode returns these exact
    * samples). Same integer-exact window rule and brute-force ground
    * truth as [[imageNearDup]].
    */
  val audioNearDup: String = {
    val m = graft.multimodal.Multimodal.AudioDupClasses
    s"""WITH ad AS (
         SELECT doc_id,
           2654435761 + 2 * ('0x' || substr(md5('wav:' ||
             CAST(doc_id % $m AS VARCHAR)), 1, 6))::BIGINT AS mult,
           ((doc_id // $m) % 8) << 7 AS pert,
           1024 + ((doc_id % $m) % 4) * 256 AS frames
         FROM documents),
       sm AS (
         SELECT doc_id, i // (frames // 64) AS win,
           abs(xor(((i * mult) & 16777215) >> 8, pert) - 32768) AS e
         FROM ad, unnest(generate_series(0, frames - 1)) AS t(i)),
       ws AS (
         SELECT doc_id, win, CAST(sum(e) AS BIGINT) AS s
         FROM sm GROUP BY 1, 2),
       tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS t
         FROM ws GROUP BY 1),
       ah AS (
         SELECT ws.doc_id,
           CAST(sum(CASE WHEN s * 64 > t THEN ${bitPowerTerm("win")}
                    ELSE 0 END) AS BIGINT) AS ahash
         FROM ws JOIN tot USING (doc_id) GROUP BY 1)
     $hammingPairTail"""
  }

  /** Image-hash cluster assignment (d105) matching
    * [[graft.multimodal.Multimodal.d105ImageClusters]]: the d46 recipe on
    * the d98 pair set — DuckDB's recursive CTE computes full
    * reachability over the analytic-hash pairs and labels each doc with
    * the min reachable doc_id, the same fixpoint the Spark
    * connected-components loop converges to.
    */
  val imageClusters: String =
    s"""WITH RECURSIVE ${ccChain(imageNearDup)}
     SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS csize
     FROM comp ORDER BY doc_id"""

  /** Tombstoned image clusters (d126) matching
    * [[graft.multimodal.Multimodal.d126TombstoneImageClusters]]: the d105
    * oracle verbatim over the SURVIVING corpus — the one-shot the healed
    * pair state must be indistinguishable from. The survivor filter is
    * spliced into the shared d98 hash CTE (its single `FROM documents`
    * site); pair machinery and CC chain are untouched.
    */
  val tombstoneImageClusters: String = {
    val survivorsNearDup = imageNearDup.replace("FROM documents",
      "FROM documents WHERE doc_id % 7 <> 3")
    s"""WITH RECURSIVE ${ccChain(survivorsNearDup)}
     SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS csize
     FROM comp ORDER BY doc_id"""
  }

  /** Cross-modal composed dedup verdict (d106) matching
    * [[graft.multimodal.Multimodal.d106MultimodalDedup]]: the d24
    * canonical-text keeper (null-safe fp join), the d105 image component
    * representative (unclustered ⇒ keeper), and the d93 URL keeper,
    * composed per doc from the same sub-oracles those queries use.
    */
  val multimodalDedup: String =
    s"""WITH RECURSIVE ${ccChain(imageNearDup)},
       fp AS (
         SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fp
         FROM documents),
       fk AS (SELECT fp, min(doc_id) AS tkeeper FROM fp GROUP BY fp),
       tv AS (
         SELECT fp.doc_id, fp.doc_id = fk.tkeeper AS keep_text
         FROM fp JOIN fk ON fp.fp IS NOT DISTINCT FROM fk.fp),
       uv AS (SELECT doc_id, keeper AS keep_url FROM ($urlDedup) u)
     SELECT tv.doc_id, tv.keep_text,
       (comp.component IS NULL OR comp.component = tv.doc_id) AS keep_image,
       uv.keep_url,
       (tv.keep_text
         AND (comp.component IS NULL OR comp.component = tv.doc_id)
         AND uv.keep_url) AS kept
     FROM tv
     JOIN uv USING (doc_id)
     LEFT JOIN comp ON comp.doc_id = tv.doc_id
     ORDER BY tv.doc_id"""

  /** Video clip-overlap near-dup (d103) matching
    * [[graft.multimodal.Multimodal.d103VideoOverlap]]: the identical
    * class-stream clip model (md5("vid:cls:k") fingerprints, offset and
    * length from the doc id) and the identical integer-exact containment
    * rule, with brute-force shared-fingerprint pairing as ground truth.
    */
  val videoOverlap: String = {
    val m = graft.multimodal.Multimodal.VideoDupClasses
    s"""WITH vd AS (
         SELECT doc_id,
           doc_id % $m AS cls,
           ((doc_id // $m) % 4) * 16 AS off,
           64 + ((doc_id % $m) % 3) * 16 AS n
         FROM documents),
       fr AS (
         SELECT doc_id,
           md5('vid:' || CAST(cls AS VARCHAR) || ':' || CAST(k AS VARCHAR))
             AS fp
         FROM vd, unnest(generate_series(off, off + n - 1)) AS t(k)),
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
         FROM fr GROUP BY 1),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(count(*) AS BIGINT) AS inter
         FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
     SELECT d1, d2, inter, sa.sz AS sz1, sb.sz AS sz2,
       (inter * 10000) // least(sa.sz, sb.sz) AS containment_q
     FROM pr
     JOIN sz sa ON sa.doc_id = d1
     JOIN sz sb ON sb.doc_id = d2
     WHERE inter * 5 >= least(sa.sz, sb.sz) * 4
     ORDER BY d1, d2"""
  }

  /** MJPEG-AVI clip-overlap dedup (d124) matching
    * [[graft.multimodal.Multimodal.d124MjpegVideoDedup]]: the Spark side
    * demuxes real RIFF containers and JPEG-decodes every frame, reading
    * each frame's 8×8 block pattern back out of the lossy pixels; the
    * pattern IS the first 64 bits of md5("avi:cls:k") by the generator
    * contract, so the oracle emits that hex prefix directly and
    * brute-runs the same integer-exact containment rule — every decoded
    * fingerprint is therefore oracle-checked bit for bit.
    */
  val mjpegVideoDedup: String = {
    val m = graft.multimodal.Multimodal.AviDupClasses
    val cap = graft.multimodal.Multimodal.AviDocCap
    s"""WITH vd AS (
         SELECT doc_id,
           doc_id % $m AS cls,
           ((doc_id // $m) % 4) * 4 AS off,
           16 + ((doc_id % $m) % 3) * 4 AS n
         FROM documents WHERE doc_id < $cap),
       fr AS (
         SELECT doc_id,
           substr(md5('avi:' || CAST(cls AS VARCHAR) || ':' ||
             CAST(k AS VARCHAR)), 1, 16) AS fp
         FROM vd, unnest(generate_series(off, off + n - 1)) AS t(k)),
       sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
         FROM fr GROUP BY 1),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(count(*) AS BIGINT) AS inter
         FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
     SELECT d1, d2, inter, sa.sz AS sz1, sb.sz AS sz2,
       (inter * 10000) // least(sa.sz, sb.sz) AS containment_q
     FROM pr
     JOIN sz sa ON sa.doc_id = d1
     JOIN sz sb ON sb.doc_id = d2
     WHERE inter * 5 >= least(sa.sz, sb.sz) * 4
     ORDER BY d1, d2"""
  }

  /** CCNet-style unigram-LM quality bucketing (t94) matching
    * [[graft.ops.TextOps.t94PerplexityBuckets]]: integer-quantized token
    * information averaged per doc, tertile cut via quantile_cont (the q32
    * percentile parity). `//` is DuckDB's floor integer division = Spark's
    * `div` on positive operands; the 1/3-2/3 literals are the shortest
    * double representations both engines parse to the identical double.
    */
  val perplexityBuckets: String =
    """WITH base AS (
         SELECT doc_id,
           string_split_regex(trim(lower(text)), '\s+') AS ws
         FROM documents),
       toks AS (SELECT doc_id, unnest(ws) AS w FROM base),
       counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
       n AS (SELECT sum(c) AS n_total FROM counts),
       scored AS (
         SELECT doc_id, count(*) AS n_tokens,
           floor(avg((n.n_total * 100) // c) * 1e4) / 1e4 AS lm_score
         FROM toks JOIN counts USING (w) CROSS JOIN n
         GROUP BY doc_id),
       th AS (SELECT
           quantile_cont(lm_score, 0.3333333333333333) AS t1,
           quantile_cont(lm_score, 0.6666666666666666) AS t2
         FROM scored)
     SELECT s.doc_id, s.n_tokens, s.lm_score,
       CASE WHEN s.lm_score <= th.t1 THEN 'head'
            WHEN s.lm_score <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
     FROM scored s CROSS JOIN th ORDER BY s.doc_id"""

  /** Line-level Gopher rules (t81) over the deterministic doc_id-derived
    * multi-line payload matching [[graft.ops.TextOps.t81LineRules]] (the
    * corpus itself is single-line prose, so — like t48's PII suffix — the
    * payload exercises the real path).
    */
  val lineRules: String =
    s"""WITH p AS (
         SELECT doc_id, text
           || repeat(' #', CAST(doc_id % 11 AS INTEGER))
           || repeat(' 42', CAST(doc_id % 40 AS INTEGER))
           || repeat(chr(10) || '- bullet item', CAST(doc_id % 23 AS INTEGER))
           || repeat(chr(10) || 'to be continued...',
                CAST(doc_id % 5 AS INTEGER)) AS lined
         FROM documents),
       m AS (
         SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(lined)), '\\s+')) AS BIGINT)
             AS n_words,
           ${lineMetricCols("lined")}
         FROM p)
       SELECT doc_id, n_words, n_lines, bullet_lines, ellipsis_lines,
         alpha_words, n_hash, n_ellipsis,
         bullet_lines * 10 <= n_lines * 9 AS rule_bullet,
         ellipsis_lines * 10 <= n_lines * 3 AS rule_ellipsis,
         alpha_words * 5 >= n_words * 4 AS rule_alpha,
         n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words
           AS rule_symbol,
         $lineRuleConj AS keep_lines
       FROM m ORDER BY doc_id"""

  /** Full n-gram repetition metrics (t79): counts, covered/duplicate char
    * volumes, fractions of non-whitespace chars (4-dp floor-truncated, same
    * float-op order as the Spark side), and threshold verdicts.
    */
  val ngramRepetition: String = {
    val cols = (2 to 4).map { n =>
      s"""COALESCE(top${n}_cnt, 0) AS top${n}_cnt,
           COALESCE(top${n}_chars, 0) AS top${n}_chars,
           COALESCE(dup${n}_chars, 0) AS dup${n}_chars,
           CASE WHEN n_chars = 0 THEN 0.0
             ELSE floor(COALESCE(top${n}_chars, 0) * 1.0 / n_chars * 10000)
               / 10000 END AS top${n}_frac,
           CASE WHEN n_chars = 0 THEN 0.0
             ELSE floor(COALESCE(dup${n}_chars, 0) * 1.0 / n_chars * 10000)
               / 10000 END AS dup${n}_frac"""
    }.mkString(",\n           ")
    s"""WITH $gwCte,
       $ngramCtes,
       d AS (
         SELECT doc_id,
           CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
             AS n_chars
         FROM documents)
       SELECT d.doc_id, d.n_chars,
           $cols,
           COALESCE(top2_chars, 0) * 5 <= n_chars AS rule_2g,
           COALESCE(top3_chars, 0) * 50 <= n_chars * 9 AS rule_3g,
           COALESCE(top4_chars, 0) * 25 <= n_chars * 4 AS rule_4g
       FROM d
       LEFT JOIN top2 ON top2.doc_id = d.doc_id
       LEFT JOIN dup2 ON dup2.doc_id = d.doc_id
       LEFT JOIN top3 ON top3.doc_id = d.doc_id
       LEFT JOIN dup3 ON dup3.doc_id = d.doc_id
       LEFT JOIN top4 ON top4.doc_id = d.doc_id
       LEFT JOIN dup4 ON dup4.doc_id = d.doc_id
       ORDER BY d.doc_id"""
  }

  /** Connected-component CTE chain over the minhash candidate pairs (shared
    * by dedupClusters and cleanPipeline): DuckDB's recursive CTE computes
    * full reachability (fine at oracle scale), then labels each doc with the
    * min reachable doc_id — the same fixpoint the Spark loop converges to.
    */
  /** Recursive-CTE connected components over a (d1, d2) pair query. The
    * `p` prefix renames every CTE (`${p}comp` etc.) so several chains can
    * coexist in ONE WITH RECURSIVE (the d118 oracle runs three).
    */
  private def ccChain(pairsSql: String, p: String = ""): String =
    s"""${p}edges AS (
         SELECT d1, d2 FROM ($pairsSql) mh),
       ${p}sym AS (
         SELECT d1 AS a, d2 AS b FROM ${p}edges
         UNION
         SELECT d2 AS a, d1 AS b FROM ${p}edges),
       ${p}reach AS (
         SELECT a AS doc_id, a AS r FROM ${p}sym
         UNION
         SELECT ${p}reach.doc_id, s.b AS r
         FROM ${p}reach JOIN ${p}sym s ON s.a = ${p}reach.r),
       ${p}comp AS (
         SELECT doc_id, min(r) AS component FROM ${p}reach GROUP BY doc_id)"""

  private val ccCtes: String = ccChain(minhashLsh)

  val dedupClusters: String =
    s"""WITH RECURSIVE $ccCtes
     SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS csize
     FROM comp ORDER BY doc_id"""

  /** Tombstoned incremental CC (d128) matching
    * [[graft.ops.TextOps.d128TombstoneCc]]: full-recompute reachability
    * over the minhash pairs with BOTH ends surviving the delete set
    * (doc_id % 7 <> 3) — the healed incremental labeling must be
    * indistinguishable from a one-shot clustering that never saw the
    * deleted docs' edges. Docs left edge-less by the delete drop out of
    * the clustered set, exactly the one-shot d46 semantics.
    */
  val tombstoneCc: String =
    s"""WITH RECURSIVE ${ccChain(
        s"SELECT d1, d2 FROM ($minhashLsh) mp WHERE d1 % 7 <> 3 AND d2 % 7 <> 3")}
     SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS csize
     FROM comp ORDER BY doc_id"""

  /** Composed cleaning pipeline matching [[graft.ops.TextOps.t65CleanPipeline]]:
    * Gopher quality keep + exact-dup keeper + near-dup cluster
    * representative, all from the same sub-oracles the individual queries
    * use.
    */
  val cleanPipeline: String =
    s"""WITH RECURSIVE $ccCtes,
       $gwCte,
       $ngramCtes,
       lm AS (
         SELECT doc_id,
           ${lineMetricCols("text")}
         FROM documents),
       gf AS (
         SELECT m.doc_id,
           (n_words >= 15 AND n_words <= 100000)
             AND (n_alpha >= n_words * 3 AND n_alpha <= n_words * 10)
             AND n_stop >= 1 AND top_cnt * 5 <= n_words
             AND COALESCE(top2_chars, 0) * 5 <= n_alpha
             AND COALESCE(top3_chars, 0) * 50 <= n_alpha * 9
             AND COALESCE(top4_chars, 0) * 25 <= n_alpha * 4
             AND $lineRuleConj AS keep_quality
         FROM (
           SELECT doc_id,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
               AS n_words,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
               AS n_alpha,
             CAST(len(regexp_extract_all(lower(text),
               '\\b(the|a|of|and|to|in|is)\\b')) AS BIGINT) AS n_stop,
             (SELECT CAST(max(c) AS BIGINT) FROM (
                SELECT count(*) AS c
                FROM unnest(string_split_regex(trim(lower(text)), '\\s+'))
                  AS t(word)
                GROUP BY word) q) AS top_cnt
           FROM documents) m
         JOIN lm ON lm.doc_id = m.doc_id
         LEFT JOIN top2 ON top2.doc_id = m.doc_id
         LEFT JOIN top3 ON top3.doc_id = m.doc_id
         LEFT JOIN top4 ON top4.doc_id = m.doc_id),
       fpk AS (
         SELECT doc_id,
           doc_id = min(doc_id) OVER (PARTITION BY
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
             AS keep_exact
         FROM documents)
     SELECT d.doc_id, gf.keep_quality, fpk.keep_exact,
       (comp.component IS NULL OR comp.component = d.doc_id) AS keep_neardup,
       gf.keep_quality AND fpk.keep_exact
         AND (comp.component IS NULL OR comp.component = d.doc_id) AS kept
     FROM documents d
     JOIN gf USING (doc_id)
     JOIN fpk USING (doc_id)
     LEFT JOIN comp ON comp.doc_id = d.doc_id
     ORDER BY d.doc_id"""

  val simhash: String = {
    val votes = (0 until 32).map { b =>
      s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n         ")
    val simExpr = (0 until 32).map { b =>
      s"(CASE WHEN v$b > 0 THEN (1::BIGINT << $b) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH w0 AS (
         SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
         FROM documents),
       w AS (SELECT DISTINCT doc_id, w FROM w0),
       h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM w),
       v AS (SELECT doc_id,
         $votes
         FROM h GROUP BY doc_id),
       sim AS (SELECT doc_id, $simExpr AS simhash FROM v),
       bkt AS (
         ${(0 until graft.ops.TextOps.SimhashTables).map { t =>
            val r = 8 * t
            val rot =
              if (r == 0) "simhash"
              else s"(((simhash << $r) | (simhash >> ${32 - r})) & 4294967295)"
            s"SELECT doc_id, simhash, $t AS tbl, ($rot) >> 16 AS bucket FROM sim"
          }.mkString("\n         UNION ALL ")}),
       cand AS (
         SELECT ba.doc_id AS d1, bb.doc_id AS d2,
           CAST(bit_count(xor(ba.simhash, bb.simhash)) AS BIGINT) AS hamming
         FROM bkt ba JOIN bkt bb ON ba.tbl = bb.tbl
           AND ba.bucket = bb.bucket AND ba.doc_id < bb.doc_id)
     SELECT DISTINCT d1, d2, hamming
     FROM cand
     WHERE hamming <= 6
     ORDER BY d1, d2"""
  }

  private def planeLiteral(p: Int): String =
    VectorOps.planes(p).map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")

  private val bucketExpr: String = (0 until VectorOps.NumPlanes).map { p =>
    s"(CASE WHEN list_dot_product(v, ${planeLiteral(p)}) > 0 " +
      s"THEN (1::BIGINT << $p) ELSE 0 END)"
  }.mkString(" + ")

  val lshBuckets: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       b AS (SELECT vec_id, $bucketExpr AS bucket FROM e)
     SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
     FROM b GROUP BY bucket ORDER BY bucket"""

  val embedNearDup: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       nb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv,
                $bucketExpr AS bucket FROM e)
     SELECT a.vec_id AS d1, b.vec_id AS d2,
       round(list_dot_product(a.v, b.v) / (a.nv * b.nv), 4) AS sim_r
     FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
     WHERE list_dot_product(a.v, b.v) / (a.nv * b.nv)
       >= ${VectorOps.NearDupThreshold}
     ORDER BY d1, d2"""

  /** IVF scored candidate set (standalone SELECT) — shared by [[ivfAnn]]
    * (ranked top-3) and [[annFrontier]] (candidate counts + top-10).
    */
  val ivfCands: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
       c0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings),
       c1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM c0 GROUP BY label, dim),
       c AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM c1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM e, c),
       assigned AS (SELECT r.vec_id, e.v,
           sqrt(list_dot_product(e.v, e.v)) AS nv, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id WHERE r.arn = 1),
       probes AS (SELECT r.vec_id AS query_id, e.v AS qv,
           sqrt(list_dot_product(e.v, e.v)) AS nq, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id
         WHERE r.vec_id < 10 AND r.arn <= 2)
     SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.qv, a.v) / (p.nq * a.nv) AS sim
     FROM assigned a JOIN probes p ON a.clabel = p.clabel
       AND a.vec_id <> p.query_id"""

  val ivfAnn: String =
    s"""WITH rk AS (SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM ($ivfCands) sims)
     SELECT query_id, neighbor_id, round(sim, 4) AS sim_r, rnk
     FROM rk WHERE rnk <= 3 ORDER BY query_id, rnk"""

  /** Filtered IVF ANN (v122) matching
    * [[graft.ops.VectorOps.v122FilteredAnn]]: the exact one-shot twin —
    * same full-corpus codebook and nprobe=2 probes as [[ivfAnn]], with the
    * label-parity predicate applied to the ASSIGNED corpus before scoring
    * (the filter sits below the rank, so top-k fills from filtered
    * candidates instead of dropping post-rank survivors).
    */
  val filteredIvfAnn: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
       c0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings),
       c1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM c0 GROUP BY label, dim),
       c AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM c1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM e, c),
       assigned AS (SELECT r.vec_id, e.v,
           sqrt(list_dot_product(e.v, e.v)) AS nv, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id
         WHERE r.arn = 1 AND e.label % 2 = 0),
       probes AS (SELECT r.vec_id AS query_id, e.v AS qv,
           sqrt(list_dot_product(e.v, e.v)) AS nq, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id
         WHERE r.vec_id < 10 AND r.arn <= 2),
       sims AS (SELECT p.query_id, a.vec_id AS neighbor_id,
           list_dot_product(p.qv, a.v) / (p.nq * a.nv) AS sim
         FROM assigned a JOIN probes p ON a.clabel = p.clabel
           AND a.vec_id <> p.query_id),
       rk AS (SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM sims)
     SELECT query_id, neighbor_id, round(sim, 4) AS sim_r, rnk
     FROM rk WHERE rnk <= 3 ORDER BY query_id, rnk"""

  /** Incremental IVF ANN (v120) matching
    * [[graft.ops.VectorOps.v120IncrementalIvf]] — the one-shot twin of the
    * two-batch index build: the coarse quantizer is per-label centroids of
    * the EVEN-vec_id half only (the frozen codebook batch 1 trained), every
    * vector — both batches — is assigned to it in one shot, and the
    * standard 10 queries probe their nprobe=2 nearest lists. Equality
    * proves the batch-appended index serves the same answers as a
    * from-scratch build against the same quantizer.
    */
  val incrementalIvf: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
       c0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings
              WHERE vec_id % 2 = 0),
       c1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM c0 GROUP BY label, dim),
       c AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM c1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM e, c),
       assigned AS (SELECT r.vec_id, e.v,
           sqrt(list_dot_product(e.v, e.v)) AS nv, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id WHERE r.arn = 1),
       probes AS (SELECT r.vec_id AS query_id, e.v AS qv,
           sqrt(list_dot_product(e.v, e.v)) AS nq, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id
         WHERE r.vec_id < 10 AND r.arn <= 2),
       sims AS (SELECT p.query_id, a.vec_id AS neighbor_id,
           list_dot_product(p.qv, a.v) / (p.nq * a.nv) AS sim
         FROM assigned a JOIN probes p ON a.clabel = p.clabel
           AND a.vec_id <> p.query_id),
       rk AS (SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM sims)
     SELECT query_id, neighbor_id, round(sim, 4) AS sim_r, rnk
     FROM rk WHERE rnk <= 3 ORDER BY query_id, rnk"""

  /** Tombstoned incremental IVF (v127) matching
    * [[graft.ops.VectorOps.v127TombstoneAnn]]: the v120 one-shot twin
    * (even-half frozen codebook, all vectors assigned in one shot) with
    * the delete set removed from the ASSIGNED corpus — queries over the
    * anti-join-healed index must equal a from-scratch index of the
    * survivors. Probes stay the standard vec_id < 10 query set.
    */
  val tombstoneAnn: String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
       c0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings
              WHERE vec_id % 2 = 0),
       c1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM c0 GROUP BY label, dim),
       c AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM c1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM e, c),
       assigned AS (SELECT r.vec_id, e.v,
           sqrt(list_dot_product(e.v, e.v)) AS nv, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id
         WHERE r.arn = 1 AND e.vec_id % 7 <> 3),
       probes AS (SELECT r.vec_id AS query_id, e.v AS qv,
           sqrt(list_dot_product(e.v, e.v)) AS nq, r.clabel
         FROM ranked r JOIN e ON e.vec_id = r.vec_id
         WHERE r.vec_id < 10 AND r.arn <= 2),
       sims AS (SELECT p.query_id, a.vec_id AS neighbor_id,
           list_dot_product(p.qv, a.v) / (p.nq * a.nv) AS sim
         FROM assigned a JOIN probes p ON a.clabel = p.clabel
           AND a.vec_id <> p.query_id),
       rk AS (SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM sims)
     SELECT query_id, neighbor_id, round(sim, 4) AS sim_r, rnk
     FROM rk WHERE rnk <= 3 ORDER BY query_id, rnk"""

  /** Unrolled Lloyd's loop matching [[VectorOps.v60Kmeans]]: KmeansIters
    * rounds of (cosine argmax assignment with cid tiebreak, per-dim avg
    * recompute rounded to 4dp), init = first K vectors rounded to 4dp.
    * The 4dp rounding at every round makes the centroid trajectory
    * bit-identical across engines.
    */
  /** The unrolled Lloyd's CTE chain (shared by [[kmeans]],
    * [[semanticDedup]] and [[incrementalSemDedup]]): emits e (full corpus),
    * et (the training set — `trainWhere` filters it; empty = train on
    * everything, the v60/v83 case), c0, and per-round a-i/cg-i/c-i up to
    * `a{KmeansIters}` — the final (vec_id, v, cid) training assignment.
    * Init = the training set's K smallest vec_ids with cid = rank − 1,
    * which on the full corpus (dense ids from 0) is the historical
    * `vec_id < K, cid = vec_id` init — v60/v83 trajectories unchanged.
    */
  private def kmeansCtes(trainWhere: String): String = {
    val k = VectorOps.KmeansK
    val iters = VectorOps.KmeansIters
    def assign(a: String, c: String): String =
      s"""$a AS (
         SELECT vec_id, v, cid FROM (
           SELECT e.vec_id, e.v, c.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               CASE WHEN sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec)) = 0
                    THEN 0.0
                    ELSE list_dot_product(e.v, c.cvec)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) END DESC,
               c.cid) AS arn
           FROM et e, $c c) t WHERE arn = 1)"""
    def recompute(cg: String, c: String, a: String): String =
      s"""$cg AS (
         SELECT cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT cid, CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS dim,
             unnest(v) AS x
           FROM $a) u
         GROUP BY cid, dim),
       $c AS (SELECT cid, list(cv ORDER BY dim) AS cvec FROM $cg
              GROUP BY cid)"""
    val rounds = (1 to iters).map { i =>
      s"""${assign(s"a$i", s"c${i - 1}")},
       ${recompute(s"cg$i", s"c$i", s"a$i")}"""
    }.mkString(",\n       ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       et AS (SELECT vec_id, v FROM e $trainWhere),
       c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                       AS INTEGER) AS cid,
                list_transform(v, x -> round(x, 4)) AS cvec
              FROM (SELECT vec_id, v FROM et
                    ORDER BY vec_id LIMIT $k) init),
       $rounds"""
  }

  val kmeans: String = {
    val iters = VectorOps.KmeansIters
    s"""WITH ${kmeansCtes("")},
       sizes AS (SELECT cid, count(*) AS n_vecs FROM a$iters GROUP BY cid)
     SELECT g.cid, g.dim, g.cv AS centroid, s.n_vecs
     FROM cg$iters g JOIN sizes s USING (cid)
     ORDER BY cid, dim"""
  }

  /** Cluster-scoped semantic dedup (v83) matching
    * [[graft.ops.VectorOps.v83SemanticDedup]]: within each final k-means
    * cluster, a vector is a duplicate if a smaller-vec_id cluster-mate
    * sits at or above the cosine floor (min-id-wins keeper).
    */
  val semanticDedup: String = {
    val iters = VectorOps.KmeansIters
    val tau = VectorOps.SemDedupThreshold
    s"""WITH ${kmeansCtes("")},
       norms AS (SELECT vec_id, v, cid,
                   sqrt(list_dot_product(v, v)) AS nv
                 FROM a$iters),
       dups AS (
         SELECT a.vec_id, count(*) AS n_smaller_dups
         FROM norms a JOIN norms b ON a.cid = b.cid
           AND b.vec_id < a.vec_id
         WHERE list_dot_product(a.v, b.v) / (a.nv * b.nv) >= $tau
         GROUP BY a.vec_id)
     SELECT n.vec_id, n.cid,
       CAST(COALESCE(d.n_smaller_dups, 0) AS BIGINT) AS n_smaller_dups,
       COALESCE(d.n_smaller_dups, 0) = 0 AS keeper
     FROM norms n LEFT JOIN dups d ON d.vec_id = n.vec_id
     ORDER BY n.vec_id"""
  }

  /** Incremental semantic dedup (d92) matching
    * [[graft.ops.VectorOps.d92IncrementalSemDedup]] — the fixed-centroid
    * one-shot the incremental path must equal: centroids train on the
    * even-vec_id half only, then ALL vectors assign to those FROZEN final
    * centroids and the v83 in-cluster min-id-wins pair search runs once.
    */
  val incrementalSemDedup: String = {
    val iters = VectorOps.KmeansIters
    val tau = VectorOps.SemDedupThreshold
    s"""WITH ${kmeansCtes("WHERE vec_id % 2 = 0")},
       af AS (
         SELECT vec_id, v, cid FROM (
           SELECT e.vec_id, e.v, c.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               CASE WHEN sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec)) = 0
                    THEN 0.0
                    ELSE list_dot_product(e.v, c.cvec)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) END DESC,
               c.cid) AS arn
           FROM e, c$iters c) t WHERE arn = 1),
       norms AS (SELECT vec_id, v, cid,
                   sqrt(list_dot_product(v, v)) AS nv
                 FROM af),
       dups AS (
         SELECT a.vec_id, count(*) AS n_smaller_dups
         FROM norms a JOIN norms b ON a.cid = b.cid
           AND b.vec_id < a.vec_id
         WHERE list_dot_product(a.v, b.v) / (a.nv * b.nv) >= $tau
         GROUP BY a.vec_id)
     SELECT n.vec_id, n.cid,
       CAST(COALESCE(d.n_smaller_dups, 0) AS BIGINT) AS n_smaller_dups,
       COALESCE(d.n_smaller_dups, 0) = 0 AS keeper
     FROM norms n LEFT JOIN dups d ON d.vec_id = n.vec_id
     ORDER BY n.vec_id"""
  }

  /** Cluster-density data pruning (v154) matching
    * [[graft.ops.VectorOps.v154DensityPrune]]: the v60 Lloyd's chain's
    * final assignment, each vector's pinned-arithmetic cosine to its OWN
    * centroid, per-cluster prototypicality ranks (sim DESC, vec_id), and
    * the integer keep rule `4·rank > cluster_size`.
    */
  val densityPrune: String = {
    val iters = VectorOps.KmeansIters
    s"""WITH ${kmeansCtes("")},
       sims AS (
         SELECT a.vec_id, a.cid,
           CASE WHEN sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(c.cvec, c.cvec)) = 0
                THEN 0.0
                ELSE list_dot_product(a.v, c.cvec)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(c.cvec, c.cvec))) END AS sim
         FROM a$iters a JOIN c$iters c USING (cid)),
       ranked AS (
         SELECT vec_id, cid,
           CAST(row_number() OVER (PARTITION BY cid
             ORDER BY sim DESC, vec_id) AS BIGINT) AS proto_rank,
           CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_vecs
         FROM sims)
     SELECT vec_id, cid, proto_rank, n_vecs,
       proto_rank * 4 > n_vecs AS keep
     FROM ranked ORDER BY vec_id"""
  }

  /** Batch-incremental density pruning (v156) matching
    * [[graft.ops.VectorOps.v156IncrementalPrune]] — the fixed-centroid
    * one-shot the incremental path must equal (the d92 convention):
    * centroids train on the even-vec_id half only, ALL vectors assign to
    * those frozen final centroids, then the v154 rank + integer-cut tail.
    */
  val incrementalPrune: String = {
    val iters = VectorOps.KmeansIters
    s"""WITH ${kmeansCtes("WHERE vec_id % 2 = 0")},
       af AS (
         SELECT vec_id, v, cid FROM (
           SELECT e.vec_id, e.v, c.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               CASE WHEN sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec)) = 0
                    THEN 0.0
                    ELSE list_dot_product(e.v, c.cvec)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) END DESC,
               c.cid) AS arn
           FROM e, c$iters c) t WHERE arn = 1),
       sims AS (
         SELECT a.vec_id, a.cid,
           CASE WHEN sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(c.cvec, c.cvec)) = 0
                THEN 0.0
                ELSE list_dot_product(a.v, c.cvec)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(c.cvec, c.cvec))) END AS sim
         FROM af a JOIN c$iters c USING (cid)),
       ranked AS (
         SELECT vec_id, cid,
           CAST(row_number() OVER (PARTITION BY cid
             ORDER BY sim DESC, vec_id) AS BIGINT) AS proto_rank,
           CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n_vecs
         FROM sims)
     SELECT vec_id, cid, proto_rank, n_vecs,
       proto_rank * 4 > n_vecs AS keep
     FROM ranked ORDER BY vec_id"""
  }

  /** Shingle-overlap decontamination matching
    * [[graft.ops.TextOps.t67Decontaminate]] (benchmark = docs 0-9).
    */
  val decontaminate: String =
    s"""$shingleCte,
       bench AS (SELECT DISTINCT sh.sh FROM sh WHERE doc_id < 10),
       corp AS (
         SELECT s.doc_id, b.sh IS NOT NULL AS hit
         FROM (SELECT * FROM sh WHERE doc_id >= 10) s
         LEFT JOIN bench b ON s.sh = b.sh)
     SELECT doc_id,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       count(*) AS n_sh,
       sum(CASE WHEN hit THEN 1 ELSE 0 END) * 5 >= count(*) AS contaminated
     FROM corp GROUP BY doc_id
     HAVING sum(CASE WHEN hit THEN 1 ELSE 0 END) >= 1
     ORDER BY doc_id"""

  /** Product-quantization ADC candidate scores matching
    * [[VectorOps.v64PqAnn]]'s candidate stage: M subspaces, K codewords
    * each, init = first K subvectors (4dp), one squared-L2 Lloyd
    * refinement (4dp), encode, then per-query lookup-table scoring. pd is
    * rounded to 4dp before the sum so identical code tuples rank
    * identically in any engine (see the Spark-side comment). Standalone
    * SELECT of (query_id, neighbor_id, sim) — shared by [[pqAnn]] (ranked
    * top-3) and [[annFrontier]].
    */
  val pqCands: String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val sub = VectorOps.Dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       subs AS (
         SELECT vec_id, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM e, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subs WHERE vec_id < $k),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c0 c ON s.m = c.m) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       codes AS (
         SELECT vec_id, m, cid FROM (
           SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c1 c ON s.m = c.m) t WHERE arn = 1),
       lut AS (
         SELECT s.vec_id AS query_id, s.m, c.cid,
           round(list_dot_product(s.sub, c.cvec), 4) AS pd
         FROM subs s JOIN c1 c ON s.m = c.m WHERE s.vec_id < 5),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co JOIN lut l ON co.m = l.m AND co.cid = l.cid
         WHERE co.vec_id <> l.query_id
         GROUP BY l.query_id, co.vec_id)
     SELECT query_id, vec_id AS neighbor_id, approx_r AS sim FROM sc"""
  }

  val pqAnn: String =
    s"""WITH rk AS (
         SELECT query_id, neighbor_id, sim AS approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM ($pqCands) sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""

  /** Filtered PQ ANN (v129) matching
    * [[graft.ops.VectorOps.v129FilteredPq]]: the v64 one-shot chain with
    * the label carried onto the code rows and the predicate
    * (label % 2 = 0) applied to the CODE table below the ADC ranking —
    * exactly where the Spark side filters, so top-k fills wherever the
    * filtered corpus holds ≥ k candidates.
    */
  val filteredPq: String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val sub = VectorOps.Dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
       subs AS (
         SELECT vec_id, label, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM e, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subs WHERE vec_id < $k),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c0 c ON s.m = c.m) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       codes AS (
         SELECT vec_id, label, m, cid FROM (
           SELECT s.vec_id, s.label, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c1 c ON s.m = c.m) t WHERE arn = 1),
       lut AS (
         SELECT s.vec_id AS query_id, s.m, c.cid,
           round(list_dot_product(s.sub, c.cvec), 4) AS pd
         FROM subs s JOIN c1 c ON s.m = c.m WHERE s.vec_id < 5),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co JOIN lut l ON co.m = l.m AND co.cid = l.cid
         WHERE co.vec_id <> l.query_id AND co.label % 2 = 0
         GROUP BY l.query_id, co.vec_id),
       rk AS (
         SELECT query_id, vec_id AS neighbor_id, approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_r DESC, vec_id) AS rnk FROM sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""
  }

  /** Incremental PQ ANN (v121) matching
    * [[graft.ops.VectorOps.v121IncrementalPq]] — the one-shot twin of the
    * two-batch code-table build: PQ codebooks train on the EVEN-vec_id
    * half only (init = the first K even subvectors, one Lloyd refinement
    * over evens only) and every vector — both batches — is encoded against
    * them in one shot; the v64 queries ADC-score the full code table.
    * Equality proves the batch-appended compressed index serves the same
    * answers as a from-scratch encode against the same frozen codebooks.
    */
  val incrementalPq: String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val sub = VectorOps.Dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       subs AS (
         SELECT vec_id, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM e, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subs WHERE vec_id % 2 = 0 AND vec_id < ${2 * k}),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c0 c ON s.m = c.m
           WHERE s.vec_id % 2 = 0) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       codes AS (
         SELECT vec_id, m, cid FROM (
           SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c1 c ON s.m = c.m) t WHERE arn = 1),
       lut AS (
         SELECT s.vec_id AS query_id, s.m, c.cid,
           round(list_dot_product(s.sub, c.cvec), 4) AS pd
         FROM subs s JOIN c1 c ON s.m = c.m WHERE s.vec_id < 5),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co JOIN lut l ON co.m = l.m AND co.cid = l.cid
         WHERE co.vec_id <> l.query_id
         GROUP BY l.query_id, co.vec_id),
       rk AS (
         SELECT query_id, vec_id AS neighbor_id, approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_r DESC, vec_id) AS rnk FROM sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""
  }

  /** Tombstoned incremental PQ (v130) matching
    * [[graft.ops.VectorOps.v130TombstonePq]]: the v121 one-shot twin
    * (even-half frozen codebooks) with the delete set removed from the
    * CODE table — queries over the anti-join-healed compressed index
    * must equal a from-scratch encode of the survivors at the same
    * frozen codebooks. Probes stay the standard vec_id < 5 query set.
    */
  val tombstonePq: String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val sub = VectorOps.Dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       subs AS (
         SELECT vec_id, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM e, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subs WHERE vec_id % 2 = 0 AND vec_id < ${2 * k}),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c0 c ON s.m = c.m
           WHERE s.vec_id % 2 = 0) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       codes AS (
         SELECT vec_id, m, cid FROM (
           SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c1 c ON s.m = c.m
           WHERE s.vec_id % 7 <> 3) t WHERE arn = 1),
       lut AS (
         SELECT s.vec_id AS query_id, s.m, c.cid,
           round(list_dot_product(s.sub, c.cvec), 4) AS pd
         FROM subs s JOIN c1 c ON s.m = c.m WHERE s.vec_id < 5),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co JOIN lut l ON co.m = l.m AND co.cid = l.cid
         WHERE co.vec_id <> l.query_id
         GROUP BY l.query_id, co.vec_id),
       rk AS (
         SELECT query_id, vec_id AS neighbor_id, approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_r DESC, vec_id) AS rnk FROM sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""
  }

  /** Combined IVF+PQ ADC (v132) matching [[VectorOps.v132IvfPq]]: the
    * ivfAnn coarse chain (per-label 4dp centroids, argmax-cosine
    * assignment, nprobe=2 probes — here over the PQ-convention vec_id < 5
    * query set) composed with the pqAnn code chain (first-K init, one
    * 4dp Lloyd refinement, encode, per-query 4dp LUT), scoring ONLY
    * (query, probed-list) pairs: a code row joins the LUT only through a
    * probe row whose clabel is the row's assigned list.
    */
  val ivfPq: String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val sub = VectorOps.Dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       ic0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings),
       ic1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM ic0 GROUP BY label, dim),
       ic AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM ic1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM e, ic),
       assigned AS (SELECT vec_id, clabel FROM ranked WHERE arn = 1),
       probes AS (SELECT vec_id AS query_id, clabel FROM ranked
         WHERE vec_id < 5 AND arn <= 2),
       subs AS (
         SELECT vec_id, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM e, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subs WHERE vec_id < $k),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c0 c ON s.m = c.m) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       codes AS (
         SELECT vec_id, m, cid FROM (
           SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c1 c ON s.m = c.m) t WHERE arn = 1),
       lut AS (
         SELECT s.vec_id AS query_id, s.m, c.cid,
           round(list_dot_product(s.sub, c.cvec), 4) AS pd
         FROM subs s JOIN c1 c ON s.m = c.m WHERE s.vec_id < 5),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co
         JOIN assigned a ON a.vec_id = co.vec_id
         JOIN probes p ON p.clabel = a.clabel
         JOIN lut l ON l.m = co.m AND l.cid = co.cid
           AND l.query_id = p.query_id
         WHERE co.vec_id <> p.query_id
         GROUP BY l.query_id, co.vec_id),
       rk AS (
         SELECT query_id, vec_id AS neighbor_id, approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_r DESC, vec_id) AS rnk FROM sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""
  }

  /** Residual IVF+PQ (v133) matching [[VectorOps.v133IvfPqResidual]]: the
    * ivfPq coarse chain unchanged, but the PQ train/encode chain runs on
    * RESIDUALS v − centroid(assigned list) (elementwise list arithmetic),
    * and the ADC LUT is per-(query, probed list): the query's residual is
    * taken against EACH probed list's centroid before the codeword dots.
    * Scoring joins codes to the LUT through the code row's assigned list —
    * the probed-pair restriction and the residual frame in one equi-join.
    * `scFilter` is an extra predicate on the scored code rows (the v142
    * serve-time metadata filter, e.g. `AND co.label % 2 = 0`) — `label`
    * rides the resid/subs/codes chain so the filtered variants apply it
    * exactly where the Spark side does: below the ADC score/rank.
    */
  private def ivfPqResidualCtes(scFilter: String = ""): String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val dim = VectorOps.Dim
    val sub = dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
       ic0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings),
       ic1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM ic0 GROUP BY label, dim),
       ic AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM ic1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM e, ic),
       assigned AS (SELECT vec_id, clabel FROM ranked WHERE arn = 1),
       probes AS (SELECT vec_id AS query_id, clabel FROM ranked
         WHERE vec_id < 5 AND arn <= 2),
       resid AS (
         SELECT a.vec_id, a.clabel, e.label,
           list_transform(generate_series(1, $dim),
             i -> e.v[i] - ic.cvec[i]) AS rv
         FROM assigned a JOIN e ON e.vec_id = a.vec_id
         JOIN ic ON ic.clabel = a.clabel),
       subs AS (
         SELECT vec_id, label, CAST(t.m AS INTEGER) AS m,
           list_slice(rv, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM resid, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subs WHERE vec_id < $k),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c0 c ON s.m = c.m) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       codes AS (
         SELECT vec_id, label, m, cid FROM (
           SELECT s.vec_id, s.label, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subs s JOIN c1 c ON s.m = c.m) t WHERE arn = 1),
       qres AS (
         SELECT p.query_id, p.clabel,
           list_transform(generate_series(1, $dim),
             i -> e.v[i] - ic.cvec[i]) AS rv
         FROM probes p JOIN e ON e.vec_id = p.query_id
         JOIN ic ON ic.clabel = p.clabel),
       qsubs AS (
         SELECT query_id, clabel, CAST(t.m AS INTEGER) AS m,
           list_slice(rv, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM qres, unnest(generate_series(0, ${m - 1})) AS t(m)),
       lut AS (
         SELECT q.query_id, q.clabel, q.m, c.cid,
           round(list_dot_product(q.sub, c.cvec), 4) AS pd
         FROM qsubs q JOIN c1 c ON q.m = c.m),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co
         JOIN assigned a ON a.vec_id = co.vec_id
         JOIN lut l ON l.clabel = a.clabel
           AND l.m = co.m AND l.cid = co.cid
         WHERE co.vec_id <> l.query_id$scFilter
         GROUP BY l.query_id, co.vec_id)"""
  }

  /** Shared ranking tail over the residual chain's `sc` scores — one
    * definition for the unfiltered v133 and the filtered v142.
    */
  private val ivfPqResidualTail: String =
    s""",
       rk AS (
         SELECT query_id, vec_id AS neighbor_id, approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_r DESC, vec_id) AS rnk FROM sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""

  val ivfPqResidual: String = ivfPqResidualCtes() + ivfPqResidualTail

  /** Filtered residual IVF+PQ (v142) matching
    * [[VectorOps.v142FilteredIvfPq]]: the exact v133 chain with `label`
    * carried onto the code rows and the predicate (label % 2 = 0)
    * applied to the scored code rows BELOW the ADC ranking — exactly
    * where the Spark side filters, so top-k fills wherever the filtered
    * probed lists hold ≥ k candidates.
    */
  val filteredIvfPq: String =
    ivfPqResidualCtes(" AND co.label % 2 = 0") + ivfPqResidualTail

  /** ADC shortlist + exact re-rank (v134) matching
    * [[VectorOps.v134IvfPqRerank]]: the full residual-IVFPQ chain up to the
    * ADC scores (shared CTEs with [[ivfPqResidual]], so the two oracles'
    * approximate stage cannot drift), shortlisted to the top-RerankR per
    * query on (approx DESC, vec_id), then re-scored with the exact cosine
    * against the raw vectors and ranked on the unrounded exact score.
    */
  /** Shared shortlist + exact-re-rank tail — one definition for the
    * unfiltered v134 and the filtered v143 (whose shortlist is already
    * attribute-pure because the filter ran in `sc`).
    */
  /** The shortlist/re-rank CTE chain WITHOUT the final select — so the
    * hybrid fusion oracle (t150) can keep composing CTEs on top of `rk`.
    */
  private val ivfPqRerankCtes: String =
    s""",
       short AS (
         SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY approx_r DESC, vec_id) AS srn FROM sc) t
         WHERE srn <= ${VectorOps.RerankR}),
       rr AS (
         SELECT s.query_id, s.vec_id AS neighbor_id,
           list_dot_product(qe.v, ne.v)
             / (sqrt(list_dot_product(qe.v, qe.v))
                * sqrt(list_dot_product(ne.v, ne.v))) AS ex
         FROM short s
         JOIN e qe ON qe.vec_id = s.query_id
         JOIN e ne ON ne.vec_id = s.vec_id),
       rk AS (
         SELECT query_id, neighbor_id, round(ex, 4) AS exact_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY ex DESC, neighbor_id) AS rnk FROM rr)"""

  private val ivfPqRerankTail: String = ivfPqRerankCtes +
    s"""
     SELECT query_id, neighbor_id, exact_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""

  val ivfPqRerank: String = ivfPqResidualCtes() + ivfPqRerankTail

  /** Filtered shortlist + exact re-rank (v143) matching
    * [[VectorOps.v143FilteredRerank]]: the v134 two-stage serving with
    * the v142 predicate in STAGE 1 — the shortlist CTE ranks only
    * attribute-matching scored rows, so the re-rank never has to discard
    * (and thus never under-fills).
    */
  val filteredIvfPqRerank: String =
    ivfPqResidualCtes(" AND co.label % 2 = 0") + ivfPqRerankTail

  /** Vector-family CDC (v144) matching
    * [[VectorOps.v144VecUpdateReencode]] — the ONE-SHOT twin of the
    * tombstone-heal + O(batch)-re-encode update: the coarse centroids
    * (`ic`, per-label 4dp means) and the PQ codebooks (`c0`..`c1`,
    * first-K init + one 4dp Lloyd refinement) train on the ORIGINAL
    * corpus (the frozen pre-update artifacts), while assignment,
    * encoding, queries and probes all run over the UPDATED corpus
    * (`eu`: vec_id % 5 = 2 re-embedded as list_reverse). Equality proves
    * the CDC'd index is indistinguishable from an index that always held
    * the revisions.
    */
  val vecUpdateReencode: String = {
    val m = VectorOps.PqM
    val k = VectorOps.PqK
    val sub = VectorOps.Dim / m
    val dist = "list_dot_product(s.sub, s.sub) " +
      "- 2 * list_dot_product(s.sub, c.cvec) " +
      "+ list_dot_product(c.cvec, c.cvec)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       eu AS (SELECT vec_id,
           CASE WHEN vec_id % 5 = 2 THEN list_reverse(embedding::DOUBLE[])
                ELSE embedding::DOUBLE[] END AS v
         FROM embeddings),
       ic0 AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                unnest(embedding::DOUBLE[]) AS x FROM embeddings),
       ic1 AS (SELECT label, dim, round(avg(x), 4) AS cv
              FROM ic0 GROUP BY label, dim),
       ic AS (SELECT label AS clabel, list(cv ORDER BY dim) AS cvec
             FROM ic1 GROUP BY label),
       ranked AS (SELECT vec_id, clabel,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             list_dot_product(v, cvec) / (sqrt(list_dot_product(v, v))
               * sqrt(list_dot_product(cvec, cvec))) DESC,
             clabel) AS arn
         FROM eu, ic),
       assigned AS (SELECT vec_id, clabel FROM ranked WHERE arn = 1),
       probes AS (SELECT vec_id AS query_id, clabel FROM ranked
         WHERE vec_id < 5 AND arn <= 2),
       subst AS (
         SELECT vec_id, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM e, unnest(generate_series(0, ${m - 1})) AS t(m)),
       c0 AS (
         SELECT m, CAST(vec_id AS INTEGER) AS cid,
           list_transform(sub, x -> round(x, 4)) AS cvec
         FROM subst WHERE vec_id < $k),
       a1 AS (
         SELECT vec_id, m, sub, cid FROM (
           SELECT s.vec_id, s.m, s.sub, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subst s JOIN c0 c ON s.m = c.m) t WHERE arn = 1),
       cg AS (
         SELECT m, cid, dim, round(avg(x), 4) AS cv FROM (
           SELECT m, cid,
             CAST(generate_subscripts(sub, 1) - 1 AS INTEGER) AS dim,
             unnest(sub) AS x
           FROM a1) u
         GROUP BY m, cid, dim),
       c1 AS (SELECT m, cid, list(cv ORDER BY dim) AS cvec FROM cg
              GROUP BY m, cid),
       subsu AS (
         SELECT vec_id, CAST(t.m AS INTEGER) AS m,
           list_slice(v, t.m * $sub + 1, (t.m + 1) * $sub) AS sub
         FROM eu, unnest(generate_series(0, ${m - 1})) AS t(m)),
       codes AS (
         SELECT vec_id, m, cid FROM (
           SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (PARTITION BY s.vec_id, s.m
               ORDER BY $dist, c.cid) AS arn
           FROM subsu s JOIN c1 c ON s.m = c.m) t WHERE arn = 1),
       lut AS (
         SELECT s.vec_id AS query_id, s.m, c.cid,
           round(list_dot_product(s.sub, c.cvec), 4) AS pd
         FROM subsu s JOIN c1 c ON s.m = c.m WHERE s.vec_id < 5),
       sc AS (
         SELECT l.query_id, co.vec_id, round(sum(l.pd), 4) AS approx_r
         FROM codes co
         JOIN assigned a ON a.vec_id = co.vec_id
         JOIN probes p ON p.clabel = a.clabel
         JOIN lut l ON l.m = co.m AND l.cid = co.cid
           AND l.query_id = p.query_id
         WHERE co.vec_id <> p.query_id
         GROUP BY l.query_id, co.vec_id),
       rk AS (
         SELECT query_id, vec_id AS neighbor_id, approx_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY approx_r DESC, vec_id) AS rnk FROM sc)
     SELECT query_id, neighbor_id, approx_r, rnk FROM rk WHERE rnk <= 3
     ORDER BY query_id, rnk"""
  }

  /** Link-graph PageRank (t135) matching [[TextOps.t135LinkPagerank]]:
    * the same deterministic 3-outlink graph `h48(md5(id || '#' || j)) mod
    * N` (the shared md5-prefix hash — an affine rule would make the graph
    * 3-regular in and out and PageRank degenerately uniform; self-links
    * dropped), [[TextOps.PrIters]] power iterations unrolled as CTE pairs
    * (flow fK = the INTEGER sum of 1e-6-floor-quantized per-edge terms
    * `floor(pr/outdeg · 1e6)` — integer addition is order-independent, so
    * no engine's partition/merge order can move the sum; rank pK =
    * teleport + damped inflow, 6dp-floor-truncated — the engine-exact
    * trajectory convention), teleport kept via LEFT JOIN + COALESCE for
    * inbound-less nodes.
    */
  private def pagerankSql(edgeSql: String): String = {
    val iters = (1 to TextOps.PrIters).map { i =>
      s"""f$i AS (
         SELECT e.dst AS doc_id,
           CAST(sum(CAST(floor(p.pr / od.outdeg * 1e6) AS BIGINT))
             AS BIGINT) AS inflow_q
         FROM p${i - 1} p JOIN e ON e.src = p.doc_id
         JOIN od ON od.src = e.src
         GROUP BY e.dst),
       p$i AS (
         SELECT d.doc_id,
           floor((0.15 / nn + 0.85 * (coalesce(f.inflow_q, 0) / 1e6)) * 1e6)
             / 1e6 AS pr
         FROM docs d CROSS JOIN n LEFT JOIN f$i f ON f.doc_id = d.doc_id)"""
    }.mkString(",\n       ")
    s"""WITH docs AS (SELECT doc_id FROM documents),
       n AS (SELECT count(*) AS nn FROM docs),
       e AS ($edgeSql),
       od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       p0 AS (SELECT doc_id, floor(1.0 / nn * 1e6) / 1e6 AS pr
              FROM docs CROSS JOIN n),
       $iters
     SELECT doc_id, pr FROM p${TextOps.PrIters} ORDER BY doc_id"""
  }

  val linkPagerank: String = pagerankSql(
    """SELECT src, dst FROM (
           SELECT d.doc_id AS src,
             ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || t.j::VARCHAR),
               1, 12))::BIGINT % n.nn AS dst
           FROM docs d CROSS JOIN n, unnest([0, 1, 2]) AS t(j)) x
         WHERE dst <> src""")

  /** Incremental PageRank under the t145 edge delta, matching
    * [[TextOps.t145PagerankDelta]]: the oracle is the FULL recompute over
    * the union graph (base 3-outlink edges plus the `j = 3` delta links of
    * every doc with `doc_id % 97 = 0`) — the incremental-matrix convention
    * (d84/d91/d92): the CDC'd answer must be indistinguishable from the
    * one-shot answer over the updated input. Same unrolled quantized
    * trajectory as [[linkPagerank]]; only the edge CTE differs.
    */
  val pagerankDelta: String = pagerankSql(
    """SELECT src, dst FROM (
           SELECT d.doc_id AS src,
             ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || t.j::VARCHAR),
               1, 12))::BIGINT % n.nn AS dst
           FROM docs d CROSS JOIN n, unnest([0, 1, 2]) AS t(j)
           UNION ALL
           SELECT d.doc_id AS src,
             ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || t.j::VARCHAR),
               1, 12))::BIGINT % n.nn AS dst
           FROM docs d CROSS JOIN n, unnest([3]) AS t(j)
           WHERE d.doc_id % 97 = 0) x
         WHERE dst <> src""")

  /** HITS hubs-and-authorities (t153) matching [[TextOps.t153Hits]]: the
    * same deterministic 3-outlink graph as t135, [[TextOps.HitsIters]]
    * mutual-recursion rounds unrolled as CTE triples per half-step (raw
    * BIGINT inflow sum — order-independent; 1-row integer denominator
    * `S div N`; renormalized score `(raw * 1e6) div denom` — two exact
    * integer divisions in place of the textbook L2 sqrt), authority 0 for
    * inbound-less nodes via LEFT JOIN + COALESCE. `//` is DuckDB's floor
    * integer division = Spark's `div` on positive operands. The renorm
    * multiply runs through HUGEINT — the oracle twin of the Spark side's
    * DECIMAL(38,0) intermediate (TextOps.hitsHalfStep): past the ~9.2e12
    * raw-inflow bound a BIGINT `raw * 1000000` would error in DuckDB
    * while Spark computes exactly, so both engines widen and the
    * cross-engine exactness claim holds at any scale, not just below the
    * bound.
    */
  val hits: String = {
    val rounds = (1 to TextOps.HitsIters).map { i =>
      s"""ar$i AS (
         SELECT e.dst AS doc_id, CAST(sum(h.hq) AS BIGINT) AS raw
         FROM e JOIN h${i - 1} h ON h.doc_id = e.src GROUP BY e.dst),
       ad$i AS (SELECT CAST(s.s // n.nn AS BIGINT) AS denom
                FROM (SELECT sum(raw) AS s FROM ar$i) s CROSS JOIN n),
       a$i AS (
         SELECT d.doc_id,
           CAST(coalesce((r.raw::HUGEINT * 1000000) // s.denom, 0)
             AS BIGINT) AS aq
         FROM docs d CROSS JOIN ad$i s LEFT JOIN ar$i r USING (doc_id)),
       hr$i AS (
         SELECT e.src AS doc_id, CAST(sum(a.aq) AS BIGINT) AS raw
         FROM e JOIN a$i a ON a.doc_id = e.dst GROUP BY e.src),
       hd$i AS (SELECT CAST(s.s // n.nn AS BIGINT) AS denom
                FROM (SELECT sum(raw) AS s FROM hr$i) s CROSS JOIN n),
       h$i AS (
         SELECT d.doc_id,
           CAST(coalesce((r.raw::HUGEINT * 1000000) // s.denom, 0)
             AS BIGINT) AS hq
         FROM docs d CROSS JOIN hd$i s LEFT JOIN hr$i r USING (doc_id))"""
    }.mkString(",\n       ")
    val k = TextOps.HitsIters
    s"""WITH docs AS (SELECT doc_id FROM documents),
       n AS (SELECT count(*) AS nn FROM docs),
       e AS (SELECT src, dst FROM (
           SELECT d.doc_id AS src,
             ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || t.j::VARCHAR),
               1, 12))::BIGINT % n.nn AS dst
           FROM docs d CROSS JOIN n, unnest([0, 1, 2]) AS t(j)) x
         WHERE dst <> src),
       h0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS hq FROM docs),
       $rounds
     SELECT a.doc_id, a.aq AS auth_q, h.hq AS hub_q
     FROM a$k a JOIN h$k h USING (doc_id)
     ORDER BY a.doc_id"""
  }

  /** DSIR importance-resampling selection (t152) matching
    * [[TextOps.t152DsirSelect]]: adjacent-word bigrams (an index-offset
    * self-join here; the Spark side builds them map-side with zip_with —
    * same pairs) hashed into [[TextOps.DsirBuckets]] md5-prefix buckets,
    * add-1-smoothed target/raw bag counts, the integer probability-ratio
    * per-feature score `((c_t+1) * 1e6) // (c_r+1)`, per-doc BIGINT sums,
    * top-[[TextOps.DsirK]] on (weight DESC, doc_id).
    */
  val dsirSelect: String = dsirSelectSqlOn("documents")

  /** The t152 selection SQL over an arbitrary doc source — `documents`
    * for t152, the decontaminated pool for t168 ([[cleanSelect]]).
    * `prelude` holds extra leading CTEs the source may reference (the
    * [[bigramLmWith]] convention, trailing comma included): `src` is
    * inlined twice below (the base and topk CTEs), so a source with any
    * real cost should be hoisted into a named CTE and referenced.
    */
  private def dsirSelectSqlOn(src: String, prelude: String = ""): String = {
    val b = TextOps.DsirBuckets
    val k = TextOps.DsirK
    val tgt = TextOps.DsirTargetSource
    s"""WITH ${prelude}base AS (
         SELECT doc_id, source = '$tgt' AS is_target,
           string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM $src),
       tok AS (
         SELECT doc_id, is_target,
           generate_subscripts(ws, 1) AS i, unnest(ws) AS w
         FROM base),
       feats AS (
         SELECT a.doc_id, a.is_target,
           ('0x' || substr(md5(a.w || ' ' || b.w), 1, 12))::BIGINT % $b AS b
         FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
       ct AS (SELECT b, count(*) AS c_t FROM feats WHERE is_target
              GROUP BY b),
       cr AS (SELECT b, count(*) AS c_r FROM feats WHERE NOT is_target
              GROUP BY b),
       wq AS (
         SELECT coalesce(ct.b, cr.b) AS b,
           ((coalesce(c_t, 0) + 1) * 1000000) // (coalesce(c_r, 0) + 1)
             AS w_q
         FROM ct FULL JOIN cr ON ct.b = cr.b),
       sums AS (
         SELECT f.doc_id, CAST(sum(w.w_q) AS BIGINT) AS dsir_q
         FROM feats f JOIN wq w USING (b)
         WHERE NOT f.is_target GROUP BY f.doc_id),
       topk AS (
         SELECT p.doc_id, coalesce(s.dsir_q, 0) AS dsir_q
         FROM (SELECT doc_id FROM $src WHERE source <> '$tgt') p
         LEFT JOIN sums s USING (doc_id)
         ORDER BY dsir_q DESC, doc_id LIMIT $k)
     SELECT doc_id, CAST(dsir_q AS BIGINT) AS dsir_q,
       CAST(row_number() OVER (ORDER BY dsir_q DESC, doc_id) AS BIGINT)
         AS rnk
     FROM topk ORDER BY rnk"""
  }

  /** Held-out bigram LM scoring with backoff (t157) matching
    * [[TextOps.t157BigramLm]]: adjacent-word pairs (index-offset
    * self-join; the Spark side builds them map-side — same pairs), model
    * counts from the even-doc_id half only, per-position integer info_q
    * (seen bigram: (c1(w1)·100) // c2; unseen: penalty + unigram info
    * with OOV dividing by 1), per-doc counts and the 4dp-floor average.
    */
  val bigramLm: String = bigramLmWith("doc_id % 2 = 0")

  /** The t157 LM SQL at a GIVEN train-membership condition (and optional
    * extra leading CTEs the condition may reference) — the SQL twin of
    * [[TextOps.lmScoreFrom]]'s `trainFilter` parameter: [[bigramLm]] is
    * the parity default; [[lmLeakageFold]] composes t138's fold.
    */
  def bigramLmWith(trainCond: String, prelude: String = ""): String = {
    val pen = TextOps.BackoffPenaltyQ
    s"""WITH ${prelude}base AS (
         SELECT doc_id,
           string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM documents),
       tok AS (
         SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
         FROM base),
       pairs AS (
         SELECT a.doc_id, a.w AS w1, b.w AS w2
         FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
       c1 AS (SELECT w, count(*) AS c FROM tok WHERE $trainCond
              GROUP BY w),
       n AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM c1),
       c2 AS (SELECT w1, w2, count(*) AS c2 FROM pairs
              WHERE $trainCond GROUP BY w1, w2),
       scored AS (
         SELECT p.doc_id,
           CASE WHEN c2.c2 IS NOT NULL THEN (u1.c * 100) // c2.c2
                ELSE $pen + (n.nt * 100) // coalesce(u2.c, 1) END AS info_q,
           CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS bo
         FROM pairs p CROSS JOIN n
         LEFT JOIN c2 ON c2.w1 = p.w1 AND c2.w2 = p.w2
         LEFT JOIN c1 u1 ON u1.w = p.w1
         LEFT JOIN c1 u2 ON u2.w = p.w2),
       agg AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(bo) AS BIGINT) AS n_backoff,
           floor(avg(info_q) * 1e4) / 1e4 AS lm2_score
         FROM scored GROUP BY doc_id)
     SELECT d.doc_id,
       coalesce(a.n_scored, 0) AS n_scored,
       coalesce(a.n_backoff, 0) AS n_backoff,
       coalesce(a.lm2_score, 0.0) AS lm2_score
     FROM documents d LEFT JOIN agg a USING (doc_id)
     ORDER BY d.doc_id"""
  }

  /** Quality-keeper near-dup resolution (d137) matching
    * [[TextOps.d137QualityKeeper]]: the d46 reachability chain for
    * component labels, the t21 truncated quality score, keeper = first row
    * per component on (quality DESC, doc_id).
    */
  val qualityKeeper: String =
    s"""WITH RECURSIVE $ccCtes,
       q AS (
         SELECT doc_id,
           floor((0.4 * least(len(string_split_regex(trim(lower(text)),
                 '\\s+')) / 100.0, 1.0)
             + 0.3 * (len(regexp_extract_all(lower(text),
                 '\\b(the|a|of|and|to|in|is)\\b')) * 1.0
               / len(string_split_regex(trim(lower(text)), '\\s+')))
             + 0.3 * least((length(regexp_replace(text, '\\s', '', 'g'))
                 * 1.0
               / len(string_split_regex(trim(lower(text)), '\\s+'))) / 8.0,
               1.0)) * 10000) / 10000 AS quality
         FROM documents),
       k AS (
         SELECT component, doc_id AS keeper_id FROM (
           SELECT c.component, c.doc_id,
             row_number() OVER (PARTITION BY c.component
               ORDER BY q.quality DESC, c.doc_id) AS rn
           FROM comp c JOIN q USING (doc_id)) t WHERE rn = 1)
     SELECT c.doc_id, c.component, q.quality,
       c.doc_id = k.keeper_id AS keeper
     FROM comp c JOIN q USING (doc_id) JOIN k USING (component)
     ORDER BY c.doc_id"""

  /** Leakage-aware split (t138) matching [[TextOps.t138LeakageSplit]]:
    * group key = component label for clustered docs / own doc_id
    * otherwise, t66's h48-mod-100 rule on the group key.
    */
  val leakageSplit: String =
    s"""WITH RECURSIVE $ccCtes,
       g AS (
         SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_key
         FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
     SELECT doc_id, group_key,
       ('0x' || substr(md5(group_key::VARCHAR), 1, 12))::BIGINT % 100
         AS bucket,
       CASE
         WHEN ('0x' || substr(md5(group_key::VARCHAR), 1, 12))::BIGINT % 100
           < 80 THEN 'train'
         WHEN ('0x' || substr(md5(group_key::VARCHAR), 1, 12))::BIGINT % 100
           < 90 THEN 'valid'
         ELSE 'test' END AS split
     FROM g ORDER BY doc_id"""

  /** Leakage-fold bigram LM (t161) matching [[TextOps.t161LmLeakageFold]]:
    * t157's LM SQL ([[bigramLmWith]]) with train membership = t138's
    * `split = 'train'` rows — the whole [[leakageSplit]] query composed
    * verbatim as a derived table inside one `fold` CTE (the t159
    * composition convention), referenced by both model-count CTEs.
    */
  val lmLeakageFold: String = bigramLmWith(
    "doc_id IN (SELECT doc_id FROM fold)",
    s"""fold AS (
         SELECT doc_id FROM ($leakageSplit) z WHERE split = 'train'),
       """)

  /** Priority sample (t136) matching [[TextOps.t136PrioritySample]]: the
    * identical dyadic u = (h48+1)/2^48 and u/n_chars key (one IEEE
    * division, no transcendentals — bit-equal across engines), k smallest.
    */
  val prioritySample: String =
    s"""WITH keyed AS (
         SELECT doc_id, n_chars,
           ((('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT + 1)
              ::DOUBLE / 281474976710656.0) / n_chars::DOUBLE AS pkey
         FROM documents)
     SELECT doc_id, n_chars, pkey,
       row_number() OVER (ORDER BY pkey, doc_id) AS rnk
     FROM keyed ORDER BY pkey, doc_id LIMIT ${TextOps.SampleK}"""

  /** Brute-force exact cosine candidate set (standalone SELECT) — ground
    * truth for [[annRecall]]/[[annFrontier]], ranked top-5 in
    * [[cosineTopK]].
    */
  val bruteCands: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM e),
           q AS (SELECT vec_id AS query_id, v AS qv, nv AS nq FROM n
                 WHERE vec_id < 10)
         SELECT q.query_id, n.vec_id AS neighbor_id,
             list_dot_product(qv, v) / (nq * nv) AS sim
         FROM n, q WHERE n.vec_id <> q.query_id"""

  /** Brute-force exact cosine top-5 (v28). */
  val cosineTopK: String =
    s"""WITH r AS (SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rnk FROM ($bruteCands) sims)
         SELECT query_id, neighbor_id, round(sim, 4) AS sim_r, rnk
         FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""

  /** ANN recall report (v80): recall@3 of LSH/IVF/PQ candidates vs the
    * exact brute-force top-3, composed from the member queries' own oracle
    * SQL (each nested as a scoped subquery, so CTE names cannot collide).
    * PQ is only evaluated on its own query domain (vec_id < 5).
    */
  def annRecall: String =
    s"""WITH exact AS (
         SELECT query_id, list(neighbor_id) AS exact3
         FROM ($cosineTopK) x WHERE rnk <= 3 GROUP BY query_id),
       lsh AS (SELECT query_id, 'lsh' AS method, list(neighbor_id) AS approx3
               FROM ($annLsh) x GROUP BY query_id),
       ivf AS (SELECT query_id, 'ivf' AS method, list(neighbor_id) AS approx3
               FROM ($ivfAnn) x GROUP BY query_id),
       pq AS (SELECT query_id, 'pq' AS method, list(neighbor_id) AS approx3
              FROM ($pqAnn) x GROUP BY query_id),
       m AS (SELECT * FROM lsh UNION ALL SELECT * FROM ivf
             UNION ALL SELECT * FROM pq),
       qm AS (SELECT query_id, exact3, method
              FROM exact, (VALUES ('lsh'), ('ivf'), ('pq')) AS mm(method)
              WHERE NOT (method = 'pq' AND query_id >= 5))
     SELECT qm.query_id, qm.method,
       CAST(COALESCE(len(m.approx3), 0) AS BIGINT) AS n_cand,
       CAST(COALESCE(len(list_intersect(qm.exact3, m.approx3)), 0) AS BIGINT)
         AS hits3,
       COALESCE(floor(len(list_intersect(qm.exact3, m.approx3))
         * 1.0 / 3 * 10000) / 10000, 0.0) AS recall3
     FROM qm LEFT JOIN m ON m.query_id = qm.query_id AND m.method = qm.method
     ORDER BY qm.query_id, qm.method"""

  /** LSH same-bucket candidate set (standalone SELECT) — shared by
    * [[annLsh]] (ranked top-3) and [[annFrontier]].
    */
  val lshCands: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       nb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv,
                $bucketExpr AS bucket FROM e),
       qb AS (SELECT vec_id AS query_id, v AS qv, nv AS nq, bucket AS qbucket
              FROM nb WHERE vec_id < 10)
     SELECT q.query_id, n.vec_id AS neighbor_id,
         list_dot_product(qv, n.v) / (nq * n.nv) AS sim
     FROM nb n JOIN qb q ON n.bucket = q.qbucket
       AND n.vec_id <> q.query_id"""

  val annLsh: String =
    s"""WITH r AS (SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neighbor_id) AS rnk FROM ($lshCands) sims)
     SELECT query_id, neighbor_id, round(sim, 4) AS sim_r, rnk
     FROM r WHERE rnk <= 3 ORDER BY query_id, rnk"""

  /** ANN recall/cost frontier (v82): per method and k ∈ {1,3,10}, recall@k
    * vs exact search plus the candidate count the method scored — every
    * operating point derived from ONE ranked top-10 per (query, method),
    * built from the same candidate subqueries the member oracles rank.
    */
  def annFrontier: String = {
    def m(c: String, name: String) =
      s"""SELECT query_id, '$name' AS method,
           list(neighbor_id ORDER BY rnk) FILTER (WHERE rnk <= 10) AS ids10,
           count(*) AS n_cand
         FROM (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS rnk
               FROM ($c) cc) r
         GROUP BY query_id"""
    s"""WITH exact AS (
         SELECT query_id,
           list(neighbor_id ORDER BY rnk) FILTER (WHERE rnk <= 10) AS exact10
         FROM (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS rnk
               FROM ($bruteCands) bc) r
         GROUP BY query_id),
       mlsh AS (${m(lshCands, "lsh")}),
       mivf AS (${m(ivfCands, "ivf")}),
       mpq AS (${m(pqCands, "pq")}),
       mm AS (SELECT * FROM mlsh UNION ALL SELECT * FROM mivf
              UNION ALL SELECT * FROM mpq),
       qm AS (SELECT query_id, exact10, method
              FROM exact, (VALUES ('lsh'), ('ivf'), ('pq')) AS vm(method)
              WHERE NOT (method = 'pq' AND query_id >= 5)),
       kk AS (SELECT CAST(unnest([1, 3, 10]) AS BIGINT) AS k)
     SELECT qm.query_id, qm.method, kk.k,
       CAST(COALESCE(mm.n_cand, 0) AS BIGINT) AS n_cand,
       CAST(COALESCE(len(list_intersect(qm.exact10[1:kk.k],
         mm.ids10[1:kk.k])), 0) AS BIGINT) AS hits,
       COALESCE(floor(len(list_intersect(qm.exact10[1:kk.k],
         mm.ids10[1:kk.k])) * 1.0 / kk.k * 10000) / 10000, 0.0) AS recall
     FROM qm CROSS JOIN kk
     LEFT JOIN mm ON mm.query_id = qm.query_id AND mm.method = qm.method
     ORDER BY qm.query_id, qm.method, kk.k"""
  }

  /** Full five-modality composed gate (d118) matching
    * [[graft.multimodal.Multimodal.d118FullMultimodalGate]]: the d106
    * composition widened to every modality — text-exact keeper, image /
    * audio / video duplicate-cluster representatives (three reachability
    * chains over the three analytic pair sets), and the canonical-URL
    * keeper; kept = the conjunction. Each sub-oracle is the SAME SQL the
    * individual queries are checked against.
    */
  val fullMultimodalGate: String =
    s"""WITH RECURSIVE ${ccChain(imageNearDup, "i")},
       ${ccChain(audioNearDup, "a")},
       ${ccChain(videoOverlap, "v")},
       fp AS (
         SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fp
         FROM documents),
       fk AS (SELECT fp, min(doc_id) AS tkeeper FROM fp GROUP BY fp),
       tv AS (
         SELECT fp.doc_id, fp.doc_id = fk.tkeeper AS keep_text
         FROM fp JOIN fk ON fp.fp IS NOT DISTINCT FROM fk.fp),
       uv AS (SELECT doc_id, keeper AS keep_url FROM ($urlDedup) u)
     SELECT tv.doc_id, tv.keep_text,
       (icomp.component IS NULL OR icomp.component = tv.doc_id)
         AS keep_image,
       (acomp.component IS NULL OR acomp.component = tv.doc_id)
         AS keep_audio,
       (vcomp.component IS NULL OR vcomp.component = tv.doc_id)
         AS keep_video,
       uv.keep_url,
       (tv.keep_text
         AND (icomp.component IS NULL OR icomp.component = tv.doc_id)
         AND (acomp.component IS NULL OR acomp.component = tv.doc_id)
         AND (vcomp.component IS NULL OR vcomp.component = tv.doc_id)
         AND uv.keep_url) AS kept
     FROM tv
     JOIN uv USING (doc_id)
     LEFT JOIN icomp ON icomp.doc_id = tv.doc_id
     LEFT JOIN acomp ON acomp.doc_id = tv.doc_id
     LEFT JOIN vcomp ON vcomp.doc_id = tv.doc_id
     ORDER BY tv.doc_id"""

  /** Training-manifest capstone (t125) matching
    * [[graft.ops.TextOps.t125TrainingManifest]]: the five sub-oracles
    * composed verbatim — the t100 rank-form cap, the d118 gate (nested as
    * a derived table, recursive CTEs and all), the t72 rate formula over
    * the gated corpus, the t88 seeded shard/order keys, and the t69
    * cumsum packing in shuffle order. Window sums cast to BIGINT at the
    * source (DuckDB widens to HUGEINT otherwise).
    */
  val trainingManifest: String = manifestSqlWith("", "")

  /** Curated-manifest capstone (t159) matching
    * [[graft.ops.TextOps.t159CuratedManifest]]: the t125 oracle with the
    * t152 DSIR chain composed ahead of the cap — the selection CTE is
    * the dsirSelect oracle verbatim (as a derived table) unioned with
    * the target source, joined into the manifest's survivor stage.
    */
  val curatedManifest: String = manifestSqlWith(
    s"""dsel AS (
         SELECT doc_id FROM ($dsirSelect) zsel
         UNION ALL
         SELECT doc_id FROM documents
         WHERE source = '${TextOps.DsirTargetSource}'),
       """,
    "JOIN dsel USING (doc_id)")

  /** The t125 manifest SQL, parameterized by an optional selection CTE
    * (prepended to the WITH chain) and its join into the survivor stage
    * `s1` — the shared body of [[trainingManifest]] (no selection) and
    * [[curatedManifest]] (the DSIR keep set enters ahead of the cap).
    */
  private def manifestSqlWith(selCte: String, selJoin: String): String =
    s"""WITH ${selCte}h100 AS (
         SELECT doc_id, source,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cap'), 1, 12))::BIGINT
             AS h
         FROM documents),
       p0 AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           ('0x' || substr(md5(source || ':policy'), 1, 12))::BIGINT % 10
             AS pdraw
         FROM documents GROUP BY source),
       p AS (
         SELECT source,
           CASE WHEN pdraw < 2 THEN 'drop'
                WHEN pdraw < 6 THEN 'cap'
                ELSE 'keep' END AS policy,
           CASE WHEN pdraw >= 2 AND pdraw < 6
                THEN (n_docs * 7) // 10 END AS cap
         FROM p0),
       r100 AS (
         SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY h % 100, h, doc_id) AS BIGINT) AS rk
         FROM h100),
       capkeep AS (
         SELECT r.doc_id FROM r100 r JOIN p USING (source)
         WHERE CASE p.policy WHEN 'drop' THEN FALSE
               WHEN 'keep' THEN TRUE
               ELSE r.rk <= p.cap END),
       gate AS (SELECT doc_id FROM ($fullMultimodalGate) g WHERE g.kept),
       s1 AS (
         SELECT d.doc_id, d.lang,
           CAST(len(string_split_regex(trim(lower(d.text)), '\\s+'))
             AS BIGINT) AS n_tokens
         FROM documents d
         JOIN capkeep USING (doc_id)
         JOIN gate USING (doc_id) $selJoin),
       lc AS (SELECT lang, count(*) AS n_docs FROM s1 GROUP BY 1),
       lm AS (SELECT min(n_docs) AS n_min FROM lc),
       lr AS (
         SELECT lang,
           CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) * 1000) AS BIGINT)
             AS keep_permille
         FROM lc CROSS JOIN lm),
       mx AS (
         SELECT s1.doc_id, s1.n_tokens FROM s1 JOIN lr USING (lang)
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 12))::BIGINT
             % 1000 < lr.keep_permille),
       sh AS (
         SELECT doc_id, n_tokens,
           ('0x' || substr(md5('graft-shuffle-42:'
             || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS order_key
         FROM mx),
       o AS (
         SELECT doc_id, CAST(order_key % 8 AS INTEGER) AS shard, n_tokens,
           CAST(row_number() OVER (PARTITION BY order_key % 8
             ORDER BY order_key, doc_id) AS BIGINT) AS ord,
           CAST(sum(n_tokens) OVER (PARTITION BY order_key % 8
             ORDER BY order_key, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             - n_tokens AS start_tok
         FROM sh)
     SELECT doc_id, shard, ord, n_tokens,
       CAST(floor(start_tok / 512.0) AS BIGINT) AS pack_id,
       CAST(start_tok % 512 AS BIGINT) AS pack_offset
     FROM o ORDER BY shard, ord"""

  /** Shared BPE CTE chain matching [[graft.ops.BpeOps.learnBpe]]: the
    * alpha-word frequency vocabulary with `' s1, s2, …, _,'`-rendered
    * symbol sequences, then [[graft.ops.BpeOps.BpeMerges]] learning rounds
    * unrolled as CTE triples — pN = weighted adjacent-pair counts over
    * vN−1 (BIGINT, integer-exact), bN = the argmax on (cnt DESC, pair),
    * vN = the vocab with rule N applied via ONE literal `replace` on the
    * rendered sequence (identical non-overlapping left-to-right semantics
    * in DuckDB and Spark; see the BpeOps class note for why the
    * `' a, b,'` delimiters make that exactly leftmost-greedy BPE).
    */
  private def bpeCtesFor(corpusWhere: String): String = {
    val rounds = (1 to graft.ops.BpeOps.BpeMerges).map { r =>
      s"""p$r AS (
         SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
           SELECT freq,
             unnest(list_transform(range(1, len(syms)),
               i -> syms[i] || ' ' || syms[i + 1])) AS pair
           FROM (SELECT freq,
                   string_split(substr(seq, 2, length(seq) - 2), ', ')
                     AS syms
                 FROM v${r - 1}) y) x
         GROUP BY pair),
       b$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
       v$r AS (
         SELECT word, freq,
           replace(seq, ' ' || replace(b.pair, ' ', ', ') || ',',
             ' ' || replace(b.pair, ' ', '') || ',') AS seq
         FROM v${r - 1}, b$r b)"""
    }.mkString(",\n       ")
    s"""w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
           AS word FROM documents $corpusWhere),
       v0 AS (
         SELECT word, CAST(count(*) AS BIGINT) AS freq,
           regexp_replace(word, '(.)', ' \\1,', 'g') || ' _,' AS seq
         FROM w WHERE regexp_full_match(word, '[a-z]+') GROUP BY word),
       $rounds"""
  }

  private val bpeCtes: String = bpeCtesFor("")

  /** BPE merge-rule learning (t139) matching
    * [[graft.ops.BpeOps.t139BpeLearn]]: the K learned rules in order with
    * their winning pair counts.
    */
  val bpeLearn: String = {
    val rows = (1 to graft.ops.BpeOps.BpeMerges).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS rnk, pair,
           replace(pair, ' ', '') AS merged, cnt FROM b$r"""
    }.mkString("\n       UNION ALL\n       ")
    s"""WITH $bpeCtes
     SELECT rnk, pair, merged, cnt FROM (
       $rows) u ORDER BY rnk"""
  }

  /** Per-doc piece CTEs shared by [[bpeTokenize]] and [[bpePack]] —
    * matching [[graft.ops.BpeOps]]' `bpePieces`: positions from the
    * whitespace split, alpha words joined to the final vocab's merged
    * sequences, anything else one opaque `' word,'` token.
    */
  private val bpePieceCtes: String =
    s"""$bpeCtes,
       tok AS (
         SELECT word, seq,
           CAST(len(string_split(substr(seq, 2, length(seq) - 2), ', '))
             AS BIGINT) AS n_toks
         FROM v${graft.ops.BpeOps.BpeMerges}),
       dw AS (
         SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS word
         FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+')
                 AS ws
               FROM documents) dd),
       pieces AS (
         SELECT dw.doc_id, dw.pos,
           CASE WHEN t.seq IS NOT NULL THEN t.seq
                ELSE ' ' || dw.word || ',' END AS piece,
           CASE WHEN t.seq IS NOT NULL THEN t.n_toks ELSE 1 END AS n_toks,
           t.seq IS NOT NULL AS alpha
         FROM dw LEFT JOIN tok t ON t.word = dw.word)"""

  /** Corpus tokenization under the frozen merges (t140) matching
    * [[graft.ops.BpeOps.t140BpeTokenize]]: per-doc word / alpha / BPE
    * token counts plus the md5 of the document-order rendered token
    * stream.
    */
  val bpeTokenize: String =
    s"""WITH $bpePieceCtes
     SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
       CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens,
       md5(string_agg(piece, '' ORDER BY pos)) AS fp
     FROM pieces GROUP BY doc_id ORDER BY doc_id"""

  /** BPE-budget sequence packing (t141) matching
    * [[graft.ops.BpeOps.t141BpePack]]: t69's sharded greedy packing with
    * per-doc BPE token counts as the measure.
    */
  val bpePack: String =
    s"""WITH $bpePieceCtes,
       dt AS (
         SELECT doc_id, doc_id % 16 AS shard,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens
         FROM pieces GROUP BY doc_id),
       c AS (
         SELECT doc_id, shard, n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             - n_tokens AS start_tok
         FROM dt)
     SELECT doc_id, shard, n_tokens,
       CAST(floor(start_tok / 512.0) AS BIGINT) AS pack_id,
       CAST(start_tok % 512 AS BIGINT) AS pack_offset
     FROM c ORDER BY doc_id"""

  /** Held-out tokenization under train-learned merges (t146) matching
    * [[graft.ops.BpeOps.t146BpeHeldout]]: the learning CTEs run over the
    * TRAIN split only (`doc_id % 10 <> 9`), then the held-out split's
    * distinct alpha words are tokenized by applying the learned rules
    * b1..bK in order — the same K literal replace stages the Spark side
    * folds map-side — and the held-out docs join to that word table.
    */
  val bpeHeldout: String = {
    val k = graft.ops.BpeOps.BpeMerges
    val hRounds = (1 to k).map { r =>
      s"""h$r AS (
         SELECT word,
           replace(seq, ' ' || replace(b.pair, ' ', ', ') || ',',
             ' ' || replace(b.pair, ' ', '') || ',') AS seq
         FROM h${r - 1}, b$r b)"""
    }.mkString(",\n       ")
    s"""WITH ${bpeCtesFor("WHERE doc_id % 10 <> 9")},
       hd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 9),
       h0 AS (
         SELECT word,
           regexp_replace(word, '(.)', ' \\1,', 'g') || ' _,' AS seq
         FROM (SELECT DISTINCT unnest(string_split_regex(trim(lower(text)),
                 '\\s+')) AS word
               FROM hd) hw
         WHERE regexp_full_match(word, '[a-z]+')),
       $hRounds,
       htok AS (
         SELECT word, seq,
           CAST(len(string_split(substr(seq, 2, length(seq) - 2), ', '))
             AS BIGINT) AS n_toks
         FROM h$k),
       dw AS (
         SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS word
         FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+')
                 AS ws
               FROM hd) dd),
       pieces AS (
         SELECT dw.doc_id, dw.pos,
           CASE WHEN t.seq IS NOT NULL THEN t.seq
                ELSE ' ' || dw.word || ',' END AS piece,
           CASE WHEN t.seq IS NOT NULL THEN t.n_toks ELSE 1 END AS n_toks,
           t.seq IS NOT NULL AS alpha
         FROM dw LEFT JOIN htok t ON t.word = dw.word)
     SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
       CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens,
       md5(string_agg(piece, '' ORDER BY pos)) AS fp
     FROM pieces GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Token-budget chunking (t147) matching
    * [[graft.ops.BpeOps.t147BpeChunk]]: per-doc cumulative BPE token
    * offsets over the piece stream, chunk = the 64-token budget window the
    * word's first token starts in, per-chunk counts + position span + the
    * md5 of the chunk's rendered stream.
    */
  val bpeChunk: String =
    s"""WITH $bpePieceCtes,
       c AS (
         SELECT doc_id, pos, piece, n_toks,
           CAST(sum(n_toks) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             - n_toks AS start_tok
         FROM pieces)
     SELECT doc_id,
       CAST(floor(start_tok / 64.0) AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       CAST(min(pos) AS BIGINT) AS first_pos,
       CAST(max(pos) AS BIGINT) AS last_pos,
       md5(string_agg(piece, '' ORDER BY pos)) AS fp
     FROM c GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id"""

  /** Tokenizer efficiency by source (t148) matching
    * [[graft.ops.BpeOps.t148BpeEfficiency]]: per-source char/token/word
    * sums with permille-quantized compression (chars per BPE token) and
    * fertility (BPE tokens per word) ratios.
    */
  val bpeEfficiency: String =
    s"""WITH $bpePieceCtes,
       ds AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens
         FROM pieces GROUP BY doc_id),
       j AS (
         SELECT d.source, d.n_chars, s.n_words, s.n_bpe_tokens
         FROM documents d JOIN ds s USING (doc_id))
     SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS sum_toks,
       CAST(sum(n_words) AS BIGINT) AS sum_words,
       (CAST(sum(n_chars) AS BIGINT) * 1000)
         // CAST(sum(n_bpe_tokens) AS BIGINT) AS chars_per_tok_q,
       (CAST(sum(n_bpe_tokens) AS BIGINT) * 1000)
         // CAST(sum(n_words) AS BIGINT) AS toks_per_word_q
     FROM j GROUP BY source ORDER BY source"""

  /** BM25 retrieval scoring (t149) matching
    * [[graft.ops.TextOps.t149Bm25]]: the 10 rarest df≥3 terms as queries,
    * Okapi BM25 (k1=1.2, b=0.75) with the t71-quantized integer idf and a
    * floor(·1e6)-quantized score — the float chain is a fixed IEEE
    * expression tree over exact integers (no float summation), so both
    * engines produce bit-equal doubles before the quantization.
    */
  val bm25: String =
    s"""WITH t AS (
         SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM t GROUP BY 1, 2),
       dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
              FROM tf GROUP BY 1),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       qt AS (
         SELECT term, CAST(count(*) AS BIGINT) AS df
         FROM tf GROUP BY 1 HAVING count(*) >= 3
         ORDER BY df ASC, term LIMIT 10),
       sc AS (
         SELECT t2.term, t2.doc_id, t2.tf, d.dl,
           (s.n_docs * 100) // q.df AS idf_q,
           CAST(floor(CAST((s.n_docs * 100) // q.df AS DOUBLE) *
             ((CAST(t2.tf AS DOUBLE) * 2.2) /
              (CAST(t2.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
               ((CAST(d.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE))
                 / CAST(s.sum_dl AS DOUBLE))))) *
             1000000.0) AS BIGINT) AS score_q
         FROM tf t2 JOIN qt q USING (term) JOIN dl d USING (doc_id)
         CROSS JOIN st s),
       r AS (
         SELECT *, CAST(row_number() OVER (
           PARTITION BY term ORDER BY score_q DESC, doc_id) AS BIGINT) AS rn
         FROM sc)
     SELECT term, doc_id, tf, dl, idf_q, score_q, rn
     FROM r WHERE rn <= 5 ORDER BY term, rn"""

  /** Hybrid lexical+dense retrieval fusion (t150) matching
    * [[graft.ops.FusionOps.t150HybridFusion]]: the dense half is v134's
    * exact-re-ranked top-3 (the shared residual-IVFADC CTEs up to `rk`,
    * so the two oracles cannot drift), the lexical half is
    * query-by-document BM25 — each query doc's 3 rarest df≥3 terms as a
    * pseudo-query, summed per-term t149 scores per candidate doc (BIGINT
    * sums, self excluded), top-5 per query — and the fusion is
    * reciprocal-rank fusion with each 1/(60+rank) term integer-quantized
    * as 1000000 // (60+rank) (the idf_q convention), summed over the two
    * modalities and ranked (rrf DESC, doc_id). Absent modalities
    * contribute 0 and surface as rank 0 in the output.
    */
  val hybridFusion: String = ivfPqResidualCtes() + ivfPqRerankCtes +
    fusionTail("")

  /** Attribute-filtered hybrid fusion (t160) matching
    * [[graft.ops.FusionOps.t160FilteredFusion]]: the v143 filtered dense
    * chain (predicate in the ADC stage) composed with the t150 lexical
    * chain whose per-query candidate sums are restricted to the
    * allowed-id set BELOW the score and ABOVE the rank — both halves'
    * statistics stay whole-corpus (the v142 convention).
    */
  val filteredFusion: String =
    ivfPqResidualCtes(" AND co.label % 2 = 0") + ivfPqRerankCtes +
      fusionTail(""" AND c.doc_id IN
           (SELECT vec_id FROM embeddings WHERE label % 2 = 0)""")

  /** The exact-dense `rk` chain matching [[VectorOps.exactDenseTop3]]:
    * brute-force cosine over the fusion query set (vec_id < 5, self
    * excluded), ranked on the unrounded score — a drop-in replacement
    * for the residual-IVFADC + re-rank chain's `rk`, so
    * [[fusionTail]] composes the ground-truth fusion from it verbatim.
    */
  private val exactDenseCtes: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       xnb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv
               FROM e),
       xq AS (SELECT vec_id AS query_id, v AS qv, nv AS nq FROM xnb
              WHERE vec_id < 5),
       xrr AS (
         SELECT q.query_id, n.vec_id AS neighbor_id,
           list_dot_product(qv, v) / (nq * nv) AS ex
         FROM xnb n, xq q WHERE n.vec_id <> q.query_id),
       rk AS (
         SELECT query_id, neighbor_id, round(ex, 4) AS exact_r,
           row_number() OVER (PARTITION BY query_id
             ORDER BY ex DESC, neighbor_id) AS rnk FROM xrr)"""

  /** Fused-ranking recall report (t162) matching
    * [[graft.ops.FusionOps.t162FusionRecall]]: the t150 fusion
    * ([[hybridFusion]], approximate dense side) and the ground-truth
    * fusion (same tail over [[exactDenseCtes]]) each composed verbatim
    * as derived tables, per-query slot overlap, 4dp-floor recall and
    * the in-row recall_ok flag at
    * [[graft.ops.FusionOps.FusedRecallMinHits]].
    */
  val fusedRecall: String = {
    val gt = exactDenseCtes + fusionTail("")
    s"""WITH ap AS (
         SELECT query_id, list(doc_id ORDER BY doc_id) AS aset
         FROM ($hybridFusion) a GROUP BY query_id),
       gt AS (
         SELECT query_id, list(doc_id ORDER BY doc_id) AS gset
         FROM ($gt) g GROUP BY query_id),
       j AS (
         SELECT ap.query_id,
           CAST(len(list_intersect(ap.aset, gt.gset)) AS BIGINT) AS hits3
         FROM ap JOIN gt USING (query_id))
     SELECT query_id, hits3,
       floor(hits3 * 1.0 / 3 * 10000) / 10000 AS recall3,
       hits3 >= ${graft.ops.FusionOps.FusedRecallMinHits} AS recall_ok
     FROM j ORDER BY query_id"""
  }

  /** The lexical + RRF CTE tail over the dense chain's `rk` — shared by
    * [[hybridFusion]] (no candidate restriction) and [[filteredFusion]]
    * (`lexRestrict` narrows the per-query candidate sums).
    */
  private def fusionTail(lexRestrict: String): String =
    s""",
       dense AS (
         SELECT query_id, neighbor_id AS doc_id, rnk AS dense_rn
         FROM rk WHERE rnk <= 3),
       lxt AS (
         SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
         FROM documents),
       lxtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM lxt GROUP BY 1, 2),
       lxdl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
              FROM lxtf GROUP BY 1),
       lxst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(dl) AS BIGINT) AS sum_dl FROM lxdl),
       lxdf AS (
         SELECT term, CAST(count(*) AS BIGINT) AS df
         FROM lxtf GROUP BY 1 HAVING count(*) >= 3),
       lxq AS (
         SELECT query_id, term FROM (
           SELECT t.doc_id AS query_id, t.term,
             row_number() OVER (PARTITION BY t.doc_id
               ORDER BY d.df ASC, t.term) AS qrn
           FROM lxtf t JOIN lxdf d USING (term)
           WHERE t.doc_id < 5) z
         WHERE qrn <= 3),
       lxsc AS (
         SELECT t2.term, t2.doc_id,
           CAST(floor(CAST((s.n_docs * 100) // d.df AS DOUBLE) *
             ((CAST(t2.tf AS DOUBLE) * 2.2) /
              (CAST(t2.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
               ((CAST(l.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE))
                 / CAST(s.sum_dl AS DOUBLE))))) *
             1000000.0) AS BIGINT) AS score_q
         FROM lxtf t2
         JOIN (SELECT DISTINCT term FROM lxq) qt USING (term)
         JOIN lxdf d USING (term)
         JOIN lxdl l USING (doc_id)
         CROSS JOIN lxst s),
       lxs AS (
         SELECT q.query_id, c.doc_id,
           CAST(sum(c.score_q) AS BIGINT) AS lex_q
         FROM lxsc c JOIN lxq q USING (term)
         WHERE c.doc_id <> q.query_id$lexRestrict
         GROUP BY 1, 2),
       lx AS (
         SELECT query_id, doc_id, lex_rn FROM (
           SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY lex_q DESC, doc_id) AS BIGINT) AS lex_rn
           FROM lxs) z
         WHERE lex_rn <= 5),
       fu AS (
         SELECT coalesce(l.query_id, d.query_id) AS query_id,
           coalesce(l.doc_id, d.doc_id) AS doc_id,
           coalesce(l.lex_rn, 0) AS lex_rn,
           coalesce(d.dense_rn, 0) AS dense_rn,
           (CASE WHEN l.lex_rn IS NULL THEN 0
                 ELSE 1000000 // (60 + l.lex_rn) END
            + CASE WHEN d.dense_rn IS NULL THEN 0
                   ELSE 1000000 // (60 + d.dense_rn) END) AS rrf_q
         FROM lx l FULL OUTER JOIN dense d
           ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
       fr AS (
         SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY rrf_q DESC, doc_id) AS BIGINT) AS rn FROM fu)
     SELECT query_id, doc_id, CAST(lex_rn AS BIGINT) AS lex_rn,
       CAST(dense_rn AS BIGINT) AS dense_rn,
       CAST(rrf_q AS BIGINT) AS rrf_q, rn
     FROM fr WHERE rn <= 3 ORDER BY query_id, rn"""

  /** Benchmark decontamination (t163) matching
    * [[graft.ops.TextOps.t163Decontamination]]: 5-gram shingles (the
    * shingle CTE shape at width 5 — same tokenizer, ≥5-word filter,
    * per-doc distinctness), eval fold = doc_id % 7 == 3, per-train-doc
    * count of distinct shingles shared with the eval union set, top-50
    * on (n_overlap DESC, doc_id).
    */
  /** The 5-gram shingle + eval-gram CTE chain (w/sh0/sh/eg) — ONE
    * definition shared by [[decontamination]] and [[cleanSelect]]'s
    * contaminated-set subquery, mirroring the Spark-side
    * `decontamCountsOn` sharing.
    */
  private def decontamCtes: String = {
    val m = graft.ops.TextOps.DecontamEvalMod
    val r = graft.ops.TextOps.DecontamEvalRem
    s"""w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM documents
         WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 5),
       sh0 AS (
         SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS sh
         FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)),
       sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
       eg AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $m = $r)"""
  }

  val decontamination: String = {
    val m = graft.ops.TextOps.DecontamEvalMod
    val r = graft.ops.TextOps.DecontamEvalRem
    s"""WITH $decontamCtes
     SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
     FROM sh s JOIN eg USING (sh)
     WHERE s.doc_id % $m <> $r
     GROUP BY 1
     ORDER BY n_overlap DESC, doc_id
     LIMIT ${graft.ops.TextOps.DecontamTopN}"""
  }

  /** Training-mixture sample (t164) matching
    * [[graft.ops.TextOps.t164MixtureSample]]: per-doc 48-bit md5 key
    * (the minhash-family construction), per-language quota =
    * floor(K·w/Σw over PRESENT languages), lowest-key docs first with
    * the (uh, doc_id) tie-break the Spark aggregator's buffer order
    * mirrors.
    */
  val mixtureSample: String = mixtureSampleOn("documents")

  /** The mixture-sample SQL over an arbitrary (doc_id, lang) source —
    * `documents` for t164, the clean-selection derived table for t170
    * ([[trainingPlane]]). `seed` is the epoch key (folded into the md5
    * input — the Spark side's h48(seed ++ id) twin; empty = the t164
    * parity draw).
    */
  private def mixtureSampleOn(src: String, seed: String = ""): String = {
    val k = graft.ops.TextOps.MixSampleK
    s"""WITH u AS (
         SELECT doc_id, lang,
           ('0x' || substr(md5('$seed' || CAST(doc_id AS VARCHAR)), 1,
             12))::BIGINT AS uh,
           CASE WHEN lang = 'en' THEN 4 WHEN lang = 'zh' THEN 3
                ELSE 1 END AS w
         FROM $src),
       tw AS (SELECT CAST(SUM(w) AS BIGINT) AS tw
              FROM (SELECT DISTINCT lang, w FROM u)),
       r AS (
         SELECT doc_id, lang, w,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY uh, doc_id) AS BIGINT) AS rn
         FROM u)
     SELECT lang, doc_id, rn FROM r, tw
     WHERE rn <= GREATEST(1, FLOOR($k * 1.0 * w / tw))
     ORDER BY lang, rn"""
  }

  /** Sequence packing (t166) matching
    * [[graft.ops.TextOps.t166SequencePack]]: whitespace token counts,
    * md5-key shuffle order, per-shard running-sum start offsets, chunk =
    * start_off // L (positive operands — truncation ≡ floor), per-chunk
    * boundary row. Window and plain sums CAST to BIGINT (DuckDB widens
    * both to HUGEINT).
    */
  val sequencePack: String = sequencePackOn("documents")

  /** The sequence-pack SQL over an arbitrary doc source — `documents`
    * for t166, the t152-selected derived table for t167 ([[packSelected]]),
    * the mixture-drawn plane for t170 ([[trainingPlane]]) — and at an
    * arbitrary epoch `seed` (folded into the md5 shuffle key, the Spark
    * side's h48(seed ++ id) twin; empty = the t166/t167 parity order).
    */
  private def sequencePackOn(src: String, seed: String = ""): String = {
    val l = graft.ops.TextOps.SeqPackLen
    val ns = graft.ops.TextOps.SeqPackShards
    s"""WITH t AS (
         SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
             AS BIGINT) AS ntok,
           ('0x' || substr(md5('$seed' || CAST(doc_id AS VARCHAR)), 1,
             12))::BIGINT AS uh
         FROM $src),
       c AS (
         SELECT doc_id, ntok, uh, uh % $ns AS shard,
           CAST(sum(ntok) OVER (PARTITION BY uh % $ns
             ORDER BY uh, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum
         FROM t),
       p AS (
         SELECT shard, doc_id, ntok, cum - ntok AS start_off,
           (cum - ntok) // $l AS chunk
         FROM c)
     SELECT shard, chunk, min_by(doc_id, start_off) AS first_doc,
       min(start_off) AS first_off,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tok
     FROM p
     GROUP BY 1, 2
     ORDER BY shard, chunk
     LIMIT 100"""
  }

  /** Pack-the-selection (t167) matching
    * [[graft.ops.TextOps.t167PackSelected]]: the sequence-pack SQL over
    * the docs semi-joined to the ENTIRE t152 selection oracle composed
    * verbatim as a derived table (the t159 composition convention).
    */
  val packSelected: String = sequencePackOn(
    s"""(SELECT d.* FROM documents d
         JOIN ($dsirSelect) z USING (doc_id))""")

  /** Decontaminated DSIR selection (t168) matching
    * [[graft.ops.TextOps.t168CleanSelect]]: the t152 selection SQL over
    * the clean pool — eval-fold docs held out entirely, contaminated
    * train docs (the FULL flagged set, no top-N cut) excluded via NOT
    * IN on the shared shingle CTE chain. Bag models and the selection
    * pool both see only clean data.
    */
  val cleanSelect: String = {
    val m = graft.ops.TextOps.DecontamEvalMod
    val r = graft.ops.TextOps.DecontamEvalRem
    // the clean pool is hoisted into a named CTE (defined once,
    // referenced twice by the selection SQL) so the corpus-wide
    // decontamination subquery is not inlined — and possibly evaluated —
    // twice per oracle run
    dsirSelectSqlOn("cleanpool",
      s"""$decontamCtes,
       cleanpool AS (
         SELECT d.* FROM documents d
         WHERE d.doc_id % $m <> $r AND d.doc_id NOT IN (
           SELECT DISTINCT s.doc_id FROM sh s JOIN eg USING (sh)
           WHERE s.doc_id % $m <> $r)),
       """)
  }

  /** The full pre-training plane (t170) matching
    * [[graft.ops.TextOps.t170TrainingPlane]]: the pack SQL over the
    * mixture SQL over the clean-selection SQL, each stage's oracle
    * composed verbatim as a derived table (the t159/t167 convention) —
    * the hash pins every stage interface against the next.
    */
  val trainingPlane: String = trainingPlaneOn("")

  /** The full-plane SQL at an arbitrary epoch seed — the seed folds into
    * the two stochastic stages' md5 inputs (mixture draw + pack shuffle);
    * the clean selection is epoch-invariant. Shared by t170 (default
    * epoch) and t178 ([[epochPlane]]).
    */
  private def trainingPlaneOn(seed: String): String = sequencePackOn(
    s"""(SELECT d.* FROM documents d JOIN (
         ${mixtureSampleOn(
      s"""(SELECT d2.doc_id, d2.lang FROM documents d2
           JOIN ($cleanSelect) sel USING (doc_id))""", seed)}
       ) mx USING (doc_id))""", seed)

  /** Epoch-2 full plane (t178) matching
    * [[graft.ops.TextOps.t178EpochPlane]]: the t170 composition with the
    * epoch seed folded into both stochastic stage hashes.
    */
  val epochPlane: String = trainingPlaneOn(graft.ops.TextOps.EpochSeed2)

  /** Epoch-2 packing (t171) matching
    * [[graft.ops.TextOps.t171EpochPack]]: the sequence-pack SQL with the
    * epoch seed folded into the md5 shuffle key.
    */
  val epochPack: String =
    sequencePackOn("documents", graft.ops.TextOps.EpochSeed2)

  /** The fixed-benchmark decontamination SQL at an arbitrary (mod, rem)
    * fold — the t172 check shape: eval-gram set frozen at the
    * [[graft.ops.TextOps.DecontamFixedEvalK]] lowest-id fold docs, train
    * = everything NOT in the frozen roster (the anti-join residue
    * convention: a fold doc beyond the cap is ordinary train data).
    * Shared by t172 (the historical fold) and d175 (a fold the ingested
    * state has never seen — the onboarding case, whose oracle IS this
    * one-shot SQL per the d165/d169 incremental convention).
    */
  private def fixedEvalDecontamOn(m: Int, r: Int,
      src: String = "documents"): String = {
    val k = graft.ops.TextOps.DecontamFixedEvalK
    s"""WITH ev AS (
         SELECT doc_id FROM $src WHERE doc_id % $m = $r
         ORDER BY doc_id LIMIT $k),
       w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM $src
         WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 5),
       sh0 AS (
         SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS sh
         FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)),
       sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
       eg AS (SELECT DISTINCT sh FROM sh JOIN ev USING (doc_id))
     SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
     FROM sh s JOIN eg USING (sh)
     WHERE s.doc_id NOT IN (SELECT doc_id FROM ev)
     GROUP BY 1
     ORDER BY n_overlap DESC, doc_id
     LIMIT ${graft.ops.TextOps.DecontamTopN}"""
  }

  /** Fixed-benchmark decontamination (t172) matching
    * [[graft.ops.TextOps.t172FixedEvalDecontam]]. */
  val fixedEvalDecontam: String = fixedEvalDecontamOn(
    graft.ops.TextOps.DecontamEvalMod, graft.ops.TextOps.DecontamEvalRem)

  /** Suite onboarding from state (d175) matching
    * [[graft.ops.TextOps.d175SuiteOnboard]]: the state probe must equal
    * the stateless one-shot check at the unseen fold, so the oracle IS
    * the t172 SQL at that fold (the d165/d169 convention).
    */
  val suiteOnboard: String = fixedEvalDecontamOn(
    graft.ops.TextOps.OnboardSuiteMod, graft.ops.TextOps.OnboardSuiteRem)

  /** Postings revision + onboard (d179) matching
    * [[graft.ops.TextOps.d179PostingsRevision]]: the state that healed a
    * re-crawl must equal the stateless one-shot check over a corpus that
    * ALWAYS had the revisions (d131's proof standard), so the oracle is
    * the t172 SQL at the unseen fold over the revised corpus (the d131
    * revision expression verbatim).
    */
  val postingsRevision: String = fixedEvalDecontamOn(
    graft.ops.TextOps.RevisionSuiteMod, graft.ops.TextOps.RevisionSuiteRem,
    s"""(SELECT doc_id,
           CASE WHEN doc_id % 5 = 2
                THEN text || ' u' || CAST(doc_id % 3 AS VARCHAR)
                ELSE text END AS text
         FROM documents)""")

  /** Multi-suite decontamination (t174) matching
    * [[graft.ops.TextOps.t174MultiSuiteDecontam]]: the EXACT check over
    * the union of three frozen suite folds — the Bloom pre-filter on the
    * Spark side is results-invisible by construction (false positives
    * killed by the exact confirm, false negatives impossible), so the
    * oracle is the plain union-fold SQL.
    */
  val multiSuiteDecontam: String = {
    val k = graft.ops.TextOps.DecontamFixedEvalK
    val folds = graft.ops.TextOps.MultiSuiteFolds
      .map { case (m, r) =>
        s"""(SELECT doc_id FROM documents WHERE doc_id % $m = $r
             ORDER BY doc_id LIMIT $k)"""
      }.mkString("\n         UNION\n         ")
    s"""WITH ev AS (
         $folds),
       w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM documents
         WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 5),
       sh0 AS (
         SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS sh
         FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)),
       sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
       eg AS (SELECT DISTINCT sh FROM sh JOIN ev USING (doc_id))
     SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
     FROM sh s JOIN eg USING (sh)
     WHERE s.doc_id NOT IN (SELECT doc_id FROM ev)
     GROUP BY 1
     ORDER BY n_overlap DESC, doc_id
     LIMIT ${graft.ops.TextOps.DecontamTopN}"""
  }

  /** Per-suite contamination attribution (t176) matching
    * [[graft.ops.TextOps.t176SuiteAttribution]]: the exact per-suite
    * check — gram rows tagged with every suite their doc belongs to, one
    * (doc_id, suite) count per contaminated pair. The Spark side's Bloom
    * pre-filter is results-invisible by construction, so the oracle is
    * the plain SQL. Train = everything not in the UNION roster (one
    * shared train pool).
    */
  val suiteAttribution: String =
    suiteAttributionOn(graft.ops.TextOps.MultiSuiteFolds)

  /** Batch suite onboarding with per-suite attribution (d182) matching
    * [[graft.ops.TextOps.d182BatchSuiteAttribution]]: the state-served
    * batch probe must equal the stateless per-suite exact check at the
    * never-seen folds (the d175/d165 convention composed with t176's
    * attribution shape), so the oracle IS the t176 SQL at those folds.
    */
  val batchSuiteAttribution: String =
    suiteAttributionOn(graft.ops.TextOps.BatchOnboardFolds)

  private def suiteAttributionOn(foldSeq: Seq[(Int, Int)]): String = {
    val k = graft.ops.TextOps.DecontamFixedEvalK
    val folds = foldSeq.zipWithIndex
      .map { case ((m, r), i) =>
        s"""SELECT doc_id, CAST($i AS BIGINT) AS suite FROM (
             SELECT doc_id FROM documents WHERE doc_id % $m = $r
             ORDER BY doc_id LIMIT $k)"""
      }.mkString("\n         UNION ALL\n         ")
    s"""WITH ev0 AS (
         $folds),
       ev AS (SELECT DISTINCT doc_id FROM ev0),
       w AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
         FROM documents
         WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 5),
       sh0 AS (
         SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS sh
         FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)),
       sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
       eg AS (SELECT DISTINCT e.suite, s.sh
              FROM sh s JOIN ev0 e USING (doc_id))
     SELECT s.doc_id, e.suite, CAST(count(*) AS BIGINT) AS n_overlap
     FROM sh s JOIN eg e USING (sh)
     WHERE s.doc_id NOT IN (SELECT doc_id FROM ev)
     GROUP BY 1, 2
     ORDER BY n_overlap DESC, doc_id, suite
     LIMIT ${graft.ops.TextOps.DecontamTopN}"""
  }

  /** Semantic-dedup recall audit (v177) matching
    * [[graft.ops.VectorOps.v177SemdedupRecall]]: exact all-pairs cosine
    * ground truth over the frozen lowest-id sample vs same-final-cluster
    * candidate pairs, counted per cosine floor with integer-quantized
    * recall/precision and the in-row recall_ok alert.
    */
  val semdedupRecall: String = {
    val iters = VectorOps.KmeansIters
    val k = VectorOps.SemRecallSampleK
    val floorRows = VectorOps.SemRecallFloors
      .map(f => s"(CAST($f AS BIGINT), " +
        s"CAST(${VectorOps.SemRecallFloorMinQ(f)} AS BIGINT))")
      .mkString(", ")
    s"""WITH ${kmeansCtes("")},
       roster AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT $k),
       n AS (SELECT a.vec_id, a.v, a.cid,
               sqrt(list_dot_product(a.v, a.v)) AS nv
             FROM a$iters a JOIN roster USING (vec_id)),
       pairs AS (
         SELECT a.vec_id AS v1, b.vec_id AS v2,
           CASE WHEN a.nv * b.nv = 0 THEN 0.0
                ELSE list_dot_product(a.v, b.v) / (a.nv * b.nv) END AS sim,
           a.cid = b.cid AS same_cid
         FROM n a JOIN n b ON b.vec_id > a.vec_id),
       cand AS (
         SELECT CAST(coalesce(sum(CASE WHEN same_cid THEN 1 END), 0)
           AS BIGINT) AS n_cand FROM pairs),
       fl AS (SELECT * FROM (VALUES $floorRows) t(floor_q, min_q)),
       agg AS (
         SELECT floor_q, min_q, CAST(count(p.v1) AS BIGINT) AS n_truth,
           CAST(coalesce(sum(CASE WHEN p.same_cid THEN 1 END), 0)
             AS BIGINT) AS n_hit
         FROM fl LEFT JOIN pairs p ON p.sim >= fl.floor_q / 100.0
         GROUP BY floor_q, min_q)
     SELECT floor_q, n_truth, n_cand, n_hit,
       CASE WHEN n_truth = 0 THEN 0
            ELSE (n_hit * 10000) // n_truth END AS recall_q,
       CASE WHEN n_cand = 0 THEN 0
            ELSE (n_hit * 10000) // n_cand END AS prec_q,
       (n_truth = 0 OR (CASE WHEN n_truth = 0 THEN 0
            ELSE (n_hit * 10000) // n_truth END) >= min_q) AS recall_ok
     FROM agg CROSS JOIN cand
     ORDER BY floor_q"""
  }

  /** The top-[[graft.ops.VectorOps.MultiProbeR]] probe CTE shared by the
    * multi-probe oracles (v180/v181): rank clusters per vector against
    * the codebook the FINAL Lloyd's assignment used (`c{iters-1}` — the
    * same ordering CASE as the assignment CTE, cid tiebreak), keep the
    * top R. `src` restricts the probed vectors (the audit probes only
    * the frozen sample).
    */
  private def probeCte(src: String): String = {
    val iters = VectorOps.KmeansIters
    val r = VectorOps.MultiProbeR
    s"""p AS (
         SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               CASE WHEN sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec)) = 0
                    THEN 0.0
                    ELSE list_dot_product(e.v, c.cvec)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cvec, c.cvec))) END DESC,
               c.cid) AS arn
           FROM $src e, c${iters - 1} c) t WHERE arn <= $r)"""
  }

  /** Multi-probe semantic dedup (v180) matching
    * [[graft.ops.VectorOps.v180MultiProbeDedup]]: candidates are pairs
    * sharing ANY of their top-2 probed clusters (probed against the
    * final assignment's codebook), keeper rule and output shape = v83's,
    * a both-probes-shared pair counted once via DISTINCT.
    */
  val multiProbeDedup: String = {
    val iters = VectorOps.KmeansIters
    val tau = VectorOps.SemDedupThreshold
    s"""WITH ${kmeansCtes("")},
       ${probeCte("et")},
       norms AS (SELECT vec_id, v, cid,
                   sqrt(list_dot_product(v, v)) AS nv
                 FROM a$iters),
       dups AS (
         SELECT a.vec_id, count(DISTINCT b.vec_id) AS n_smaller_dups
         FROM p pa JOIN p pb ON pa.cid = pb.cid
           AND pb.vec_id < pa.vec_id
           JOIN norms a ON a.vec_id = pa.vec_id
           JOIN norms b ON b.vec_id = pb.vec_id
         WHERE (CASE WHEN a.nv * b.nv = 0 THEN 0.0
                     ELSE list_dot_product(a.v, b.v) / (a.nv * b.nv) END)
           >= $tau
         GROUP BY a.vec_id)
     SELECT n.vec_id, n.cid,
       CAST(COALESCE(d.n_smaller_dups, 0) AS BIGINT) AS n_smaller_dups,
       COALESCE(d.n_smaller_dups, 0) = 0 AS keeper
     FROM norms n LEFT JOIN dups d ON d.vec_id = n.vec_id
     ORDER BY n.vec_id"""
  }

  /** Multi-probe recall audit (v181) matching
    * [[graft.ops.VectorOps.v181MultiProbeRecall]]: v177's exact-pair
    * ground truth with the candidate flag widened to "shares a probed
    * cluster"; probes computed for the frozen sample only.
    */
  val multiProbeRecall: String = {
    val iters = VectorOps.KmeansIters
    val k = VectorOps.SemRecallSampleK
    val floorRows = VectorOps.SemRecallFloors
      .map(f => s"(CAST($f AS BIGINT), " +
        s"CAST(${VectorOps.MultiProbeRecallMinQ(f)} AS BIGINT))")
      .mkString(", ")
    s"""WITH ${kmeansCtes("")},
       roster AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT $k),
       ${probeCte("(SELECT et.* FROM et JOIN roster USING (vec_id))")},
       cp AS (SELECT DISTINCT pa.vec_id AS v1, pb.vec_id AS v2
              FROM p pa JOIN p pb ON pa.cid = pb.cid
                AND pb.vec_id > pa.vec_id),
       n AS (SELECT a.vec_id, a.v,
               sqrt(list_dot_product(a.v, a.v)) AS nv
             FROM a$iters a JOIN roster USING (vec_id)),
       pairs AS (
         SELECT a.vec_id AS v1, b.vec_id AS v2,
           CASE WHEN a.nv * b.nv = 0 THEN 0.0
                ELSE list_dot_product(a.v, b.v) / (a.nv * b.nv) END AS sim,
           (cp.v1 IS NOT NULL) AS is_cand
         FROM n a JOIN n b ON b.vec_id > a.vec_id
           LEFT JOIN cp ON cp.v1 = a.vec_id AND cp.v2 = b.vec_id),
       cand AS (
         SELECT CAST(coalesce(sum(CASE WHEN is_cand THEN 1 END), 0)
           AS BIGINT) AS n_cand FROM pairs),
       fl AS (SELECT * FROM (VALUES $floorRows) t(floor_q, min_q)),
       agg AS (
         SELECT floor_q, min_q, CAST(count(p.v1) AS BIGINT) AS n_truth,
           CAST(coalesce(sum(CASE WHEN p.is_cand THEN 1 END), 0)
             AS BIGINT) AS n_hit
         FROM fl LEFT JOIN pairs p ON p.sim >= fl.floor_q / 100.0
         GROUP BY floor_q, min_q)
     SELECT floor_q, n_truth, n_cand, n_hit,
       CASE WHEN n_truth = 0 THEN 0
            ELSE (n_hit * 10000) // n_truth END AS recall_q,
       CASE WHEN n_cand = 0 THEN 0
            ELSE (n_hit * 10000) // n_cand END AS prec_q,
       (n_truth = 0 OR (CASE WHEN n_truth = 0 THEN 0
            ELSE (n_hit * 10000) // n_truth END) >= min_q) AS recall_ok
     FROM agg CROSS JOIN cand
     ORDER BY floor_q"""
  }
}
