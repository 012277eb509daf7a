package graft.oracle

import graft.core.TextHash

/** DuckDB SQL fragment builders mirroring the text/similarity kernels —
  * generated from the SAME constants as graft.core.TextHash and
  * graft.operators.{Dedup, TextAnalysis, Similarity}, so the oracle twins
  * re-derive every hash/score from the raw tables (end-to-end parity, no
  * golden fixtures). Tested against DuckDB 1.0 semantics:
  * list_* lambdas, 1-based list indexing, BIGINT bit ops.
  */
object TextOracle {
  val P: Long = TextHash.P

  /** Rolling char hash of a string expression (mirrors TextHash.charHash). */
  def charHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(${TextHash.SEED} AS BIGINT), " +
      s"list_transform(string_split($s, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(acc, c) -> (acc * ${TextHash.BASE} + c) % $P)"

  /** Second rolling hash (mirrors TextHash.charHash2). */
  def charHash2Sql(s: String): String =
    s"list_reduce(list_prepend(CAST(${TextHash.SEED2} AS BIGINT), " +
      s"list_transform(string_split($s, ''), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(acc, c) -> (acc * ${TextHash.BASE2} + c) % $P)"

  /** Combined 60-bit content key (mirrors TextHash.charHash64). */
  def charHash64Sql(s: String): String =
    s"(${charHashSql(s)} * $P + ${charHash2Sql(s)})"

  /** CTE `toks(doc_id, t)` — whitespace tokens, empties dropped. */
  def toksCte(from: String = "documents", textExpr: String = "text"): String =
    s"toks AS (SELECT doc_id, list_filter(string_split_regex($textExpr, '\\s+'), x -> x <> '') AS t FROM $from)"

  /** CTE `ng(doc_id, g)` — distinct word n-grams over `toks`. */
  def ngramsCte(n: Int): String = {
    val join = (1 to n).map(o => s"t[i+${o - 1}]").mkString(" || ' ' || ")
    s"ng AS (SELECT doc_id, CASE WHEN len(t) >= $n THEN " +
      s"list_distinct(list_transform(range(1, len(t) - ${n - 2}), i -> $join)) " +
      s"ELSE CAST([] AS VARCHAR[]) END AS g FROM toks)"
  }

  /** 31-bit SimHash of the token list `t` (mirrors TextHash.simhash):
    * Σ_j 2^j · [ Σ_tokens (±1 by bit j of charHash(token)) ≥ 0 ].
    */
  def simhashSql: String = {
    val terms = (0 until TextHash.SIMHASH_BITS).map { j =>
      s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }
    terms.mkString(" + ")
  }

  /** CTE chain computing `sim(doc_id, simhash)` from documents. */
  def simhashCtes: String =
    s"""${toksCte()},
       |th AS (SELECT doc_id, list_transform(t, tok -> ${charHashSql("tok")}) AS th FROM toks),
       |sim AS (SELECT doc_id, $simhashSql AS simhash FROM th)""".stripMargin

  /** 62-bit SimHash of token lists `th1`/`th2` (mirrors TextHash.simhash64):
    * low 31 bits vote on charHash bits, high 31 on charHash2 bits.
    */
  def simhash64Sql: String = {
    def half(src: String, shift: Int): Seq[String] =
      (0 until TextHash.SIMHASH_BITS).map { j =>
        s"(CASE WHEN list_sum(list_transform($src, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN CAST(${1L << (j + shift)} AS BIGINT) ELSE 0 END)"
      }
    (half("th1", 0) ++ half("th2", TextHash.SIMHASH_BITS)).mkString(" + ")
  }

  /** CTE chain computing `sim(doc_id, simhash)` with the 62-bit kernel. */
  def simhash64Ctes: String =
    s"""${toksCte()},
       |th AS (SELECT doc_id, list_transform(t, tok -> ${charHashSql("tok")}) AS th1,
       |               list_transform(t, tok -> ${charHash2Sql("tok")}) AS th2 FROM toks),
       |sim AS (SELECT doc_id, $simhash64Sql AS simhash FROM th)""".stripMargin

  /** Exact n-gram-Jaccard near-dup pairs ≥ threshold (brute force). */
  def jaccardPairsSql(n: Int, threshold: Double): String =
    s"""WITH ${toksCte()},
       |${ngramsCte(n)},
       |nz AS (SELECT doc_id, g FROM ng WHERE len(g) > 0),
       |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  len(list_intersect(a.g, b.g)) AS c, len(a.g) AS sz_a, len(b.g) AS sz_b
       |  FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(c AS DOUBLE) / CAST(sz_a + sz_b - c AS DOUBLE) AS jaccard
       |FROM pr WHERE CAST(c AS DOUBLE) / CAST(sz_a + sz_b - c AS DOUBLE) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** Decontamination oracle: corpus = documents NOT matching `benchPred`,
    * benchmark = documents matching it; shared-distinct-n-gram counts by
    * STRING intersection (the Spark side counts by mod-P hash — identical
    * short of a ~1e-9/pair collision, the same trade jaccardPairsSql makes).
    */
  def decontaminateSql(n: Int, minHits: Int, benchPred: String): String =
    s"""WITH ${toksCte()},
       |${ngramsCte(n)},
       |b AS (SELECT doc_id AS bench_id, g FROM ng WHERE ($benchPred) AND len(g) > 0),
       |c AS (SELECT doc_id, g FROM ng WHERE NOT ($benchPred) AND len(g) > 0),
       |pr AS (SELECT c.doc_id, b.bench_id,
       |  CAST(len(list_intersect(c.g, b.g)) AS BIGINT) AS n_hits
       |  FROM c CROSS JOIN b)
       |SELECT doc_id, bench_id, n_hits FROM pr WHERE n_hits >= $minHits
       |ORDER BY doc_id, bench_id""".stripMargin

  /** Substring-level dedup CTE chain (mirrors Dedup.substringDupMarks +
    * substringSpans): positional L-token windows by STRING identity (the
    * Spark side uses the 60-bit combined hash — identical short of a
    * ~1e-18/pair collision), first occurrence in (doc_id, pos) order
    * survives, overlapping/adjacent marked windows merge into islands.
    * Yields CTE `sp(doc_id, isl, s, e, nw)` with e = LAST MARKED POS (not
    * token end).
    */
  def substringSpanCtes(L: Int): String =
    s"""${toksCte()},
       |wins AS (SELECT doc_id, pw.pos AS pos, pw.w AS w FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${L - 2}),
       |    i -> {'pos': i, 'w': array_to_string(t[i:i+${L - 1}], ' ')})) AS pw
       |  FROM toks WHERE len(t) >= $L) z),
       |marks AS (SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |      row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn,
       |      count(*) OVER (PARTITION BY w) AS cnt
       |    FROM wins) m WHERE cnt >= 2 AND rn > 1),
       |isl AS (SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > $L THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |  FROM (SELECT doc_id, pos,
       |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM marks) p),
       |sp AS (SELECT doc_id, isl, min(pos) AS s, max(pos) AS e, count(*) AS nw
       |       FROM isl GROUP BY 1, 2)""".stripMargin

  /** Per-doc merged dup-span stats (mirrors Dedup.substringDupSpans). */
  def substringSpanStatsSql(L: Int): String =
    s"""WITH ${substringSpanCtes(L)}
       |SELECT doc_id, count(*) AS dup_spans,
       |  CAST(sum(e - s + $L) AS BIGINT) AS dup_tokens,
       |  CAST(sum(nw) AS BIGINT) AS dup_windows
       |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Cleaned corpus (mirrors Dedup.dedupSubstrings): tokens covered by any
    * merged span removed, remainder re-joined with single spaces.
    */
  def substringCleanSql(L: Int): String =
    s"""WITH ${substringSpanCtes(L)},
       |spl AS (SELECT doc_id, list({'s': s, 'e': e + ${L - 1}}) AS spn
       |        FROM sp GROUP BY doc_id)
       |SELECT tk.doc_id,
       |  coalesce(array_to_string(list_filter(t, (x, i) ->
       |    len(list_filter(coalesce(spn, []), r -> i >= r.s AND i <= r.e)) = 0), ' '),
       |    '') AS clean_text
       |FROM toks tk LEFT JOIN spl ON tk.doc_id = spl.doc_id
       |ORDER BY tk.doc_id""".stripMargin

  /** K-round BPE training CTE chain (mirrors TextAnalysis.bpeTrain):
    * lowercased whitespace words → frequency table → per round r:
    * `b_r(l, r, cnt)` = the max-count adjacent symbol pair (ties → lhs+US+rhs
    * ASC), then the greedy left-to-right apply — in a run of identical
    * symbols the merge lands at run positions 0, 2, 4…, reproduced here by
    * island detection over consecutive matching positions + odd row_number
    * (a plain string replace() would false-match l as a symbol SUFFIX, so
    * the apply works on the exploded symbol table). Leaves CTEs
    * `b0..b${K-1}` and the final symbol state `s$K(w, pos, sym)` + `w(w, f)`.
    */
  def bpeCtes(k: Int, from: String = "documents", textExpr: String = "text"): String = {
    val us = "chr(31)"
    val head =
      s"""wx AS MATERIALIZED (SELECT unnest(list_filter(string_split_regex(lower($textExpr), '\\s+'), x -> x <> '')) AS w FROM $from),
         |w AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM wx GROUP BY 1),
         |s0 AS MATERIALIZED (SELECT w, u.pos AS pos, u.sym AS sym FROM (
         |  SELECT w, unnest(list_transform(range(1, length(w) + 1),
         |    i -> {'pos': i, 'sym': w[i:i]})) AS u FROM w) z)""".stripMargin
    val rounds = (0 until k).map { r =>
      s"""b$r AS MATERIALIZED (SELECT l, r, CAST(cnt AS BIGINT) AS cnt FROM (
         |  SELECT p.sym AS l, p.nxt AS r, sum(w.f) AS cnt
         |  FROM (SELECT w, sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |        FROM s$r) p JOIN w USING (w)
         |  WHERE p.nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY cnt DESC, l || $us || r ASC LIMIT 1) z),
         |m$r AS MATERIALIZED (SELECT w, pos, sym,
         |  CASE WHEN sym = (SELECT l FROM b$r)
         |        AND lead(sym) OVER (PARTITION BY w ORDER BY pos) = (SELECT r FROM b$r)
         |       THEN 1 ELSE 0 END AS hit FROM s$r),
         |h$r AS (SELECT w, pos, pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS isl
         |        FROM m$r WHERE hit = 1),
         |st$r AS MATERIALIZED (SELECT w, pos FROM (
         |  SELECT w, pos, row_number() OVER (PARTITION BY w, isl ORDER BY pos) AS rn
         |  FROM h$r) z WHERE rn % 2 = 1),
         |s${r + 1} AS MATERIALIZED (SELECT m.w AS w,
         |  row_number() OVER (PARTITION BY m.w ORDER BY m.pos) AS pos,
         |  CASE WHEN st.pos IS NOT NULL
         |       THEN (SELECT l FROM b$r) || (SELECT r FROM b$r) ELSE m.sym END AS sym
         |  FROM m$r m
         |  LEFT JOIN st$r st ON m.w = st.w AND m.pos = st.pos
         |  LEFT JOIN st$r pr ON m.w = pr.w AND m.pos = pr.pos + 1
         |  WHERE pr.pos IS NULL)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** The learned merge table (mirrors bpeTrain's return — q6i). */
  def bpeTrainSql(k: Int): String = {
    val rows = (0 until k).map(r =>
      s"SELECT CAST($r AS INTEGER) AS rank, l AS lhs, r AS rhs, cnt FROM b$r")
    s"""WITH ${bpeCtes(k)}
       |${rows.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY rank""".stripMargin
  }

  /** Corpus piece frequencies after encoding with the learned merges
    * (mirrors bpeEncode over the training corpus — q6j): encoding applies
    * the merges in rank order with the same greedy rule as training, so
    * the encoded corpus IS the trainer's final symbol state `s$K`.
    */
  def bpeEncodeSql(k: Int, topN: Int): String =
    s"""WITH ${bpeCtes(k)}
       |SELECT sym AS piece, CAST(sum(f) AS BIGINT) AS freq
       |FROM s$k JOIN w USING (w)
       |GROUP BY sym ORDER BY freq DESC, piece LIMIT $topN""".stripMargin

  /** Quantized embedding CTE `e(vec_id, q)` (mirrors Similarity.quantize);
    * `dims` is fixed per table (driver embeddings: 64).
    */
  def quantCte(from: String = "embeddings"): String =
    s"e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q FROM $from)"

  def dotSql(a: String, b: String, dims: Int): String =
    s"CAST(list_sum(list_transform(range(1, ${dims + 1}), d -> $a[d] * $b[d])) AS BIGINT)"

  /** Segment-level keep-first dedup twin (mirrors Dedup.segmentDedup):
    * consecutive n-token segments, first occurrence in (doc_id, seg_no)
    * order survives corpus-wide, kept segments re-join in order. Matching
    * is by the SAME 60-bit hash the Spark side groups on, so keeper
    * election is bit-identical (not merely collision-equivalent).
    */
  def segmentDedupSql(n: Int): String =
    s"""WITH ${toksCte()},
       |segs AS (SELECT doc_id, pw.i AS seg_no, pw.s AS seg FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, (len(t) + ${n - 1}) // $n),
       |    i -> {'i': i, 's': array_to_string(t[i*$n+1 : i*$n+$n], ' ')})) AS pw
       |  FROM toks WHERE len(t) > 0) z),
       |k AS (SELECT doc_id, seg_no, seg,
       |        row_number() OVER (PARTITION BY ${charHash64Sql("seg")}
       |                           ORDER BY doc_id, seg_no) = 1 AS kept
       |      FROM segs)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  coalesce(array_to_string(list(seg ORDER BY seg_no) FILTER (WHERE kept), ' '),
       |    '') AS clean_text
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram CTE chain: `tr(lhs, rhs, cnt)` = the model trained on docs
    * matching `trainPred` (every adjacent lowercased-token pair seen
    * ≥ minCount times) and `bg(doc_id, lhs, rhs)` = every bigram instance
    * of every doc (mirrors TextAnalysis.lmTrain / the score exploder).
    */
  def lmCtes(minCount: Long, trainPred: String): String =
    s"""lt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents),
       |bg AS (SELECT doc_id, u.lhs AS lhs, u.rhs AS rhs FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> {'lhs': t[i], 'rhs': t[i+1]})) AS u
       |  FROM lt WHERE len(t) >= 2) z),
       |tr AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS cnt FROM bg
       |       WHERE doc_id IN (SELECT doc_id FROM documents WHERE $trainPred)
       |       GROUP BY 1, 2 HAVING count(*) >= $minCount)""".stripMargin

  /** Importance-resampling twin (mirrors TextAnalysis.importanceResample —
    * q6y): same hashed-bigram models, same int64 fixed-point ratio weights,
    * same cross-multiplied keep rule, add-one smoothing on both sides.
    */
  def importanceResampleSql(numBuckets: Int, tau: Int, targetPred: String,
                            salt: String = "dsir"): String = {
    val scale = graft.operators.TextAnalysis.DSIR_SCALE
    val cap = graft.operators.TextAnalysis.DSIR_RATIO_CAP * scale
    val draw = s"${charHash64Sql(s"CAST(d.doc_id AS VARCHAR) || ':$salt'")} % 1000000"
    s"""WITH lt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents),
       |bg AS (SELECT doc_id, u.lhs AS lhs, u.rhs AS rhs FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> {'lhs': t[i], 'rhs': t[i+1]})) AS u
       |  FROM lt WHERE len(t) >= 2) z),
       |ft AS (SELECT doc_id, ${charHash64Sql("lhs || ' ' || rhs")} % $numBuckets AS f FROM bg),
       |tc AS (SELECT f, CAST(count(*) AS BIGINT) AS cnt_t FROM ft
       |       WHERE doc_id IN (SELECT doc_id FROM documents WHERE $targetPred)
       |       GROUP BY 1),
       |rc AS (SELECT f, CAST(count(*) AS BIGINT) AS cnt_r FROM ft GROUP BY 1),
       |w AS (SELECT rc.f,
       |    least(CAST($cap AS BIGINT), ($scale * (coalesce(tc.cnt_t, 0) + 1)) // (rc.cnt_r + 1)) AS w
       |  FROM rc LEFT JOIN tc ON rc.f = tc.f),
       |sc AS (SELECT ft.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(w.w) AS BIGINT) AS score
       |  FROM ft JOIN w ON ft.f = w.f GROUP BY 1)
       |SELECT d.doc_id, coalesce(sc.n_grams, 0) AS n_grams,
       |  coalesce(sc.score, 0) AS score,
       |  $draw AS draw,
       |  coalesce(sc.n_grams, 0) > 0 AND
       |    ($draw) * coalesce(sc.n_grams, 0) * ${scale * tau}
       |      < coalesce(sc.score, 0) * 1000000 AS kept
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The trained bigram table (mirrors lmTrain — q6l). */
  def lmTrainSql(minCount: Long, trainPred: String): String =
    s"""WITH ${lmCtes(minCount, trainPred)}
       |SELECT lhs, rhs, cnt FROM tr ORDER BY lhs, rhs""".stripMargin

  /** Per-doc LM coverage scores (mirrors lmScore — q6m). */
  def lmScoreSql(minCount: Long, trainPred: String, minHitRate: Double): String =
    s"""WITH ${lmCtes(minCount, trainPred)},
       |sc AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN tr.cnt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |    CAST(sum(coalesce(tr.cnt, 0)) AS BIGINT) AS hit_weight
       |  FROM bg LEFT JOIN tr ON bg.lhs = tr.lhs AND bg.rhs = tr.rhs
       |  GROUP BY 1)
       |SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
       |  coalesce(sc.n_hits, 0) AS n_hits,
       |  coalesce(sc.hit_weight, 0) AS hit_weight,
       |  CASE WHEN coalesce(sc.n_bigrams, 0) > 0
       |       THEN CAST(sc.n_hits AS DOUBLE) / CAST(sc.n_bigrams AS DOUBLE)
       |       ELSE 0.0 END AS hit_rate,
       |  coalesce(sc.n_bigrams, 0) > 0 AND
       |    (CASE WHEN coalesce(sc.n_bigrams, 0) > 0
       |          THEN CAST(sc.n_hits AS DOUBLE) / CAST(sc.n_bigrams AS DOUBLE)
       |          ELSE 0.0 END) >= $minHitRate AS lm_keep
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Per-group cap twin (mirrors TextAnalysis.groupCap): rank in
    * content-addressed hash order, ties by doc_id, keep rk ≤ cap.
    */
  def groupCapSql(grpExpr: String, cap: Int, salt: String): String =
    s"""WITH h AS (SELECT $grpExpr AS grp, doc_id,
       |    ${charHash64Sql(s"CAST(doc_id AS VARCHAR) || ':$salt'")} AS sample_key
       |  FROM documents),
       |r AS (SELECT grp, doc_id, sample_key,
       |    row_number() OVER (PARTITION BY grp ORDER BY sample_key, doc_id) AS rk
       |  FROM h)
       |SELECT grp, CAST(rk AS BIGINT) AS rk, doc_id, sample_key
       |FROM r WHERE rk <= $cap ORDER BY grp, rk""".stripMargin

  /** Bloom anti-join bound-row twin (q6o): the oracle recomputes the exact
    * batch/membership counts (string identity == the 60-bit key short of a
    * ~1e−18 collision) and asserts the filter guarantees as literals — the
    * same driver-handshake shape as the sketch/ANN bound rows.
    */
  def bloomNewSql(corpusPred: String): String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_batch,
       |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM documents c
       |      WHERE ($corpusPred) AND c.text = d.text) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_members,
       |  TRUE AS no_false_negatives,
       |  TRUE AS fpr_below_bound
       |FROM documents d""".stripMargin

  /** Sequence-packing twin (mirrors TextAnalysis.packSequences): same
    * ws-token+EOS counts, same content-addressed order, one window cumsum
    * (the oracle MAY use the single-partition form the distributed path
    * must avoid — DuckDB is single-node by definition).
    */
  def packSequencesSql(seqLen: Int, salt: String): String =
    s"""WITH ${toksCte()},
       |tk AS (SELECT doc_id, CAST(len(t) + 1 AS BIGINT) AS n_tok,
       |    ${charHash64Sql(s"CAST(doc_id AS VARCHAR) || ':$salt'")} AS sample_key
       |  FROM toks),
       |c AS (SELECT doc_id, n_tok, sample_key,
       |    sum(n_tok) OVER (ORDER BY sample_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS tok_start
       |  FROM tk)
       |SELECT doc_id, n_tok, sample_key, CAST(tok_start AS BIGINT) AS tok_start,
       |  CAST(tok_start // $seqLen AS BIGINT) AS seq_first,
       |  CAST((tok_start + n_tok - 1) // $seqLen AS BIGINT) AS seq_last,
       |  CAST(tok_start % $seqLen AS BIGINT) AS offset_in_seq
       |FROM c ORDER BY doc_id""".stripMargin

  /** Pack-materialization twin (mirrors TextAnalysis.packTokens): rebuild
    * the global token stream (same order, same EOS convention), cut at
    * seqLen, fingerprint each sequence's space-joined tokens in stream
    * order with the shared rolling hash.
    */
  def packTokensSql(seqLen: Int, salt: String): String =
    s"""WITH ${toksCte()},
       |tk AS (SELECT doc_id, list_append(t, '${graft.operators.TextAnalysis.EosToken}') AS t2,
       |    CAST(len(t) + 1 AS BIGINT) AS n_tok,
       |    ${charHash64Sql(s"CAST(doc_id AS VARCHAR) || ':$salt'")} AS sample_key
       |  FROM toks),
       |c AS (SELECT doc_id, t2, sample_key,
       |    sum(n_tok) OVER (ORDER BY sample_key, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS tok_start
       |  FROM tk),
       |ex AS (SELECT unnest(list_transform(range(1, len(t2) + 1),
       |    i -> {'p': tok_start + i - 1, 'tok': t2[i]})) AS u FROM c),
       |ps AS (SELECT u.p AS gpos, u.tok AS tok FROM ex),
       |sq AS (SELECT gpos // $seqLen AS seq_id,
       |    CAST(count(*) AS BIGINT) AS n_filled,
       |    string_agg(tok, ' ' ORDER BY gpos) AS s
       |  FROM ps GROUP BY 1)
       |SELECT CAST(seq_id AS BIGINT) AS seq_id, n_filled,
       |  ${charHashSql("s")} AS seq_hash
       |FROM sq ORDER BY seq_id""".stripMargin

  /** Mixture-resampling twin (mirrors TextAnalysis.mixtureSample): the
    * same integer ppm rates, the same content-addressed uniform draw,
    * copies expanded with unnest(range(...)).
    */
  def mixtureSampleSql(ratesPpm: Map[String, Long], defaultPpm: Long,
                       salt: String): String = {
    val arms = ratesPpm.toSeq.sortBy(_._1)
      .map { case (d, r) => s"WHEN '$d' THEN CAST($r AS BIGINT)" }.mkString(" ")
    s"""WITH h AS (SELECT doc_id, source AS domain,
       |    CASE source $arms ELSE CAST($defaultPpm AS BIGINT) END AS ppm,
       |    ${charHash64Sql(s"CAST(doc_id AS VARCHAR) || ':$salt'")} % 1000000 AS u
       |  FROM documents),
       |n AS (SELECT doc_id, domain, u,
       |    ppm // 1000000 + CASE WHEN u < ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
       |  FROM h)
       |SELECT doc_id, domain, u, CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy_no
       |FROM n WHERE n_copies > 0 ORDER BY doc_id""".stripMargin
  }

  /** PII-redaction twin (mirrors TextAnalysis.redactPii): byte-identical
    * RE2-safe patterns, same email → ip → phone replacement order, counts
    * from the original text; redacted text reported as hash + length.
    */
  def redactPiiSql(textExpr: String): String = {
    import graft.operators.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
    val red = s"regexp_replace(regexp_replace(regexp_replace($textExpr, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all($textExpr, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all($textExpr, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all($textExpr, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  ${charHashSql(red)} AS red_hash,
       |  CAST(length($red) AS BIGINT) AS red_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Cross-modal alignment twin (mirrors Similarity.alignmentFilter over
    * the even/odd embedding pairing): quantized int dot/norms, the
    * verifyCosine double threshold rule.
    */
  def alignmentFilterSql(threshold: Double, dims: Int): String = {
    val t2 = s"$threshold * $threshold"
    s"""WITH ${quantCte()},
       |p AS (SELECT a.vec_id AS pair_id, a.q AS qa, b.q AS qb
       |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1 WHERE a.vec_id % 2 = 0),
       |d AS (SELECT pair_id, ${dotSql("qa", "qb", dims)} AS dot,
       |    ${dotSql("qa", "qa", dims)} AS na, ${dotSql("qb", "qb", dims)} AS nb
       |  FROM p)
       |SELECT pair_id, dot, na, nb,
       |  (dot > 0 AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) >=
       |    $t2 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS aligned
       |FROM d ORDER BY pair_id""".stripMargin
  }
}
