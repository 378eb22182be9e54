package graft.queries

import graft.Sessions.table
import graft.operators.NgramLM
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CCNet-style LM perplexity filtering under the driver gate: a
  * stupid-backoff bigram model trained on the documents table scores
  * the same table (the self-perplexity form — train/apply splits are a
  * caller concern) and buckets docs head/middle/tail on fixed nll
  * thresholds. The oracle replays training counts, the three-way
  * backoff CASE, the 6dp-log10 micro-unit sum and the thresholds in
  * one SQL statement, so probability math, pruning and rounding all
  * hash-check.
  */
object LmQueries {

  type Q = (SparkSession, String) => DataFrame

  private val MinCount = 2L
  private val p = NgramLM.Params(minCount = MinCount)

  val defs: Map[String, Q] = Map(
    // Per-doc stupid-backoff nll + CCNet bucket. Thresholds 1.46/1.48
    // bracket the sf fixture's median (~1.47) so all three buckets are
    // populated and the hash is sensitive to every branch.
    "q_lm_score" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val model = NgramLM.train(docs, minCount = MinCount)
      NgramLM.bucketed(NgramLM.score(docs, model, p), p)
        .select(col("doc_id"), col("n_tokens"), col("nll"), col("bucket"))
    },

    // Trigram stupid backoff (the KenLM-shape chain: trigram ->
    // alpha*bigram -> alpha^2*unigram -> alpha^2 OOV floor), thresholds
    // at the fixture's quartiles so all buckets populate.
    "q_lm_score3" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val model = NgramLM.train3(docs, minCount = MinCount)
      val p3 = NgramLM.Params(minCount = MinCount,
        headMax = 1.35, midMax = 1.43)
      NgramLM.bucketed(NgramLM.score3(docs, model, p3), p3)
        .select(col("doc_id"), col("n_tokens"), col("nll"), col("bucket"))
    },

    // The trained model's head: top bigrams by count (full tiebreak
    // order, so the limit is deterministic).
    "q_lm_model" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      NgramLM.train(docs, minCount = MinCount).bigrams
        .select(col("prev"), col("w"), col("c").cast(LongType).as("c"))
        .orderBy(desc("c"), asc("prev"), asc("w"))
        .limit(25)
    },

    // Zipf rank-frequency fit per source: OLS of ln(freq) on ln(rank)
    // over the (source, term) count table — the corpus-health triage
    // signal (natural language ≈ −1, template spam shallower). Rank
    // ties break (freq desc, term asc) on both engines, so the fit is
    // fully deterministic; slope/intercept at 6dp.
    "q_zipf_stats" -> { (s, dir) =>
      graft.operators.CorpusStats
        .zipfStats(table(s, dir, "documents"), "source", "text")
    },

    // SentencePiece-style unigram-LM tokenizer: corpus-frequency piece
    // vocab (top-128 ∪ single chars, −log₁₀ micro costs) + per-word
    // exact-integer Viterbi with the packed cost·8+len argmin (ties →
    // shortest piece). The oracle replays piece counting, vocab
    // selection, the cost chain, the forward DP (recursive CTE) and
    // the backtrace — a wrong tie rule, window bound or rounding step
    // breaks the hash.
    "q_unigram_lm" -> { (s, dir) =>
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val vocab = graft.operators.UnigramLm.trainVocab(docs,
        vocabSize = 128)
      graft.operators.UnigramLm.encode(docs, vocab)
    },

    // Tokenizer fertility per language: pieces/word and chars/piece of
    // the unigram segmentation — the "is this tokenizer efficient for
    // this language mix" health metric every multilingual pipeline
    // tracks. Pure aggregation over the encode output.
    "q_token_fertility" -> { (s, dir) =>
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val vocab = graft.operators.UnigramLm.trainVocab(docs,
        vocabSize = 128)
      graft.operators.UnigramLm.encode(docs, vocab)
        .join(table(s, dir, "documents").select("doc_id", "lang"),
          "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum("n_pieces").as("n_pieces"),
          round(sum("n_pieces") / count(lit(1)), 6)
            .as("pieces_per_word"),
          round(sum(length(col("word"))) / sum("n_pieces"), 6)
            .as("chars_per_piece"))
    }
  )

  private val trainSql =
    s"""tk AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents),
        pr AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, len(t)),
                   i -> CASE WHEN i = 0 THEN '<s>' ELSE t[i] END)) AS prev,
                 unnest(t) AS w
          FROM tk),
        big AS (SELECT prev, w, count(*) AS c FROM pr GROUP BY 1, 2),
        bigp AS (SELECT * FROM big WHERE c >= $MinCount)"""

  /** Unigram-LM replay CTE chain (UnigramLm.scala semantics): piece
    * counting, top-128 ∪ single-char vocab, 6dp-log10 micro costs, the
    * packed-argmin forward DP and the backtrace. Ends with
    * `usegf(word, seg)` + `ufin(word, cost_micro, par)` + `w0(doc_id,
    * wi, word)`.
    */
  private val unigramCte: String =
    """WITH RECURSIVE
         w0 AS MATERIALIZED (
           SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi,
                  unnest(list_transform(range(1, len(ws) + 1),
                                        i -> ws[i::INT])) AS word
           FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
                 FROM documents) d),
         ups AS (SELECT word, unnest(range(1, length(word) + 1)) AS st FROM w0),
         upieces AS (
           SELECT unnest(list_transform(
                    range(1, least(4, length(word) - st + 1) + 1),
                    l -> substr(word, st::INT, l::INT))) AS piece
           FROM ups),
         upc AS (SELECT piece, count(*)::BIGINT AS cnt FROM upieces GROUP BY 1),
         utopv AS (SELECT piece, cnt FROM upc
                   QUALIFY row_number() OVER (ORDER BY cnt DESC, piece ASC) <= 128),
         usel AS (SELECT DISTINCT piece, cnt FROM (
                    SELECT * FROM utopv
                    UNION ALL SELECT piece, cnt FROM upc WHERE length(piece) = 1)),
         utot AS (SELECT sum(cnt)::BIGINT AS t FROM usel),
         uvc AS MATERIALIZED (
           SELECT piece,
                  CAST(-round(round(log10(cnt * 1.0 / t), 6) * 1000000) AS BIGINT)
                    AS cost
           FROM usel, utot),
         udw AS (SELECT DISTINCT word FROM w0),
         uwq AS (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM udw),
         uwl AS (SELECT word, i, unnest(range(1, least(4, i) + 1)) AS l FROM uwq),
         uwp AS MATERIALIZED (
           SELECT q.word, q.i, q.l, uvc.cost FROM (
             SELECT word, i, l,
                    substr(word, (i - l + 1)::INT, l::INT) AS pc0
             FROM uwl) q
           JOIN uvc ON uvc.piece = q.pc0),
         ust AS (
           SELECT word, 0::BIGINT AS i, [0::BIGINT] AS best, [0::BIGINT] AS par
           FROM udw
           UNION ALL
           SELECT s.word, s.i + 1 AS i,
                  list_append(s.best,
                    min((s.best[(s.i + 2 - w.l)::INT] + w.cost) * 8 + w.l) // 8)
                    AS best,
                  list_append(s.par,
                    min((s.best[(s.i + 2 - w.l)::INT] + w.cost) * 8 + w.l) % 8)
                    AS par
           FROM ust s JOIN uwp w ON w.word = s.word AND w.i = s.i + 1
           GROUP BY s.word, s.i, s.best, s.par),
         ufin AS MATERIALIZED (
           SELECT word, best[(length(word) + 1)::INT] AS cost_micro, par
           FROM ust WHERE i = length(word)),
         ubt AS (
           SELECT word, length(word)::BIGINT AS i, []::VARCHAR[] AS seg, par
           FROM ufin
           UNION ALL
           SELECT word, i - par[(i + 1)::INT] AS i,
                  list_prepend(substr(word, (i - par[(i + 1)::INT] + 1)::INT,
                                      par[(i + 1)::INT]::INT), seg) AS seg,
                  par
           FROM ubt WHERE i > 0),
         usegf AS (SELECT word, seg FROM ubt WHERE i = 0)"""

  val oracles: Map[String, String] = Map(
    "q_unigram_lm" ->
      s"""$unigramCte
         SELECT w0.doc_id, w0.wi, w0.word,
                array_to_string(s2.seg, '|') AS seg,
                len(s2.seg)::BIGINT AS n_pieces, f.cost_micro
         FROM w0 JOIN usegf s2 USING (word) JOIN ufin f USING (word)""",
    "q_token_fertility" ->
      s"""$unigramCte,
         enc AS (
           SELECT w0.doc_id, w0.word, len(s2.seg)::BIGINT AS n_pieces
           FROM w0 JOIN usegf s2 USING (word))
         SELECT d.lang, count(*)::BIGINT AS n_words,
                sum(e.n_pieces)::BIGINT AS n_pieces,
                round(sum(e.n_pieces)::BIGINT / count(*), 6)
                  AS pieces_per_word,
                round(sum(length(e.word))::BIGINT
                      / sum(e.n_pieces)::BIGINT, 6) AS chars_per_piece
         FROM enc e JOIN documents d USING (doc_id)
         GROUP BY 1""",
    "q_lm_score" ->
      s"""WITH $trainSql,
         ctx AS (SELECT prev, sum(c) AS cc FROM big GROUP BY 1),
         uni AS (SELECT w, count(*) AS u FROM pr GROUP BY 1),
         unip AS (SELECT * FROM uni WHERE u >= $MinCount),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pr),
         sc AS (
           SELECT p.doc_id,
                  CASE WHEN b.c IS NOT NULL
                       THEN round(log10(CAST(b.c AS DOUBLE)
                                        / CAST(x.cc AS DOUBLE)), 6)
                       WHEN un.u IS NOT NULL
                       THEN round(log10(0.4 * CAST(un.u AS DOUBLE) / t.n), 6)
                       ELSE round(log10(0.4 / t.n), 6) END AS lp
           FROM pr p
           LEFT JOIN bigp b ON b.prev = p.prev AND b.w = p.w
           LEFT JOIN ctx x ON x.prev = p.prev
           LEFT JOIN unip un ON un.w = p.w
           CROSS JOIN tot t),
         agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  sum(CAST(round(lp * 1000000) AS BIGINT)) AS ms
           FROM sc GROUP BY 1)
         SELECT doc_id, n_tokens,
                round(-(ms / 1000000.0) / n_tokens, 4) AS nll,
                CASE WHEN -(ms / 1000000.0) / n_tokens < 1.46 THEN 'head'
                     WHEN -(ms / 1000000.0) / n_tokens < 1.48 THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM agg""",

    "q_lm_score3" ->
      s"""WITH $trainSql,
         ctx AS (SELECT prev, sum(c) AS cc FROM big GROUP BY 1),
         uni AS (SELECT w, count(*) AS u FROM pr GROUP BY 1),
         unip AS (SELECT * FROM uni WHERE u >= $MinCount),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pr),
         tr AS (
           SELECT doc_id,
                  unnest(list_transform(range(0, len(t)),
                    i -> CASE WHEN i < 2 THEN '<s>' ELSE t[i - 1] END)) AS p2,
                  unnest(list_transform(range(0, len(t)),
                    i -> CASE WHEN i < 1 THEN '<s>' ELSE t[i] END)) AS p1,
                  unnest(t) AS w
           FROM tk),
         tri AS (SELECT p2, p1, w, count(*) AS c3 FROM tr GROUP BY 1, 2, 3),
         trip AS (SELECT * FROM tri WHERE c3 >= $MinCount),
         ctx3 AS (SELECT p2, p1, sum(c3) AS cc3 FROM tri GROUP BY 1, 2),
         sc AS (
           SELECT g.doc_id,
                  CASE WHEN t3.c3 IS NOT NULL
                       THEN round(log10(CAST(t3.c3 AS DOUBLE)
                                        / CAST(x3.cc3 AS DOUBLE)), 6)
                       WHEN b.c IS NOT NULL
                       THEN round(log10(0.4 * CAST(b.c AS DOUBLE)
                                        / CAST(x.cc AS DOUBLE)), 6)
                       WHEN un.u IS NOT NULL
                       THEN round(log10(0.4 * (0.4 * CAST(un.u AS DOUBLE)
                                               / t.n)), 6)
                       ELSE round(log10(0.4 * (0.4 / t.n)), 6) END AS lp
           FROM tr g
           LEFT JOIN trip t3 ON t3.p2 = g.p2 AND t3.p1 = g.p1 AND t3.w = g.w
           LEFT JOIN ctx3 x3 ON x3.p2 = g.p2 AND x3.p1 = g.p1
           LEFT JOIN bigp b ON b.prev = g.p1 AND b.w = g.w
           LEFT JOIN ctx x ON x.prev = g.p1
           LEFT JOIN unip un ON un.w = g.w
           CROSS JOIN tot t),
         agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  sum(CAST(round(lp * 1000000) AS BIGINT)) AS ms
           FROM sc GROUP BY 1)
         SELECT doc_id, n_tokens,
                round(-(ms / 1000000.0) / n_tokens, 4) AS nll,
                CASE WHEN -(ms / 1000000.0) / n_tokens < 1.35 THEN 'head'
                     WHEN -(ms / 1000000.0) / n_tokens < 1.43 THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM agg""",

    "q_lm_model" ->
      s"""WITH $trainSql
         SELECT prev, w, CAST(c AS BIGINT) AS c
         FROM bigp
         ORDER BY c DESC, prev ASC, w ASC
         LIMIT 25""",

    "q_zipf_stats" ->
      """WITH t AS (
           SELECT source,
                  unnest(string_split_regex(trim(lower(text)), '\s+'))
                    AS term
           FROM documents),
         f AS (
           SELECT source, term, count(*)::BIGINT AS freq
           FROM t GROUP BY 1, 2),
         r AS (
           SELECT source, freq,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY freq DESC, term) AS rk
           FROM f),
         a AS (
           SELECT source,
                  count(*)::BIGINT AS n_terms,
                  sum(freq)::BIGINT AS n_tokens,
                  sum(ln(rk)) AS sx, sum(ln(freq)) AS sy,
                  sum(ln(rk) * ln(freq)) AS sxy,
                  sum(ln(rk) * ln(rk)) AS sxx
           FROM r GROUP BY 1)
         SELECT source, n_terms, n_tokens,
                round((n_terms * sxy - sx * sy)
                      / (n_terms * sxx - sx * sx), 6) AS zipf_slope,
                round((sy - ((n_terms * sxy - sx * sy)
                             / (n_terms * sxx - sx * sx)) * sx)
                      / n_terms, 6) AS zipf_intercept
         FROM a"""
  )
}
