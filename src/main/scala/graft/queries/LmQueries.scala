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

  val oracles: Map[String, String] = Map(
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
