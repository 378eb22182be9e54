package graft.queries

import graft.Sessions.table
import graft.operators.SuffixArray
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Suffix-array exact-repeat family under the driver gate. The DuckDB
  * oracles take the O(n·len) brute road the distributed operator
  * exists to avoid — materialize every truncated suffix, sort the
  * strings, lag/lead for adjacency, char-list walks for LCP — so rank
  * construction, tie-breaks, LCP and the interval algebra all
  * hash-check against an independent formulation.
  */
object SuffixQueries {

  type Q = (SparkSession, String) => DataFrame

  private val MaxLen = 256
  private val MinSpan = 30
  private val TopN = 25

  val defs: Map[String, Q] = Map(
    // The suffix array itself: every truncated suffix's 0-based rank in
    // global memcmp order, ties by (doc_id, pos).
    "q_suffix_array" -> { (s, dir) =>
      SuffixArray.build(table(s, dir, "documents"), maxLen = MaxLen)
    },

    // Exact duplicated spans (Lee et al. exact substring dedup): merged
    // per-doc intervals covered by a >=30-char substring occurring >=2
    // times anywhere in the corpus.
    "q_dup_spans" -> { (s, dir) =>
      SuffixArray.duplicateSpans(table(s, dir, "documents"),
        minLen = MinSpan, maxLen = MaxLen)
    },

    // Corpus-wide longest repeated substrings: top-25 adjacent-suffix
    // pairs by LCP with the repeat text.
    "q_longest_repeat" -> { (s, dir) =>
      SuffixArray.longestRepeats(table(s, dir, "documents"), n = TopN,
        maxLen = MaxLen)
    },

    // Doc-level exact-duplication verdict: fraction of chars inside
    // >=30-char corpus-duplicated substrings, drop at >=50% (the Lee et
    // al. document criterion over the span machinery above).
    "q_dup_coverage" -> { (s, dir) =>
      SuffixArray.duplicateCoverage(table(s, dir, "documents"),
        minLen = MinSpan, dropFrac = 0.5, maxLen = MaxLen)
    }
  )

  /** Shared oracle plumbing: truncated suffixes in global sort order
    * with adjacency ranks. */
  private val sufCte: String =
    s"""WITH d AS (SELECT doc_id, substr(text, 1, $MaxLen) AS t
                   FROM documents),
       p AS (SELECT doc_id, unnest(range(1, length(t) + 1)) AS pos, t
             FROM d),
       suf AS (SELECT doc_id, pos, substr(t, pos::INT) AS s FROM p),
       ord AS (SELECT doc_id, pos, s,
                      row_number() OVER (ORDER BY s, doc_id, pos) AS rn
               FROM suf)"""

  /** Adjacent pairs (rn, rn+1) with char-list LCP. */
  private val adjCte: String =
    """adj AS (SELECT o1.doc_id AS doc_a, o1.pos AS pos_a,
                      o2.doc_id AS doc_b, o2.pos AS pos_b, o1.rn,
                      string_split(o1.s, '') AS la,
                      string_split(o2.s, '') AS lb
               FROM ord o1 JOIN ord o2 ON o2.rn = o1.rn + 1),
       lc AS (SELECT doc_a, pos_a, doc_b, pos_b, rn,
                     -- list_position yields 0 (not NULL) when no
                     -- mismatch exists, i.e. one suffix prefixes the
                     -- other: nullif routes both through coalesce
                     coalesce(nullif(list_position(list_transform(
                         range(1, least(len(la), len(lb)) + 1),
                         k -> la[k] = lb[k]), false), 0) - 1,
                       least(len(la), len(lb)))::BIGINT AS lcp
              FROM adj)"""

  /** Full duplicated-span pipeline ending in a `spans(doc_id,
    * span_start, span_end)` CTE — shared by q_dup_spans and
    * q_dup_coverage. */
  private val spansSql: String =
    s"""$sufCte, $adjCte,
       cov AS (SELECT doc_a AS doc_id, pos_a AS pos, lcp FROM lc
               UNION ALL
               SELECT doc_b, pos_b, lcp FROM lc),
       m AS (SELECT doc_id, pos, max(lcp) AS m FROM cov
             GROUP BY 1, 2 HAVING max(lcp) >= $MinSpan),
       iv AS (SELECT doc_id, pos AS s, pos + m AS e FROM m),
       mk AS (SELECT doc_id, s, e,
                max(e) OVER (PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS pmax
              FROM iv),
       br AS (SELECT doc_id, s, e,
                CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
                  AS brk
              FROM mk),
       isl AS (SELECT doc_id, s, e,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS isl
               FROM br),
       spans AS (SELECT doc_id, min(s)::BIGINT AS span_start,
                        max(e)::BIGINT AS span_end
                 FROM isl GROUP BY doc_id, isl)"""

  val oracles: Map[String, String] = Map(
    "q_suffix_array" ->
      s"""$sufCte
         SELECT doc_id, pos, (rn - 1)::BIGINT AS sa FROM ord""",
    "q_dup_spans" ->
      s"""$spansSql
         SELECT doc_id, span_start, span_end FROM spans""",
    "q_dup_coverage" ->
      s"""$spansSql,
         dc AS (SELECT doc_id,
                       sum(span_end - span_start)::BIGINT AS dup_chars
                FROM spans GROUP BY 1),
         base AS (SELECT doc_id, length(t)::BIGINT AS n_chars FROM d
                  WHERE length(t) > 0)
         SELECT base.doc_id, base.n_chars,
                coalesce(dc.dup_chars, 0)::BIGINT AS dup_chars,
                round(coalesce(dc.dup_chars, 0) / base.n_chars, 6)
                  AS dup_frac,
                round(coalesce(dc.dup_chars, 0) / base.n_chars, 6)
                  >= 0.5e0 AS drop_doc
         FROM base LEFT JOIN dc ON dc.doc_id = base.doc_id""",
    "q_longest_repeat" ->
      s"""$sufCte, $adjCte,
         t AS (SELECT doc_a, pos_a, doc_b, pos_b, lcp FROM lc
               ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b
               LIMIT $TopN)
         SELECT t.doc_a, t.pos_a, t.doc_b, t.pos_b, t.lcp,
                substr(d.t, t.pos_a::INT, t.lcp::INT) AS repeat_str
         FROM t JOIN d ON d.doc_id = t.doc_a"""
  )
}
