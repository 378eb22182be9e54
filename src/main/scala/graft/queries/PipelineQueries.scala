package graft.queries

import graft.Sessions.table
import graft.operators.{DocPipeline, FrequentParagraphs, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Document-pipeline operators (WARC→spans, wc, frequent paragraphs,
  * multimodal plumbing) over synthetic frames derived from the driver's
  * tables. The spanize chain carries a DuckDB oracle (the derived HTML is
  * simple enough to mirror in SQL list functions); the stateful/hash
  * stages are rows-only and parity-tested in ScalaTest.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** documents.text rendered as a small HTML page: paragraphs split on
    * the word " slow ", one img tag per doc.
    */
  private def htmlFrame(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"),
      col("source"),
      concat(lit("<p>"),
             call_function("replace", col("text"), lit(" slow "),
                           lit("</p><p>")),
             lit("</p><p>common footer paragraph for "), col("source"),
             lit(" shared across documents</p>"),
             lit("<img src=\"http://img.example.com/"), col("doc_id"),
             lit(".png\">")).as("chunk_body"),
      lit("text/html").as("mime"))

  val defs: Map[String, Q] = Map(
    // S4/F13–F15/F20 + A7: html -> spans -> word/char counts through the
    // full production spanize chain.
    "q_spanize_wc" -> { (s, dir) =>
      val sp = DocPipeline.spanize(htmlFrame(s, dir))
      sp.select(
        col("doc_id"),
        size(col("spans")).cast(LongType).as("n_spans"),
        DocPipeline.wcWords(col("spans")).cast(LongType).as("n_words"),
        DocPipeline.wcChars(col("spans")).cast(LongType).as("n_chars"))
    },

    // A5 same-doc span dedup on top of spanize (counts after dedup).
    "q_span_dedup" -> { (s, dir) =>
      val sp = DocPipeline.spanize(htmlFrame(s, dir))
        .withColumn("spans", DocPipeline.sameDocDedup(col("spans")))
      sp.select(col("doc_id"), size(col("spans")).cast(LongType).as("n_spans"))
    },

    // ---- rows-only ----

    // A3 frequent-paragraph collection per "domain" (= source), docs in
    // doc_id order, via the production secondary-sort collector.
    "q_frequent_collect" -> { (s, dir) =>
      graft.expressions.MinHashExpressions.register(s)
      val b = graft.functions.MinHashF.optimalBands(0.95)
      val docs = DocPipeline.spanize(htmlFrame(s, dir))
        .select(col("source").as("domain"),
                col("doc_id").cast(LongType).as("ord"),
                col("doc_id"), col("spans"))
        .withColumn("pbands", FrequentParagraphs.paragraphBandsCol(
          FrequentParagraphs.textSpans(col("spans")), b))
      FrequentParagraphs.collect(docs)
        .select("domain", "pdata_id", "score", "count")
    },

    // A4 frequent-paragraph removal end-to-end (doc survival counts).
    "q_frequent_filter" -> { (s, dir) =>
      graft.expressions.MinHashExpressions.register(s)
      val b = graft.functions.MinHashF.optimalBands(0.95)
      // persist: the spanize + per-paragraph 256-perm minhash chain is the
      // dominant cost and is consumed 3x (collect, band rows, final join)
      val docs = DocPipeline.spanize(htmlFrame(s, dir))
        .select(col("source").as("domain"),
                col("doc_id").cast(LongType).as("ord"),
                col("doc_id"), col("spans"))
        .withColumn("pbands", FrequentParagraphs.paragraphBandsCol(
          FrequentParagraphs.textSpans(col("spans")), b))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val freq = FrequentParagraphs.collect(docs)
      FrequentParagraphs.filterFrequent(docs, freq)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
             sum(size(col("spans"))).as("n_spans"))
    },

    // Multimodal plumbing: synthetic media bytes -> stub features ->
    // per-prefix feature norms (binary column + typed metadata shape).
    "q_media_features" -> { (s, dir) =>
      val media = table(s, dir, "documents").select(
        concat(lit("media://img/"), col("doc_id")).as("media_ref"),
        lit("image/png").as("mime"),
        encode(col("text"), "UTF-8").as("bytes"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480 + 1).cast("int").as("height"),
        lit(null).cast(LongType).as("duration_ms"))
      Multimodal.extractFeatures(media, dim = 16)
        .select(col("media_ref"),
          round(aggregate(col("features").cast("array<double>"), lit(0.0),
                          (acc, x) => acc + x * x), 4).as("feat_sq"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_spanize_wc" ->
      """WITH s AS (
           SELECT doc_id,
                  list_append(
                    list_filter(
                      list_transform(string_split(text, ' slow '),
                                     x -> trim(regexp_replace(x, '\s+', ' ', 'g'))),
                      x -> length(x) >= 10),
                    'common footer paragraph for ' || source ||
                    ' shared across documents') AS paras
           FROM documents)
         SELECT doc_id,
           CAST(len(paras) + 1 AS BIGINT) AS n_spans,
           CAST(coalesce(list_aggregate(
             list_transform(paras,
               x -> len(string_split_regex(x, '\s+'))), 'sum'), 0)
             AS BIGINT) AS n_words,
           CAST(coalesce(list_aggregate(
             list_transform(paras, x -> length(x)), 'sum'), 0)
             + greatest(len(paras) - 1, 0) AS BIGINT) AS n_chars
         FROM s""",
    "q_span_dedup" ->
      """WITH s AS (
           SELECT doc_id,
                  list_distinct(
                    list_append(
                      list_filter(
                        list_transform(string_split(text, ' slow '),
                                       x -> trim(regexp_replace(x, '\s+', ' ', 'g'))),
                        x -> length(x) >= 10),
                      'common footer paragraph for ' || source ||
                      ' shared across documents')) AS paras
           FROM documents)
         SELECT doc_id, CAST(len(paras) + 1 AS BIGINT) AS n_spans
         FROM s"""
  )
}
