package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trafilatura-style main-content extractor — the reference's second
  * extractor choice next to JusText (cc_corpus/boilerplate.py:61–74
  * offers both). Re-implements the published algorithm's core signals
  * (Barbaresi 2021, "Trafilatura: a web scraping library"), not the
  * library:
  *
  *   1. prune unwanted sections wholesale (nav/header/footer/aside/form);
  *   2. prefer explicit main-content containers: if any text sits inside
  *      article/main, extraction is restricted to those subtrees;
  *   3. per-block link-density cut (> 0.5 is navigation, not prose);
  *   4. minimum block length (headings exempt);
  *   5. first-wins de-duplication of repeated blocks (trafilatura's
  *      duplicate filter).
  *
  * The HTML parse is one UDF (shared with JusText —
  * Boilerplate.parseBlocksCtx); every decision after it is pure
  * DataFrame column/window work, so the whole pipeline is shuffle-light:
  * one window per doc for the main-content flag and the dedup, both
  * partitioned by the document key (bounded groups — blocks per page).
  */
object Trafilatura {

  val MaxLinkDensity = 0.5
  val MinBlockChars  = 10

  val parseCtxUdf = udf((html: String) => Boilerplate.parseBlocksCtx(html))

  /** Exploded per-block decisions. Output: (docCol, p_idx, text,
    * link_chars, heading, kept, drop_reason) — drop_reason in
    * {"", "unwanted", "not_main", "link_density", "short", "dup"}.
    */
  def classify(docs: DataFrame, htmlCol: String, docCol: String): DataFrame = {
    val wDoc = Window.partitionBy(col(docCol))
    // dedup ranks within (doc, text, drop_reason): only structurally
    // KEPT occurrences compete, so a copy inside nav does not consume
    // the first-occurrence slot of the body copy
    val wDup = Window.partitionBy(col(docCol), col("text"), col("drop_reason"))
      .orderBy(col("p_idx").asc)
    docs
      .select(col(docCol),
              posexplode(parseCtxUdf(col(htmlCol))).as(Seq("p_idx", "b")))
      .select(col(docCol), col("p_idx"),
              col("b.text").as("text"),
              col("b.link_chars").as("link_chars"),
              col("b.heading").as("heading"),
              col("b.unwanted").as("unwanted"),
              col("b.in_main").as("in_main"))
      // restrict to article/main only when the page has one
      .withColumn("has_main", max(col("in_main")).over(wDoc))
      .withColumn("drop_reason",
        when(col("unwanted"), lit("unwanted"))
          .when(col("has_main") && !col("in_main"), lit("not_main"))
          .when(col("link_chars") > length(col("text")) * MaxLinkDensity,
                lit("link_density"))
          .when(length(col("text")) < MinBlockChars && !col("heading"),
                lit("short"))
          .otherwise(lit("")))
      // duplicate filter runs over the survivors of the structural cuts,
      // first occurrence wins
      .withColumn("dup_rank", row_number().over(wDup))
      .withColumn("drop_reason",
        when(col("drop_reason") === "" && col("dup_rank") > 1, lit("dup"))
          .otherwise(col("drop_reason")))
      .withColumn("kept", col("drop_reason") === "")
      .drop("has_main", "dup_rank", "unwanted", "in_main")
  }

  /** Per-document local form — identical rules to `classify`/`extract`,
    * for pipeline embedding (DocPipeline.spanize extractor choice).
    */
  def extractLocal(html: String): Seq[String] = {
    val blocks = Boilerplate.parseBlocksCtx(html)
    val hasMain = blocks.exists(_.in_main)
    val seen = scala.collection.mutable.HashSet.empty[String]
    blocks.iterator
      .filter(b => !b.unwanted)
      .filter(b => !hasMain || b.in_main)
      .filter(b => b.link_chars <= b.text.length * MaxLinkDensity)
      .filter(b => b.text.length >= MinBlockChars || b.heading)
      .filter(b => seen.add(b.text))
      .map(_.text)
      .toSeq
  }

  /** Multi-chunk UDF form (content conversion may emit several HTML
    * chunks per record — DocPipeline.convertChunks).
    */
  val extractChunksUdf = udf((chunks: Seq[String]) => chunks.flatMap(extractLocal))

  /** Kept paragraphs per document in order, re-numbered 1..n — the
    * extractor contract mirroring Boilerplate.extract.
    */
  def extract(docs: DataFrame, htmlCol: String, docCol: String): DataFrame =
    classify(docs, htmlCol, docCol)
      .filter(col("kept"))
      .withColumn("seq",
        row_number().over(
          Window.partitionBy(col(docCol)).orderBy(col("p_idx").asc)))
      .select(col(docCol), col("seq").cast("long").as("seq"), col("text"))
}
