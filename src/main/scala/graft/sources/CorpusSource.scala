package graft.sources

import graft.model.{Doc, Span}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus document source/sink (SURVEY.md §2.1 S5/S8/S9/S12, §2.5 O7/O8).
  *
  * The reference's JSONL form is `{id, meta, text}` with
  * `text = '\n'.join(paragraphs)` (cc_corpus/corpus.py:112–126); the
  * legacy semi-XML form is not reimplemented (explicitly out of scope,
  * SURVEY.md §2.1 S5). Our native table is the input_hint span table; the
  * JSONL bridge maps between the two.
  */
object CorpusSource {

  val jsonlSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("meta", MapType(StringType, StringType)),
    StructField("text", StringType)
  ))

  /** S5: JSONL corpus → span-table documents. Explicit schema, never
    * inferred (SURVEY.md §1.2); paragraphs = text split on newline.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(jsonlSchema).json(path)
      .select(
        col("id").as("doc_id"),
        col("meta").as("attrs"),
        filter(
          transform(split(col("text"), "\n"),
            (t, i) => struct(lit("p").as("kind"), t.as("text"),
                             lit("").as("media_ref"),
                             i.cast(IntegerType).as("offset"))),
          s => length(s.getField("text")) > 0
        ).as("spans"))

  /** S12: span-table documents → JSONL export (text spans joined with
    * newlines, media refs carried in meta).
    */
  def writeJsonl(docs: DataFrame, path: String,
                 maxRecordsPerFile: Long = 5000): Unit =
    docs.select(
        col("doc_id").as("id"),
        map(lit("media_refs"),
            array_join(
              transform(
                filter(col("spans"), s => s.getField("kind") === "media"),
                s => s.getField("media_ref")), " ")).as("meta"),
        array_join(
          transform(
            filter(col("spans"), s => s.getField("kind") === "p"),
            s => s.getField("text")), "\n").as("text"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .json(path)

  /** S8/S9/O7: fixed-size batched parquet sink — the BatchWriter /
    * RotatedGzip / renumber trio (cc_corpus/io.py:55–78,
    * renumber_corpus_files.py:51–90) collapses to range partitioning on
    * the order column plus a per-file record cap: file numbering equals
    * ordering, sizes are even.
    */
  def writeBatched(df: DataFrame, path: String, ordCol: String,
                   recordsPerFile: Long = 2500,
                   numFiles: Int = 0): Unit = {
    val n = if (numFiles > 0) numFiles
    else math.max(1, (df.count() / recordsPerFile).toInt)
    df.repartitionByRange(n, col(ordCol))
      .sortWithinPartitions(ordCol)
      .write
      .option("maxRecordsPerFile", recordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** O8: seeded deterministic shuffle — the producer/consumer TSV
    * shuffler (shuffle_tsv.py:59–224) is an orderBy over a seeded hash.
    */
  def shuffled(df: DataFrame, seed: Long, idCol: String): DataFrame =
    df.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
}
