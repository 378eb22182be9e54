package graft.sources

import graft.sources.TsvUnits.{TsvDocument, TsvParagraph, TsvSentence}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The emtsv analysis stage (scripts/emtsv.py) with the
  * environment-bound NLP service swapped for a documented seam — the
  * same pattern as Fetch.Transport for the network. What IS real and
  * deterministic here:
  *
  *   - quntoken's tokenization semantics (emtsv.py:123–156): sentence
  *     split, words and punctuation as separate tokens, and the
  *     ≤3-consecutive-punctuation cap (the surplus is DROPPED from the
  *     tsv but kept in the text — `!!!!!!!!` would break PurePos);
  *   - the Unit-tree construction (doc/par/sentence comments in the
  *     reference's exact format) rendering byte-compatible with
  *     TsvUnits.parseDocs;
  *   - the analyzer seam: an `Analyzer` maps token rows [form, wsafter]
  *     to analyzed rows; the default stand-in derives lemma/xpostag by
  *     deterministic rules so the whole path is oracle-able. A real
  *     emtsv REST client plugs in here unchanged.
  */
object Emtsv {

  /** Adds analysis columns to one sentence's token rows. Input rows are
    * [form]; output rows must all have the same arity.
    */
  type Analyzer = Seq[Seq[String]] => Seq[Seq[String]]

  private val SentenceEnd = "(?<=[.!?])\\s+"
  // Unicode letter/digit classes: quntoken's domain is Hungarian, where
  // an ASCII-only word class would fragment á/é/ő/ű into per-character
  // tokens — the class must agree with isPunct's isLetterOrDigit
  private val TokenRe = "[\\p{L}\\p{N}']+|[^\\p{L}\\p{N}'\\s]".r

  private def isPunct(t: String): Boolean =
    t.nonEmpty && t.forall(c => !c.isLetterOrDigit && !c.isWhitespace)

  /** quntoken stand-in: sentences split at [.!?]+whitespace; words and
    * single punctuation marks are separate tokens; at most 3 punct
    * tokens in a row survive (emtsv.py:149–155).
    */
  def tokenizeSentences(text: String): Seq[(String, Seq[String])] =
    text.trim.split(SentenceEnd).toSeq.filter(_.nonEmpty).map { sent =>
      val raw = TokenRe.findAllIn(sent).toSeq
      var punctRun = 0
      val kept = raw.flatMap { t =>
        if (isPunct(t)) {
          if (punctRun == 3) None
          else { punctRun += 1; Some(t) }
        } else { punctRun = 0; Some(t) }
      }
      (sent, kept)
    }

  /** Deterministic analyzer stand-in: lemma = lowercased form, xpostag
    * from surface shape (emMorph-flavored tags so downstream tsv ops —
    * cleanXpostagCol, BERT conversion — see realistic values).
    */
  val standInAnalyzer: Analyzer = rows => rows.map { r =>
    val form = r.head
    val lemma = form.toLowerCase
    val tag =
      if (isPunct(form)) "[Punct]"
      else if (form.forall(_.isDigit)) "[/Num][Nom]"
      else if (form.headOption.exists(_.isUpper)) "[/N][Nom]"
      else "[/V][Prs.NDef.3Sg]"
    r ++ Seq(lemma, tag)
  }

  /** Analyze one document's text into the reference's Unit tree: each
    * input paragraph (the caller splits — spans or whole text) becomes
    * a `# newpar`, each sentence a `# text = ` comment with analyzed
    * token rows. Comments use the reference's id scheme (docId, pN,
    * pN-sM).
    */
  def analyzeDoc(docId: String, paragraphs: Seq[String],
                 analyzer: Analyzer = standInAnalyzer): TsvDocument = {
    val pars = paragraphs.zipWithIndex.flatMap { case (ptext, pi) =>
      val sents = tokenizeSentences(ptext).zipWithIndex.map {
        case ((stext, toks), si) =>
          TsvSentence(s"# text = $stext",
            analyzer(toks.map(Seq(_))))
      }
      if (sents.isEmpty) None
      else Some(TsvParagraph(s"# newpar id = ${docId}-p${pi + 1}", sents))
    }
    TsvDocument(s"# newdoc id = $docId", pars)
  }

  private val tokenSchema = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("p_id", IntegerType),
    StructField("s_id", IntegerType),
    StructField("t_id", IntegerType),
    StructField("form", StringType),
    StructField("lemma", StringType),
    StructField("xpostag", StringType)))

  /** Distributed analysis to the exploded token view: (doc_id, text) →
    * one row per token with analysis columns. The analyzer runs inside
    * the task (one instance per partition would hold a service client —
    * the per-thread-sessions shape of the reference).
    */
  def analyzeTokens(docs: DataFrame, analyzer: Analyzer = standInAnalyzer,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(tokenSchema)
    docs.select(col(idCol).cast("string"), col(textCol))
      .mapPartitions { it =>
        it.flatMap { r =>
          val docId = r.getString(0)
          val tree = analyzeDoc(docId, Seq(r.getString(1)), analyzer)
          for {
            (p, pi) <- tree.paragraphs.iterator.zipWithIndex
            (s, si) <- p.sentences.iterator.zipWithIndex
            (t, ti) <- s.tokens.iterator.zipWithIndex
          } yield Row(docId, pi + 1, si + 1, ti + 1,
                      t.head, t(1), t(2))
        }
      }(enc)
  }
}
