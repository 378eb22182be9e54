package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The emtsv CoNLL-ish TSV corpus format (reference: cc_corpus/tsv.py:
  * 19–126): a header line of field names, then documents as a 3-level
  * Unit tree — `# newdoc id =` starts a Document, `# newpar id =` a
  * Paragraph, `# text =` a Sentence; non-comment lines are token rows
  * (tab-separated fields); a token row before any `# text` comment is a
  * format error (tsv.py:117–119).
  *
  * Spark-first shape: a FILE is the parallelism unit (exactly the
  * reference's file-per-process model, scripts/convert_tsv.py:215–230),
  * parsed by one task into NESTED rows — one row per document with
  * paragraphs/sentences/tokens as array-of-struct columns. Downstream
  * analysis uses the exploded token view (pure column work); round-trip
  * uses `render`, which reproduces the reference's `__str__`
  * serialization byte-for-byte (tsv.py:53–74).
  */
object TsvUnits {

  case class TsvSentence(comment: String, tokens: Seq[Seq[String]])
  case class TsvParagraph(comment: String, sentences: Seq[TsvSentence])
  case class TsvDocument(comment: String, paragraphs: Seq[TsvParagraph])

  /** Parse one file's content (after the optional header line) into
    * documents — the state machine of tsv.py:103–126.
    */
  def parseDocs(content: String, useHeaders: Boolean = true)
      : (Seq[String], Seq[TsvDocument]) = {
    val lines = content.split("\n", -1).iterator
    val header: Seq[String] =
      if (useHeaders && lines.hasNext)
        lines.next().stripLineEnd.split("\t", -1).toSeq
      else Seq.empty
    val docs = scala.collection.mutable.ArrayBuffer.empty[TsvDocument]
    var doc:  scala.collection.mutable.ArrayBuffer[TsvParagraph] = null
    var par:  scala.collection.mutable.ArrayBuffer[TsvSentence]  = null
    var sent: scala.collection.mutable.ArrayBuffer[Seq[String]]  = null
    var docComment: String = null
    var parComment: String = null
    var sentComment: String = null
    def flushSent(): Unit = if (sentComment != null) {
      par += TsvSentence(sentComment, sent.toSeq)
      sentComment = null; sent = null
    }
    def flushPar(): Unit = { flushSent(); if (parComment != null) {
      doc += TsvParagraph(parComment, par.toSeq)
      parComment = null; par = null
    } }
    def flushDoc(): Unit = { flushPar(); if (docComment != null) {
      docs += TsvDocument(docComment, doc.toSeq)
      docComment = null; doc = null
    } }
    var lineNo = if (useHeaders) 1 else 0
    lines.map(_.trim).foreach { line =>
      lineNo += 1
      if (line.startsWith("# ")) {
        if (line.startsWith("# newdoc id = ")) {
          flushDoc()
          docComment = line
          doc = scala.collection.mutable.ArrayBuffer.empty
        } else if (line.startsWith("# newpar id = ")) {
          flushPar()
          parComment = line
          par = scala.collection.mutable.ArrayBuffer.empty
        } else if (line.startsWith("# text = ")) {
          flushSent()
          sentComment = line
          sent = scala.collection.mutable.ArrayBuffer.empty
        }
        // other comments are ignored, as in the reference
      } else if (line.nonEmpty) {
        if (sentComment == null)
          throw new IllegalStateException(
            s"Error on line $lineNo: sentence starts without \"text\" comment.")
        sent += line.split("\t", -1).toSeq
      }
    }
    flushDoc()
    (header, docs.toSeq)
  }

  /** The reference's `__str__` serialization (tsv.py:53–74): units joined
    * by newlines, each sentence followed by a trailing newline.
    */
  def render(doc: TsvDocument): String =
    doc.comment + "\n" + doc.paragraphs.map { p =>
      p.comment + "\n" + p.sentences.map { s =>
        s.comment + "\n" + s.tokens.map(_.mkString("\t")).mkString("\n") + "\n"
      }.mkString("\n")
    }.mkString("\n")

  /** Read a directory/glob of tsv files into nested document rows:
    * (file, doc_idx, doc_comment, doc_id, paragraphs). One task per
    * file — the reference's own unit of parallelism; for bigger-than-
    * task files, split upstream on `# newdoc` boundaries (documents are
    * independent).
    */
  def readTsv(spark: SparkSession, path: String,
              useHeaders: Boolean = true): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (file, content) =>
        val (_, docs) = parseDocs(content, useHeaders)
        docs.zipWithIndex.map { case (d, i) => (file, i, d) }
      }
      .select(col("_1").as("file"), col("_2").as("doc_idx"),
              col("_3.comment").as("doc_comment"),
              expr("substring(_3.comment, 15)").as("doc_id"),
              col("_3.paragraphs").as("paragraphs"))
  }

  /** Exploded token view over nested rows: one row per token with
    * (doc_id, par_idx, sent_idx, tok_idx, fields) — the `tokens()`
    * accumulator (tsv.py:45–51) as columns.
    */
  def tokensView(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
              posexplode(col("paragraphs")).as(Seq("par_idx", "par")))
      .select(col("doc_id"), col("par_idx"),
              posexplode(col("par.sentences")).as(Seq("sent_idx", "sent")))
      .select(col("doc_id"), col("par_idx"), col("sent_idx"),
              col("sent.comment").as("sent_text"),
              posexplode(col("sent.tokens")).as(Seq("tok_idx", "fields")))

  /** Local xpostag cleanup — same rules as cleanXpostagCol
    * (tsv.py:142–154), for the GLF extractor.
    */
  def cleanXpostagLocal(x: String): String = {
    val noEmpty = x.replace("[]", "")
    val sg = "\\[([1-3])\\](?:\\[Sg\\]|\\[S\\]\\[g\\])".r
      .replaceAllIn(noEmpty, m => s"[${m.group(1)}Sg]")
    val pl = "\\[([1-3])\\](?:\\[Pl\\]|\\[P\\]\\[l\\])".r
      .replaceAllIn(sg, m => s"[${m.group(1)}Pl]")
    val slash = "^\\[([NV])\\]".r.replaceAllIn(pl, m => s"[/${m.group(1)}]")
    "\\[\\[+".r.replaceAllIn(slash, "[")
  }

  private val TagP = "\\[[^]]+\\]".r
  private val PunctTags = Set("[Hyph:Dash]", "[Punct]", "[Hyph:Slash]")

  /** The training-format conversion (scripts/convert_tsv.py:77–228):
    * token extraction per sentence — "text" (the `# text` comment,
    * whitespace-split), a named field, or "glf" (lemma + derivational/
    * inflectional emMorph tags, convert_tsv.py:117–155) — optional
    * lowercasing and wordpiece, assembled into output lines: `bert` =
    * one sentence per line + a blank line after each document; `lm` =
    * a blank/<newdoc>/blank preamble per document + one PARAGRAPH per
    * line (sentences joined by spaces).
    */
  def trainingLines(doc: TsvDocument, fields: Map[String, Int],
                    tokenType: String = "text", format: String = "bert",
                    lowerCase: Boolean = false,
                    vocab: Option[Set[String]] = None): Seq[String] = {
    def norm(t: String) = if (lowerCase) t.toLowerCase else t
    def tokensOf(s: TsvSentence): Seq[String] = tokenType match {
      case "text" =>
        if (s.comment.startsWith("# text = "))
          norm(s.comment.drop(9)).split("\\s+").filter(_.nonEmpty).toSeq
        else Seq.empty
      case "glf" =>
        val lemmaIdx = fields("lemma"); val xpIdx = fields("xpostag")
        s.tokens.flatMap { f =>
          var lemma = f(lemmaIdx)
          val xp = cleanXpostagLocal(f(xpIdx))
          val tags = TagP.findAllIn(xp).filter(_ != "[Nom]").toArray
          var lastSlash = -1
          var i = 0
          var done = false
          while (i < tags.length && !done) {
            if (tags(i).charAt(1) != '/' && !PunctTags.contains(tags(i))) done = true
            else lastSlash = i
            i += 1
          }
          if (lastSlash == -1)
            throw new IllegalArgumentException(
              s"No / tag for word $lemma/$xp")
          if (tags.drop(lastSlash).contains("[_Ord/Adj]") && lemma.endsWith("."))
            lemma = lemma.dropRight(1)
          tags(lastSlash) = norm(lemma)
          tags.toSeq
        }
      case field =>
        val idx = fields.getOrElse(field,
          throw new IllegalArgumentException(s"Field $field does not exist"))
        s.tokens.map(f => norm(f(idx)))
    }
    def pieces(toks: Seq[String]): Seq[String] = vocab match {
      case Some(v) =>
        graft.functions.TextAnalysis.wordpiece(toks.mkString(" "), v)
      case None => toks
    }
    val lm = format == "lm"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (lm) { out += ""; out += "<newdoc>"; out += "" }
    doc.paragraphs.foreach { p =>
      if (lm) {
        out += p.sentences.map(s => pieces(tokensOf(s)).mkString(" "))
          .mkString(" ")
      } else {
        p.sentences.foreach(s => out += pieces(tokensOf(s)).mkString(" "))
      }
    }
    if (!lm) out += ""
    out.toSeq
  }

  /** DataFrame form over `readTsv` rows: one output row per line, in
    * document order — (file, doc_idx, line_idx, line). Embarrassingly
    * parallel per document.
    */
  def toTrainingLines(docs: DataFrame, fields: Map[String, Int],
                      tokenType: String = "text", format: String = "bert",
                      lowerCase: Boolean = false,
                      vocab: Option[Set[String]] = None): DataFrame = {
    val linesUdf = udf((comment: String, pars: Seq[TsvParagraph]) =>
      trainingLines(TsvDocument(comment, pars), fields, tokenType, format,
                    lowerCase, vocab))
    docs.select(col("file"), col("doc_idx"), col("doc_comment"),
                col("paragraphs"))
      .withColumn("lines", linesUdf(col("doc_comment"), col("paragraphs")))
      .select(col("file"), col("doc_idx"),
              posexplode(col("lines")).as(Seq("line_idx", "line")))
  }

  /** fix_corpus rule 1 (scripts/fix_corpus.py:52–66): a line with a
    * single field (assumed the form) expands to
    * `form / [] / form / [/N][Nom]`; any other wrong field count is a
    * hard error. Returns (fixed doc, number of fixed lines).
    */
  def fixInvalidLines(doc: TsvDocument, numFields: Int): (TsvDocument, Long) = {
    var fixed = 0L
    val d = doc.copy(paragraphs = doc.paragraphs.map(p =>
      p.copy(sentences = p.sentences.map(s =>
        s.copy(tokens = s.tokens.map { t =>
          if (t.length == numFields) t
          else if (t.length == 1) {
            fixed += 1
            Seq(t.head, "[]", t.head, "[/N][Nom]")
          } else throw new IllegalArgumentException(
            s"Another error: only ${t.length} in line ${t.mkString("\t")}")
        })))))
    (d, fixed)
  }

  /** fix_corpus rule 2 (fix_corpus.py:69–88): insert the `wsafter` field
    * at position 1, derived by walking the sentence's `# text` raw
    * string — `" "` when the next raw char is a space, `""` when glued,
    * `"\n"` after a sentence, `"\n\n"` after a paragraph's last sentence
    * (the two-character escape sequences, as in the reference).
    */
  def addWsafter(doc: TsvDocument): TsvDocument =
    doc.copy(paragraphs = doc.paragraphs.map { p =>
      val nS = p.sentences.length
      p.copy(sentences = p.sentences.zipWithIndex.map { case (s, sIdx) =>
        val raw = s.comment.stripPrefix("# text = ")
        var rawIdx = 0
        val nL = s.tokens.length
        s.copy(tokens = s.tokens.zipWithIndex.map { case (t, lIdx) =>
          rawIdx += t.head.length
          val ws =
            if (lIdx == nL - 1) { if (sIdx == nS - 1) "\\n\\n" else "\\n" }
            else if (rawIdx < raw.length && raw.charAt(rawIdx) == ' ') {
              rawIdx += 1; " "
            } else ""
          t.head +: (s""""$ws"""" +: t.tail)
        })
      })
    })

  /** Sentencepiece → BERT/LM vocabulary conversion
    * (scripts/sentencepiece_to_bert.py:15–55). A vocab file is model
    * state (line number = token id, so ORDER IS THE CONTRACT), not
    * data-scale — this is a deliberate driver-side pure function.
    */
  def spmToBertVocab(lines: Seq[String], tagSet: String = "bert",
                     unusedTokens: Int = -1): Seq[String] = {
    val remove = Set("<unk>", "<s>", "</s>")
    val add =
      if (tagSet == "bert") Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")
      else Seq("<newdoc>", "<unk>")
    val nUnused =
      if (unusedTokens >= 0) unusedTokens
      else if (tagSet == "bert") 1000 else 0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out ++= add
    (1 to nUnused).foreach(i => out += s"[unused$i]")
    lines.foreach { line =>
      val token = line.trim.split("\t")(0)
      if (!remove.contains(token)) {
        if (token.startsWith("▁")) {
          if (token.length > 1) out += token.drop(1)
        } else out += s"##$token"
      }
    }
    out.toSeq
  }

  /** emMorph xpostag cleanup (tsv.py:142–154) as a pure column —
    * regexp_replace chain, codegen'd and SQL-mirrorable:
    * drop empty `[]`, normalize split Sg/Pl person tags, anchor a
    * leading bare [N]/[V] to [/N]/[/V], collapse doubled brackets.
    */
  def cleanXpostagCol(x: Column): Column = {
    val noEmpty = regexp_replace(x, "\\[\\]", "")
    val sg = regexp_replace(noEmpty,
      "\\[([1-3])\\](?:\\[Sg\\]|\\[S\\]\\[g\\])", "[$1Sg]")
    val pl = regexp_replace(sg,
      "\\[([1-3])\\](?:\\[Pl\\]|\\[P\\]\\[l\\])", "[$1Pl]")
    val slash = regexp_replace(pl, "^\\[([NV])\\]", "[/$1]")
    regexp_replace(slash, "\\[\\[+", "[")
  }
}
