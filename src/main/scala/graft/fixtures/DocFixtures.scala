package graft.fixtures

import graft.model.{Doc, Span}
import CrawlFixtures.{draw, mix}

/** Deterministic document fixtures for the dedup / frequent-paragraph /
  * span pipeline (FIXTURES.md §1): zipf-ish hosts, per-host templated
  * paragraphs (frequent-paragraph signal), exact and near duplicate
  * documents at known rates, ~5% media spans, occasional duplicate
  * doc_ids. Pure function of the doc index — driver-side or
  * `spark.range`-distributed generation produce identical rows.
  */
object DocFixtures {

  case class Params(
      nDocs: Long = 800,
      nHosts: Long = 20,
      nTemplates: Long = 40,
      vocabSize: Int = 200
  )

  private val VocabWords: IndexedSeq[String] = {
    val syll = Vector("ka", "re", "mo", "ta", "li", "zu", "ne", "vo", "sa",
                      "pi", "du", "ge", "ho", "ba", "xi")
    (0 until 1000).map { i =>
      val a = syll((i * 7) % syll.size)
      val b = syll((i * 13 + 3) % syll.size)
      val c = syll((i * 29 + 5) % syll.size)
      s"$a$b$c$i"
    }
  }

  def word(p: Params, w: Long): String =
    VocabWords((w % p.vocabSize).toInt)

  def hostOf(i: Long, p: Params): String = {
    val r = draw(i * 3 + 7, 31, 1L << 20).toDouble / (1L << 20)
    val h = math.min((p.nHosts * r * r).toLong, p.nHosts - 1)
    s"d$h.example.com"
  }

  /** Paragraph text for (template, paragraph slot), perturbed by `muts`
    * word replacements keyed by `variantSeed`.
    */
  def paragraph(p: Params, template: Long, slot: Int, muts: Int,
                variantSeed: Long): String = {
    val nWords = 20 + draw(template * 100 + slot, 32, 30).toInt
    val words = Array.tabulate(nWords) { w =>
      word(p, draw(template * 1000 + slot * 50 + w, 33, p.vocabSize))
    }
    var m = 0
    while (m < muts) {
      val pos = draw(variantSeed * 77 + m, 34, nWords).toInt
      words(pos) = word(p, draw(variantSeed * 91 + m, 35, p.vocabSize))
      m += 1
    }
    words.mkString(" ")
  }

  /** Document i: template-derived paragraphs with controlled mutation.
    *   - 10% exact duplicates of an earlier doc's text
    *   -  2% duplicate doc_id (different text)
    *   - 20% near duplicates (1 word changed in each paragraph)
    */
  def docOf(i: Long, p: Params): Doc = {
    val kind = draw(i, 40, 10)
    val baseI =
      if (i > 20 && (kind == 0 || kind == 1 || kind == 2))
        java.lang.Long.remainderUnsigned(mix(i * 5 + 1), i) // earlier doc
      else i
    val template = draw(baseI, 41, p.nTemplates)
    val nParas   = 2 + draw(baseI, 42, 6).toInt
    val muts = kind match {
      case 0     => 0                    // exact text duplicate of baseI
      case 1 | 2 => 1                    // near duplicate of baseI
      case _     => 4                    // distinct
    }
    val variantSeed = if (kind == 1 || kind == 2) i else baseI
    val host  = hostOf(baseI, p)
    val idI   = if (draw(i, 43, 50) == 0 && i > 10) i - 7 else i
    val docId = s"https://$host/doc/$idI"
    val bodySpans = (0 until nParas).flatMap { slot =>
      val para = Span("p", paragraph(p, template, slot, muts, variantSeed),
                      "", slot * 2)
      if (draw(i * 31 + slot, 44, 20) == 0)
        Seq(para, Span("media",
                       "",
                       s"media://$host/img/${draw(i * 31 + slot, 45, 1000)}",
                       slot * 2 + 1))
      else Seq(para)
    }
    // per-host boilerplate: a footer paragraph shared by ~70% of the
    // host's docs (frequent-paragraph signal) and a rarer banner (~30%)
    val hostId = hostOf(baseI, p).drop(1).takeWhile(_.isDigit).toLong
    val footer =
      if (draw(i, 46, 10) < 7)
        Seq(Span("p", paragraph(p, p.nTemplates + hostId, 0, 0, hostId), "", 0))
      else Seq.empty
    val banner =
      if (draw(i, 47, 10) < 3)
        Seq(Span("p", paragraph(p, 2 * p.nTemplates + hostId, 1, 0, hostId), "", 0))
      else Seq.empty
    val spans = (banner ++ bodySpans ++ footer).zipWithIndex
      .map { case (s, idx) => s.copy(offset = idx) }
    Doc(docId, spans)
  }

  /** Full text = '\n'.join(text paragraphs) (cc_corpus/corpus.py:112–126). */
  def textOf(d: Doc): String =
    d.spans.filter(_.kind == "p").map(_.text).mkString("\n")

  def docs(p: Params): Seq[Doc] = (0L until p.nDocs).map(docOf(_, p))
}
