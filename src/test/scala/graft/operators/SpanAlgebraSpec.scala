package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

case class Span(kind: String, text: String, media_ref: String,
                offset: Int)

class SpanAlgebraSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(spans: Span*) =
    Seq((7L, spans)).toDF("doc_id", "spans")

  test("normalize: text runs merge, empties drop, offsets re-derive") {
    val out = DocPipeline.normalizeSpans(doc(
      Span("text", "ab", "", 0), Span("text", "cd", "", 1),
      Span("image", "", "img:1", 2), Span("text", "", "", 3),
      Span("text", "ef", "", 4), Span("image", "", "", 5)))
      .orderBy("ord").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, "text", "ab cd", "", 0L),       // merged, 5 chars
      (1L, "image", "", "img:1", 5L),      // offset = merged text before
      (2L, "text", "ef", "", 5L)))         // ref-less image dropped
  }

  test("normalize: adjacent media never merge") {
    val out = DocPipeline.normalizeSpans(doc(
      Span("image", "", "a", 0), Span("image", "", "b", 1)))
      .orderBy("ord").collect()
    assert(out.length == 2)
    assert(out.map(_.getString(4)).toSeq == Seq("a", "b"))
  }

  test("truncate: budget cuts inside a text span; later media falls") {
    val r = DocPipeline.truncateSpans(doc(
      Span("text", "x" * 30, "", 0), Span("image", "", "m", 1),
      Span("text", "y" * 30, "", 2), Span("image", "", "m2", 3)),
      maxChars = 40L).head()
    // span0 fully (30), media kept (cum 30 < 40), span2 cut to 10,
    // media3 dropped (cum 60 >= 40)
    assert(r.getAs[Long]("n_spans_kept") == 3L)
    assert(r.getAs[Long]("text_chars_kept") == 40L)
    assert(r.getAs[Boolean]("truncated"))
  }

  test("truncate: under-budget doc is untouched") {
    val r = DocPipeline.truncateSpans(doc(
      Span("text", "hello", "", 0), Span("image", "", "m", 1)),
      maxChars = 40L).head()
    assert(r.getAs[Long]("n_spans_kept") == 2L)
    assert(r.getAs[Long]("text_chars_kept") == 5L)
    assert(!r.getAs[Boolean]("truncated"))
  }
}
