package graft.queries

import graft.Sessions.table
import graft.operators.{Bpe, Curation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Curation-stage operators under the driver gate: PII scrubbing,
  * benchmark decontamination and greedy sequence packing. The PII rows
  * synthesize their sensitive spans deterministically from doc_id (the
  * fixture text is clean word soup), the same formula on both engines;
  * decontamination and packing run over the documents table as-is.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Shared whitespace tokenization, DuckDB side (matches
    * split(trim(text), "\\s+") — the repo-wide token semantics).
    */
  private val toksSql = "string_split_regex(trim(text), '\\s+')"

  private val PackBudget = 200L
  private val NgramN = 8
  private val BpeMerges = 8

  // exactly 12 whitespace tokens each — one paragraph chunk when
  // PREPENDED (chunking is 12-token windows from position 0)
  private val BannerA =
    "cookie notice we use cookies to improve your experience accept all now"
  private val BannerB =
    "subscribe to our newsletter for the latest updates delivered every week free"

  /** The deterministic re-lined page shared by q_c4_filter and
    * q_curation_pipeline: doc_id%4+2 words per line, terminal
    * punctuation on lines with (doc_id+i)%3 < 2, plus the three
    * planted hazards (javascript line at %7, brace page at %23,
    * lorem-ipsum page at %31). Mirrored 1:1 in `relinedSql`.
    */
  private def relinedDocs(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast(LongType)
    val lWords = (pmod(id, lit(4L)) + 2).cast("int")
    val toks = split(trim(col("text")), "\\s+")
    val nLines = ceil(size(toks) / lWords.cast("double")).cast("int")
    val base = transform(sequence(lit(0), nLines - 1), i =>
      concat(concat_ws(" ", slice(toks, i * lWords + 1, lWords)),
        element_at(array(lit("."), lit("?"), lit("")),
          (pmod(id + i, lit(3L)) + 1).cast("int"))))
    def planted(m: Long, line: String) =
      when(pmod(id, lit(m)) === 0, array(lit(line)))
        .otherwise(array().cast("array<string>"))
    val lines = concat(base,
      planted(7, "please enable javascript to continue."),
      planted(23, "function f() { return 0; }"),
      planted(31, "standard lorem ipsum placeholder text here."))
    table(s, dir, "documents").select(
      col("doc_id"), array_join(lines, "\n").as("text"))
  }

  /** Blocklist for q_blocklist_scrub: fixture-vocabulary phrases with
    * deliberate overlap structure ("park" inside "spark", a phrase
    * sharing its head with a shorter pattern) so Aho–Corasick failure
    * links and suffix outputs are all on the hash path. Order matters:
    * the pattern id is the tie-break for first_pattern.
    */
  private val BlockPats = Seq(
    "customer part", "customer", "spark", "park",
    "order merge", "stream a small")

  val defs: Map[String, Q] = Map(
    // Aho–Corasick blocklist gate: every (overlapping) occurrence of
    // every pattern in one linear scan per doc; the oracle brute-counts
    // each (doc, pattern)'s start positions by direct substring
    // comparison, so automaton construction, failure links, overlap
    // counting, first-match tie-breaks and the drop verdict all
    // hash-check.
    "q_blocklist_scrub" -> { (s, dir) =>
      graft.operators.Blocklist.matchReport(
        table(s, dir, "documents").select("doc_id", "text"),
        "text", BlockPats, maxHits = 3)
        .select(col("doc_id"), col("n_hits"), col("n_patterns"),
          col("first_pos"), col("first_pattern"), col("drop_doc"))
    },
    // PII scrubbing as codegen'd regex columns. The fixture text carries
    // no PII, so each row gets a deterministic email/IP/phone suffix
    // appended from doc_id — the oracle builds the identical string and
    // replays the same RE2-safe patterns, so any divergence in pattern
    // semantics, rule order (emails first, by contract) or counting
    // breaks the hash.
    "q_pii_scrub" -> { (s, dir) =>
      val id = col("doc_id").cast(LongType)
      val withPii = table(s, dir, "documents").select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact u"), id, lit("@ex"), pmod(id, lit(7L)), lit(".com"),
          lit(" or u"), id, lit("@mail.example.org"),
          lit(" host 10."), pmod(id, lit(256L)), lit("."),
          pmod(id * 7, lit(256L)), lit(".4"),
          lit(" tel +1-555-"), pmod(id, lit(900L)) + 100,
          lit("-"), lpad(pmod(id * 3, lit(10000L)).cast("string"), 4, "0")
        ).as("text"))
      Curation.scrubPii(withPii, "text").select(
        col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
        col("clean_text"))
    },

    // Benchmark decontamination: docs sharing any 8-token gram with the
    // "eval suite" (every 37th doc stands in for it). The corpus side
    // never shuffles by gram — the benchmark gram set is broadcast.
    "q_decontaminate" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(37L)) === 0)
      Curation.decontaminate(docs, "doc_id", "text", bench, "text",
          n = NgramN)
        .select(col("doc_id"), col("n_shared"), col("contaminated"))
    },

    // Deterministic source mixing: 20 fixture sources get formula
    // weights (srcK -> (K%5+1)*2 over denominator 120), target 300
    // docs. The keep decision is pure int64 arithmetic on both engines,
    // so the boolean column hash-matches exactly.
    "q_source_mix" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val weights = docs.select(col("source")).distinct()
        .withColumn("w_num",
          (pmod(col("source").substr(lit(4), lit(10)).cast(LongType),
            lit(5L)) + 1) * 2)
      Curation.mixSources(docs, "doc_id", "source", weights,
          weightDen = 120L, targetTotal = 300L)
        .select(col("doc_id"), col("source"), col("kept"))
    },

    // Gopher repetition signals: duplicate 5-gram and duplicate
    // 12-token-paragraph fractions as pure array columns (no explode).
    // The fixture soup never repeats a 5-gram, so doc_id % 4 copies of
    // a spam phrase are appended (same formula in the oracle) to give
    // the dup fractions a real distribution to match.
    "q_quality_repetition" -> { (s, dir) =>
      val p = " spam alert buy now click here"
      val spam = element_at(
        array(lit(""), lit(p), lit(p * 2), lit(p * 3)),
        (pmod(col("doc_id").cast(LongType), lit(4L)) + 1).cast("int"))
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), spam).as("text"))
      Curation.repetitionSignals(docs, "text")
        .select(col("doc_id"), col("n_grams"), col("dup_gram_frac"),
          col("n_pars"), col("dup_par_frac"))
    },

    // Model-based quality filter: multinomial NB trained on a
    // deterministic doc_id-parity labeling, classifying the same table.
    // The all-integer micro-unit decision (prior + token sums as longs)
    // means pred/llr hash-check exactly — the oracle replays training
    // counts, add-1 smoothing, 6dp-log10 rounding and the comparison.
    "q_quality_classify" -> { (s, dir) =>
      val docs = table(s, dir, "documents").withColumn("__pos",
        pmod(col("doc_id").cast(LongType), lit(2L)) === 0)
      val m = graft.operators.QualityClassifier.train(docs, "__pos")
      graft.operators.QualityClassifier.classify(docs, m)
        .select(col("doc_id"), col("n_tokens"), col("llr"), col("pred"))
    },

    // DSIR importance weights: target = every 37th doc (the eval-suite
    // stand-in, same convention as q_decontaminate), features = hashed
    // uni+bigrams (md5 hex-prefix arithmetic), weight = micro-exact
    // log10 ratio sum. The oracle replays hashing, counts, smoothing
    // and the micro-unit sum.
    "q_dsir_weights" -> { (s, dir) =>
      val docs = table(s, dir, "documents").withColumn("__t",
        pmod(col("doc_id").cast(LongType), lit(37L)) === 0)
      val m = graft.operators.Dsir.train(docs, "__t", buckets = 1024)
      graft.operators.Dsir.weigh(docs, m)
        .select(col("doc_id"), col("n_feats"), col("llw"))
    },

    // Greedy sequence packing: shard = doc_id % 8, order = doc_id,
    // 200-token windows. Per-shard sequential semantics, distributed by
    // decomposition; the oracle replays the fold as a recursive CTE.
    "q_seq_pack" -> { (s, dir) =>
      val docs = table(s, dir, "documents").select(
        col("doc_id"),
        pmod(col("doc_id").cast(LongType), lit(8L)).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("nt"))
      Curation.packSequences(docs, "doc_id", "shard", "doc_id", "nt",
          budget = PackBudget)
        .select(col("doc_id"), col("shard"), col("window_id"),
          col("n_tokens"), col("token_offset"))
    },

    // CCNet-style corpus-wide paragraph dedup: first occurrence (by
    // doc_id, position) of every paragraph hash survives, later copies
    // are dropped, docs are rebuilt from survivors. The fixture soup
    // never repeats a 12-token chunk, so 2/3 of docs get one of two
    // 12-token banners PREPENDED (prepending keeps chunk alignment —
    // the banner IS chunk 0), giving the window real duplicate groups.
    "q_par_dedup" -> { (s, dir) =>
      val sel = pmod(col("doc_id").cast(LongType), lit(3L))
      val docs = table(s, dir, "documents").select(col("doc_id"),
        when(sel === 1, concat(lit(BannerA), lit(" "), col("text")))
          .when(sel === 2, concat(lit(BannerB), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      Curation.dedupParagraphs(docs, "doc_id", "text")
    },

    // Exact per-source length percentiles (p50/p90/p99 order stats, no
    // sketch) — the packing/curation sizing profile.
    "q_length_pcts" -> { (s, dir) =>
      graft.operators.CorpusStats.lengthPercentiles(
        table(s, dir, "documents"), "source", "n_chars")
    },

    // Document dating: synthetic ISO dates planted per doc (every 7th
    // doc only a malformed one; %3==1 adds a valid leap date, %3==2 a
    // REJECTED non-leap Feb 29) — extraction, civil-date validation and
    // integer epoch-day normalization all replayed by the oracle.
    "q_doc_dates" -> { (s, dir) =>
      val id = col("doc_id").cast("long")
      val date1 = format_string("%04d-%02d-%02d",
        (id % 25 + 2000), (id % 12 + 1), (id % 28 + 1))
      val text2 = when(id % 7 === 0, lit("no date 2023-13-40 here"))
        .otherwise(concat(lit("v "), date1,
          when(id % 3 === 1, lit(" x 2024-02-29"))
            .when(id % 3 === 2, lit(" y 2025-02-29"))
            .otherwise(lit(""))))
      graft.operators.Curation.extractDates(
        table(s, dir, "documents").select(col("doc_id"),
          text2.as("text")))
    },

    // Calibration table of the NB quality classifier: 10 equal-rank
    // score bins vs gold label — monotonicity/saturation audit of the
    // filter before trusting its threshold.
    "q_quality_calibration" -> { (s, dir) =>
      val docs = table(s, dir, "documents").withColumn("__pos",
        pmod(col("doc_id").cast(LongType), lit(2L)) === 0)
      val m = graft.operators.QualityClassifier.train(docs, "__pos")
      val scored = graft.operators.QualityClassifier.classify(docs, m)
        .select(col("doc_id"), col("llr"), col("pred"))
        .join(docs.select(col("doc_id"), col("__pos")), Seq("doc_id"))
      graft.operators.Curation.calibrationTable(scored, "llr", "__pos",
        "pred", "doc_id", bins = 10)
    },

    // Wilson lower-bound quality ranking per source (z=1.96): the
    // small-sample-honest pass-rate ranking — a 2/2 source must not
    // outrank a 95/100 one. Pass = n_chars >= 400.
    "q_wilson_quality" -> { (s, dir) =>
      graft.operators.CorpusStats.wilsonLowerBound(
        table(s, dir, "documents"), "source", col("n_chars") >= 400)
    },

    // FineWeb-style per-language quality gate: keep the best 30% of
    // every lang by n_chars ((score desc, doc_id) exact-quota window).
    // Small languages keep their own bar — the oracle replays the
    // per-group ceil quota.
    "q_quality_topfrac" -> { (s, dir) =>
      Curation.keepTopFraction(
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"), "n_chars", "doc_id", num = 3L, den = 10L)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("kept"))
    },

    // Luhn-validated card scrubbing: doc_id%4 plants a valid card, an
    // invalid near-miss (same digits, bad check digit — a bare regex
    // would redact it), two valid cards, or none. Both engines replay
    // the digit-doubling checksum and the replace fold.
    "q_pii_luhn" -> { (s, dir) =>
      val sel = pmod(col("doc_id").cast(LongType), lit(4L))
      val docs = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(sel === 1, lit(" card 4539578763621486 thanks"))
            .when(sel === 2, lit(" card 4539578763621487 thanks"))
            .when(sel === 3,
              lit(" c1 4111111111111111 and c2 1234567812345670"))
            .otherwise(lit(""))).as("text"))
      Curation.scrubLuhn(docs, "text")
        .select(col("doc_id"), col("n_cc"), col("clean_text"))
    },

    // Efraimidis–Spirakis weighted sample: weights = n_chars, k = 100,
    // "uniform" = first 8 md5 hex digits of doc_id. The oracle rebuilds
    // u from the same digits (unicode-arithmetic hex decode), ranks
    // ln(u)/w identically and emits the same kept set.
    "q_weighted_sample" -> { (s, dir) =>
      Curation.sampleWeighted(
        table(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").as("w")),
        "doc_id", "w", k = 100)
        .select(col("doc_id"), col("w"), col("kept"))
    },

    // Overlapping sliding-window chunking (window 12, stride 8): every
    // token covered, consecutive chunks share 4 words, short final
    // chunks and shorter-than-window docs exact. The oracle replays
    // chunk counts, offsets and slices.
    "q_chunk_stride" -> { (s, dir) =>
      Curation.chunkWithStride(table(s, dir, "documents"), "doc_id",
        "text", window = 12, stride = 8)
    },

    // Cross-document duplicate 5-gram fraction (RefinedWeb signal,
    // distinct from q_quality_repetition's within-doc form): 2/3 of
    // docs get one of two 12-token banners PREPENDED, so banner grams
    // are corpus-duplicated while the soup grams stay unique. The
    // oracle replays gram explosion, per-doc-gram counts, the corpus
    // doc-count join and the occurrence-weighted fraction.
    "q_dup_ngram_cross" -> { (s, dir) =>
      val sel = pmod(col("doc_id").cast(LongType), lit(3L))
      val docs = table(s, dir, "documents").select(col("doc_id"),
        when(sel === 1, concat(lit(BannerA), lit(" "), col("text")))
          .when(sel === 2, concat(lit(BannerB), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      Curation.crossDupGramFraction(docs, "doc_id", "text", n = 5)
    },

    // Token-budget water-filling over the 20 fixture sources: caps =
    // per-source whitespace-token totals, weights = the q_source_mix
    // formula, target 12000 — high enough that high-weight sources
    // saturate at their caps, so the saturated prefix, the proportional
    // fill AND the largest-remainder +1s all exercise. Pure int64 —
    // the oracle replays the closed-form fill with the same windows.
    "q_mixture_alloc" -> { (s, dir) =>
      val src = table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(split(trim(col("text")), "\\s+")).cast(LongType))
          .as("cap"))
        .withColumn("w",
          (pmod(col("source").substr(lit(4), lit(10)).cast(LongType),
            lit(5L)) + 1) * 2)
      Curation.allocateBudget(src, "source", "cap", "w", target = 12000L)
    },

    // C4 page/line cleaning (Raffel et al. 2020 §2.2): the fixture soup
    // (no newlines, no punctuation) is deterministically re-lined —
    // doc_id%4+2 words per line, terminal punctuation on lines where
    // (doc_id+i)%3 < 2 — plus three planted hazards: a javascript line
    // (doc_id%7), a brace page (doc_id%23), a lorem-ipsum page
    // (doc_id%31). The oracle builds the identical page and replays the
    // line predicate and both page gates.
    "q_c4_filter" -> { (s, dir) =>
      Curation.c4Filter(relinedDocs(s, dir), "text")
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          col("has_bad_phrase"), col("keep"), col("clean_text"))
    },

    // The curation funnel COMPOSED under one oracle: re-lined pages →
    // C4 line/page cleaning → Flesch readability over the SURVIVORS'
    // clean text → keep the top half of each language by flesch
    // ((flesch desc, doc_id) exact-quota window). One row per input
    // doc with its funnel verdicts — c4_keep, flesch (null once
    // dropped), final_keep — so a wrong decision at ANY stage breaks
    // the hash.
    "q_curation_pipeline" -> { (s, dir) =>
      val c4 = Curation.c4Filter(relinedDocs(s, dir), "text")
      val scored = graft.operators.CorpusStats.readability(
        c4.filter(col("keep"))
          .select(col("doc_id"), col("clean_text").as("text")), "text")
      val withLang = scored
        .join(table(s, dir, "documents").select("doc_id", "lang"),
          "doc_id")
        .select(col("doc_id"), col("lang"), col("flesch"))
      val gated = Curation.keepTopFraction(withLang, Seq("lang"),
        "flesch", "doc_id", num = 1L, den = 2L)
      c4.select(col("doc_id"), col("keep").as("c4_keep"))
        .join(gated.select(col("doc_id"), col("lang"), col("flesch"),
          col("kept").as("__fk")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("c4_keep"), col("lang"),
          col("flesch"),
          coalesce(col("__fk"), lit(false)).as("final_keep"))
    },

    // BPE tokenizer training: ONE corpus-wide word-count shuffle, then
    // 8 merge iterations over the vocabulary table (pair-count partial
    // agg + one-row argmax, ties (cnt desc, a, b)). The oracle replays
    // the same iterations unrolled — pair counts as plain CTEs, the
    // left-to-right non-overlapping merge scan as one recursive-CTE
    // fold per iteration (DuckDB's RE2 lacks the lookaround the Spark
    // side uses, so the two realizations are fully independent).
    "q_bpe_merges" -> { (s, dir) =>
      import s.implicits._
      val docs = table(s, dir, "documents")
      val (merges, _) = Bpe.train(Bpe.wordCounts(docs, "text"), BpeMerges)
      merges.map(m => (m.rank.toLong, m.a, m.b, m.cnt))
        .toDF("merge_rank", "a", "b", "cnt")
    },

    // The trained segmentation of every vocabulary word (the state
    // q_bpe_encode joins against).
    "q_bpe_vocab" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val (_, vocab) = Bpe.train(Bpe.wordCounts(docs, "text"), BpeMerges)
      vocab.select(col("word"), col("c"), col("seg"))
    },

    // Encode the corpus with the learned merges: distinct words pay the
    // merge chain once, the corpus joins the segmented vocab by word.
    "q_bpe_encode" -> { (s, dir) =>
      val docs = table(s, dir, "documents")
      val (merges, _) = Bpe.train(Bpe.wordCounts(docs, "text"), BpeMerges)
      Bpe.encode(docs, "doc_id", "text", merges)
    },

    // Content-defined chunking: the fixture soup gets a 24-token banner
    // INSERTED at a doc-dependent token offset (doc_id%5+1) — the
    // misalignment that breaks fixed-window paragraph dedup and that
    // CDC exists to survive (boundaries depend on local content only,
    // so the banner's interior chunks are identical at any offset).
    // The oracle replays tokenization, the md5 window-hash boundary
    // rule, the cumsum chunk ids and the rebuild.
    "q_cdc_chunks" -> { (s, dir) =>
      Curation.cdcChunks(cdcDocs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("chunk_id"), col("n_toks"),
          col("chunk_text"))
    },

    // Corpus-wide chunk-level dedup over the CDC chunks: first
    // occurrence of each distinct chunk survives, later copies count
    // as duplicate tokens (the storage-dedup measure).
    "q_cdc_dedup" -> { (s, dir) =>
      Curation.cdcDedup(cdcDocs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          col("toks_total"), col("toks_dup"))
    },

    // Per-host token-budget cap (domain balancing): within each source,
    // docs in (n_chars desc, doc_id) quality order ship until the
    // running token total crosses the budget. Pure window cumsum — the
    // kept decision is exact integer arithmetic on both engines.
    "q_host_budget" -> { (s, dir) =>
      val docs = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        (-col("n_chars")).cast(LongType).as("__ord"),
        size(split(trim(col("text")), "\\s+")).cast(LongType)
          .as("n_tokens"))
      Curation.capHostBudget(docs, "doc_id", "source", "__ord",
          "n_tokens", budget = HostBudget)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_before"), col("kept"))
    },

    // Deterministic k-per-group sample: 5 docs per source in
    // (md5(doc_id), doc_id) order — the content-derived uniform order
    // both engines reproduce (rand() cannot be oracled).
    "q_sample_group" -> { (s, dir) =>
      Curation.samplePerGroup(table(s, dir, "documents"),
          "source", "doc_id", k = 5)
        .select(col("doc_id"), col("source"), col("rk"))
    },

    // Stratified sample: exactly ceil(10%) of every (lang, source)
    // stratum, kept rows content-derived (md5 order) so the SAME rows
    // survive under any partitioning or engine.
    "q_stratified_sample" -> { (s, dir) =>
      Curation.sampleStratified(table(s, dir, "documents"),
          Seq("lang", "source"), "doc_id", num = 1L, den = 10L)
        .select("doc_id", "lang", "source")
    }
  )

  private val HostBudget = 400L

  /** The CDC fixture frame: banner (A+B or B+A, 24 tokens) inserted
    * after the first doc_id%5+1 tokens for 2/3 of docs.
    */
  private def cdcDocs(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val k = (pmod(col("doc_id").cast(LongType), lit(5L)) + 1).cast("int")
    val sel = pmod(col("doc_id").cast(LongType), lit(3L))
    val banner = when(sel === 1, lit(s"$BannerA $BannerB"))
      .otherwise(lit(s"$BannerB $BannerA"))
    table(s, dir, "documents").select(col("doc_id"),
      when(sel === 0, col("text")).otherwise(concat_ws(" ",
        array_join(slice(toks, lit(1), k), " "),
        banner,
        array_join(slice(toks, k + 1, size(toks) - k), " "))).as("text"))
  }

  /** Hex-digit value of char `i` of the md5 column `h` — the SQL twin
    * of Dsir.bucketCol's character arithmetic.
    */
  private def hexDigit(i: Int): String =
    s"(CASE WHEN unicode(substr(h, $i, 1)) >= 97" +
      s" THEN unicode(substr(h, $i, 1)) - 87" +
      s" ELSE unicode(substr(h, $i, 1)) - 48 END)"

  /** SQL twin of [[relinedDocs]] + the C4 line/page machinery, shared
    * by q_c4_filter and q_curation_pipeline. Ends at CTE `g`
    * (doc_id, ls, kl, bad).
    */
  private val c4CtesSql: String =
    """d AS (
           SELECT doc_id,
                  string_split_regex(trim(text), '\s+') AS t,
                  CAST(doc_id AS BIGINT) % 4 + 2 AS L
           FROM documents),
         b AS (
           SELECT doc_id,
                  list_transform(
                    range(CAST(ceil(len(t) / (L * 1.0)) AS BIGINT)),
                    i -> array_to_string(t[(i*L+1):(i*L+L)], ' ') ||
                         CASE (doc_id + i) % 3 WHEN 0 THEN '.'
                              WHEN 1 THEN '?' ELSE '' END) AS ls
           FROM d),
         f AS (
           SELECT doc_id,
                  ls || CASE WHEN doc_id % 7 = 0
                          THEN ['please enable javascript to continue.']
                          ELSE []::VARCHAR[] END
                     || CASE WHEN doc_id % 23 = 0
                          THEN ['function f() { return 0; }']
                          ELSE []::VARCHAR[] END
                     || CASE WHEN doc_id % 31 = 0
                          THEN ['standard lorem ipsum placeholder text here.']
                          ELSE []::VARCHAR[] END AS ls
           FROM b),
         k AS (
           SELECT doc_id, ls, array_to_string(ls, chr(10)) AS page,
                  list_filter(ls, l ->
                    regexp_matches(l, '[.!?"]\s*$')
                    AND len(string_split_regex(trim(l), '\s+')) >= 3
                    AND NOT regexp_matches(lower(l), '\bjavascript\b'))
                    AS kl
           FROM f),
         g AS MATERIALIZED (
           SELECT doc_id, ls, kl,
                  (contains(lower(page), 'lorem ipsum')
                   OR contains(page, '{')) AS bad
           FROM k)"""

  private val bucketExpr: String =
    "(" + (2 to 6).foldLeft(hexDigit(1))((acc, i) =>
      s"($acc * 16 + ${hexDigit(i)})") + ") % 1024"

  /** One unrolled BPE iteration for the DuckDB oracle: pair counts from
    * `w{i-1}`, deterministic argmax, then the left-to-right
    * non-overlapping merge scan as a recursive-CTE fold per word
    * (RE2 has no lookaround, so the Spark side's boundary-asserting
    * regexp cannot be reused — by design: two independent
    * realizations of the same contract).
    */
  private def bpeIterSql(i: Int): String = {
    val prev = i - 1
    s"""p$i AS MATERIALIZED (
           SELECT syms[j] AS a, syms[j+1] AS b, sum(c)::BIGINT AS cnt
           FROM w$prev, unnest(generate_series(1, len(syms)-1)) AS t(j)
           GROUP BY 1, 2),
         best$i AS MATERIALIZED (
           SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         m$i(word, c, pos, out) AS (
           SELECT word, c, 1, []::VARCHAR[] FROM w$prev
           UNION ALL
           SELECT m.word, m.c,
                  CASE WHEN m.pos < len(s.syms) AND s.syms[m.pos] = q.a
                            AND s.syms[m.pos+1] = q.b
                       THEN m.pos + 2 ELSE m.pos + 1 END,
                  m.out || CASE WHEN m.pos < len(s.syms)
                                     AND s.syms[m.pos] = q.a
                                     AND s.syms[m.pos+1] = q.b
                                THEN [q.a || q.b] ELSE [s.syms[m.pos]] END
           FROM m$i m JOIN w$prev s USING (word) CROSS JOIN best$i q
           WHERE m.pos <= len(s.syms)),
         w$i AS MATERIALIZED (
           SELECT m.word, m.c, m.out AS syms
           FROM m$i m JOIN w$prev s USING (word)
           WHERE m.pos > len(s.syms))"""
  }

  /** Shared CTE prefix: tokenize, word counts, initial symbolization,
    * then `BpeMerges` unrolled iterations.
    */
  private val bpeBaseSql: String =
    s"""WITH RECURSIVE
         toks AS MATERIALIZED (
           SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           FROM documents),
         w0 AS MATERIALIZED (
           SELECT word, count(*)::BIGINT AS c,
                  regexp_extract_all(word, '.') || ['</w>'] AS syms
           FROM toks GROUP BY word),
         """ + (1 to BpeMerges).map(bpeIterSql).mkString(",\n         ")

  /** Shared CDC replay: the banner-insertion fixture, tokenization,
    * the md5 window-hash boundary rule (w=3, p=8 — Curation.cdcChunks
    * defaults), cumsum chunk ids and the chunk rebuild.
    */
  private val cdcBaseSql: String =
    s"""d AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN text
                       ELSE array_to_string(t[1:k], ' ') || ' ' ||
                            CASE WHEN doc_id % 3 = 1
                                 THEN '$BannerA $BannerB'
                                 ELSE '$BannerB $BannerA' END ||
                            ' ' || array_to_string(t[k+1:len(t)], ' ')
                  END AS text
           FROM (SELECT doc_id, text, $toksSql AS t,
                        CAST(doc_id % 5 + 1 AS INTEGER) AS k
                 FROM documents)),
         tk AS (SELECT doc_id, $toksSql AS t FROM d),
         b AS (
           SELECT doc_id, i, t[i] AS tok,
                  CASE WHEN (i >= 3 AND
                             CAST('0x' || substr(md5(array_to_string(
                               t[greatest(i-2, 1):i], ' ')), 1, 4)
                               AS BIGINT) % 8 = 0) OR i = len(t)
                       THEN 1 ELSE 0 END AS bnd
           FROM (SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t
                 FROM tk)),
         c AS (
           SELECT doc_id, i, tok,
                  coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS chunk_id
           FROM b),
         chunks AS (
           SELECT doc_id, chunk_id, count(*)::BIGINT AS n_toks,
                  string_agg(tok, ' ' ORDER BY i) AS chunk_text
           FROM c GROUP BY 1, 2)"""

  val oracles: Map[String, String] = Map(
    "q_blocklist_scrub" -> {
      val vals = BlockPats.zipWithIndex
        .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
      s"""WITH pats AS (SELECT * FROM (VALUES $vals) p(pid, pat)),
         d AS (SELECT doc_id, lower(text) AS t FROM documents),
         occ AS (SELECT d.doc_id, pats.pid, pats.pat,
                   list_filter(range(1, length(t) - length(pat) + 2),
                     i -> substr(t, i::INT, length(pat)) = pat) AS ps
                 FROM d, pats),
         st AS (SELECT doc_id, pid, pat, len(ps) AS c,
                       CASE WHEN len(ps) > 0 THEN ps[1] END AS fi
                FROM occ),
         agg AS (SELECT doc_id, sum(c)::BIGINT AS n_hits,
                        count(*) FILTER (c > 0)::BIGINT AS n_patterns,
                        min(fi) AS fp
                 FROM st GROUP BY 1),
         fpat AS (SELECT st.doc_id, min(st.pid) AS fpid
                  FROM st JOIN agg USING (doc_id)
                  WHERE st.fi = agg.fp GROUP BY 1)
         SELECT agg.doc_id, agg.n_hits, agg.n_patterns,
                coalesce(agg.fp, 0)::BIGINT AS first_pos,
                coalesce(p.pat, '') AS first_pattern,
                agg.n_hits >= 3 AS drop_doc
         FROM agg
         LEFT JOIN fpat ON fpat.doc_id = agg.doc_id
         LEFT JOIN pats p ON p.pid = fpat.fpid"""
    },
    "q_par_dedup" ->
      s"""WITH d AS (
           SELECT doc_id,
                  CASE CAST(doc_id AS BIGINT) % 3
                    WHEN 1 THEN '$BannerA ' || text
                    WHEN 2 THEN '$BannerB ' || text
                    ELSE text END AS text
           FROM documents),
         toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
           FROM d),
         par AS (
           SELECT doc_id,
                  unnest(range(CAST(ceil(len(t) / 12.0) AS BIGINT))) AS p_id,
                  t
           FROM toks),
         pt AS (
           SELECT doc_id, p_id,
                  array_to_string(t[(p_id*12+1):(p_id*12+12)], ' ') AS ptext
           FROM par),
         r AS (
           SELECT doc_id, p_id, ptext,
                  row_number() OVER (PARTITION BY md5(ptext)
                                     ORDER BY doc_id, p_id) AS rn
           FROM pt)
         SELECT doc_id, count(*)::BIGINT AS n_pars,
                sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                coalesce(string_agg(CASE WHEN rn = 1 THEN ptext END, ' '
                                    ORDER BY p_id), '') AS clean_text
         FROM r GROUP BY doc_id""",

    "q_length_pcts" ->
      """WITH r AS (
           SELECT source, n_chars AS v,
                  CAST(row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars ASC)
                       AS BIGINT) AS rw,
                  count(*) OVER (PARTITION BY source) AS n
           FROM documents)
         SELECT source, CAST(max(n) AS BIGINT) AS n,
                max(CASE WHEN rw = greatest(
                      CAST(ceil(0.5e0 * n) AS BIGINT), 1) THEN v END)
                  AS p50,
                max(CASE WHEN rw = greatest(
                      CAST(ceil(0.9e0 * n) AS BIGINT), 1) THEN v END)
                  AS p90,
                max(CASE WHEN rw = greatest(
                      CAST(ceil(0.99e0 * n) AS BIGINT), 1) THEN v END)
                  AS p99
         FROM r GROUP BY 1""",
    "q_doc_dates" ->
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0 THEN 'no date 2023-13-40 here'
                       ELSE 'v ' || printf('%04d-%02d-%02d',
                                           doc_id % 25 + 2000,
                                           doc_id % 12 + 1,
                                           doc_id % 28 + 1)
                            || CASE WHEN doc_id % 3 = 1
                                      THEN ' x 2024-02-29'
                                    WHEN doc_id % 3 = 2
                                      THEN ' y 2025-02-29'
                                    ELSE '' END
                  END AS text
           FROM documents),
         ex AS (
           SELECT doc_id,
                  unnest(regexp_extract_all(text,
                    '([0-9]{4})-([0-9]{2})-([0-9]{2})', 0)) AS ds
           FROM t),
         p AS (
           SELECT doc_id, ds,
                  CAST(substr(ds, 1, 4) AS BIGINT) AS y,
                  CAST(substr(ds, 6, 2) AS BIGINT) AS m,
                  CAST(substr(ds, 9, 2) AS BIGINT) AS d
           FROM ex),
         v AS (
           SELECT doc_id, y, m, d,
                  (y - CASE WHEN m <= 2 THEN 1 ELSE 0 END) AS yp,
                  CASE WHEN m IN (1,3,5,7,8,10,12) THEN 31
                       WHEN m IN (4,6,9,11) THEN 30
                       WHEN y % 4 = 0 AND (y % 100 <> 0 OR y % 400 = 0)
                         THEN 29 ELSE 28 END AS dim
           FROM p),
         dd AS (
           SELECT doc_id,
                  CAST(floor(yp / 400.0) AS BIGINT) * 146097
                  + ((yp - CAST(floor(yp / 400.0) AS BIGINT) * 400) * 365
                     + CAST(floor((yp - CAST(floor(yp / 400.0) AS BIGINT)
                                   * 400) / 4.0) AS BIGINT)
                     - CAST(floor((yp - CAST(floor(yp / 400.0) AS BIGINT)
                                   * 400) / 100.0) AS BIGINT)
                     + CAST(floor((153 * (m + CASE WHEN m > 2 THEN -3
                                               ELSE 9 END) + 2) / 5.0)
                            AS BIGINT) + d - 1)
                  - 719468 AS day
           FROM v
           WHERE y BETWEEN 1600 AND 9999 AND m BETWEEN 1 AND 12
                 AND d BETWEEN 1 AND dim)
         SELECT t.doc_id,
                CAST(coalesce(a.n, 0) AS BIGINT) AS n_dates,
                CAST(coalesce(a.mn, -1) AS BIGINT) AS first_day,
                CAST(coalesce(a.mx, -1) AS BIGINT) AS last_day
         FROM t LEFT JOIN (
           SELECT doc_id, count(*) AS n, min(day) AS mn, max(day) AS mx
           FROM dd GROUP BY 1) a ON a.doc_id = t.doc_id""",
    "q_wilson_quality" ->
      """WITH g AS (
           SELECT source, count(*)::BIGINT AS n,
                  CAST(sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END)
                       AS BIGINT) AS k
           FROM documents GROUP BY 1),
         w AS (
           SELECT source, n, k,
                  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                  CAST(n AS DOUBLE) AS nd
           FROM g)
         SELECT source, n, k,
                round(((p + 3.8416e0 / (2.0e0 * nd))
                       - 1.96e0 * sqrt((p * (1.0e0 - p)
                                        + 3.8416e0 / (4.0e0 * nd)) / nd))
                      / (1.0e0 + 3.8416e0 / nd), 6) AS wilson_lb
         FROM w""",
    "q_quality_topfrac" ->
      """WITH r AS (
           SELECT doc_id, lang, n_chars,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT doc_id, lang, n_chars,
                rk <= (n * 3 + 9) // 10 AS kept
         FROM r""",

    "q_pii_luhn" ->
      """WITH d AS (
           SELECT doc_id,
                  text || CASE CAST(doc_id AS BIGINT) % 4
                    WHEN 1 THEN ' card 4539578763621486 thanks'
                    WHEN 2 THEN ' card 4539578763621487 thanks'
                    WHEN 3 THEN ' c1 4111111111111111 and c2 1234567812345670'
                    ELSE '' END AS text
           FROM documents),
         v AS (
           SELECT doc_id, text,
                  list_filter(regexp_extract_all(text, '[0-9]{16}'),
                    n -> list_sum(list_transform(range(1, 17), i ->
                      CASE WHEN i % 2 = 0 THEN
                        CASE WHEN (unicode(n[17-i]) - 48) * 2 > 9
                             THEN (unicode(n[17-i]) - 48) * 2 - 9
                             ELSE (unicode(n[17-i]) - 48) * 2 END
                      ELSE unicode(n[17-i]) - 48 END)) % 10 = 0)
                    AS valid
           FROM d)
         SELECT doc_id, len(valid)::BIGINT AS n_cc,
                list_reduce(list_concat([text], list_distinct(valid)),
                  (acc, x) -> replace(acc, x, '<CC>')) AS clean_text
         FROM v""",

    "q_weighted_sample" ->
      s"""WITH m AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         k AS (
           SELECT doc_id, w,
                  ln(((${(2 to 8).foldLeft(
                      s"CAST(${hexDigit(1)} AS BIGINT)")((acc, i) =>
                    s"($acc * 16 + ${hexDigit(i)})")}) + 1)
                     / 4294967296.0) / w AS es
           FROM m)
         SELECT doc_id, w,
                row_number() OVER (ORDER BY es DESC, doc_id) <= 100
                  AS kept
         FROM k""",

    "q_chunk_stride" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
           FROM documents),
         c AS (
           SELECT doc_id, tk,
                  unnest(range(CAST(ceil(greatest(len(tk) - 12, 0) / 8.0)
                               AS BIGINT) + 1)) AS i
           FROM t)
         SELECT doc_id, i::BIGINT AS chunk_id,
                (i * 8)::BIGINT AS tok_offset,
                least(len(tk) - i * 8, 12)::BIGINT AS n_toks,
                array_to_string(tk[(i*8+1):(i*8+12)], ' ') AS chunk_text
         FROM c""",

    "q_dup_ngram_cross" ->
      s"""WITH d AS (
           SELECT doc_id,
                  CASE CAST(doc_id AS BIGINT) % 3
                    WHEN 1 THEN '$BannerA ' || text
                    WHEN 2 THEN '$BannerB ' || text
                    ELSE text END AS text
           FROM documents),
         t AS (
           SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
           FROM d),
         g AS (
           SELECT doc_id,
                  unnest(list_transform(range(len(tk) - 4),
                    i -> array_to_string(tk[(i+1):(i+5)], ' '))) AS gram
           FROM t WHERE len(tk) >= 5),
         o AS (
           SELECT doc_id, gram, count(*)::BIGINT AS cnt
           FROM g GROUP BY 1, 2),
         c AS (SELECT gram, count(*) AS nd FROM o GROUP BY 1),
         j AS (
           SELECT o.doc_id, sum(o.cnt)::BIGINT AS n_grams,
                  sum(CASE WHEN c.nd > 1 THEN o.cnt ELSE 0 END)::BIGINT
                    AS dup
           FROM o JOIN c USING (gram) GROUP BY 1)
         SELECT d.doc_id,
                coalesce(j.n_grams, 0)::BIGINT AS n_grams,
                CASE WHEN coalesce(j.n_grams, 0) > 0
                     THEN round(j.dup * 1.0 / j.n_grams, 4)
                     ELSE 0.0 END AS dup_frac
         FROM d LEFT JOIN j USING (doc_id)""",

    "q_mixture_alloc" ->
      """WITH src AS (
           SELECT source,
                  sum(len(string_split_regex(trim(text), '\s+')))::BIGINT
                    AS cap,
                  (CAST(substr(source, 4) AS BIGINT) % 5 + 1) * 2 AS w
           FROM documents GROUP BY source),
         t AS (
           SELECT *,
                  sum(w) OVER () AS wt,
                  coalesce(sum(cap) OVER (
                    ORDER BY cap * 1.0 / w, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cumcap,
                  coalesce(sum(w) OVER (
                    ORDER BY cap * 1.0 / w, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cumw
           FROM src),
         s AS (
           SELECT *,
                  cap * (wt - cumw) <= (12000 - cumcap) * w AS sat
           FROM t),
         g AS (
           SELECT *,
                  sum(CASE WHEN sat THEN cap ELSE 0 END) OVER () AS satcap,
                  sum(CASE WHEN sat THEN 0 ELSE w END) OVER () AS w_rest
           FROM s),
         d AS (SELECT *, greatest(12000 - satcap, 0) AS rem FROM g),
         e AS (
           SELECT *,
                  CASE WHEN sat THEN cap
                       WHEN w_rest = 0 THEN 0
                       ELSE (rem * w) // w_rest END AS base_alloc,
                  CASE WHEN sat OR w_rest = 0 THEN -1
                       ELSE (rem * w) % w_rest END AS frac
           FROM d),
         f AS (
           SELECT *,
                  sum(CASE WHEN sat THEN 0
                           ELSE greatest(frac, 0) END) OVER () AS fs,
                  row_number() OVER (ORDER BY frac DESC, source) AS rk
           FROM e)
         SELECT source, cap::BIGINT AS cap, w::BIGINT AS w,
                (base_alloc + CASE WHEN NOT sat AND w_rest > 0
                                    AND rk <= fs // w_rest
                                   THEN 1 ELSE 0 END)::BIGINT AS alloc,
                sat AS saturated
         FROM f""",

    "q_c4_filter" ->
      s"""WITH $c4CtesSql
         SELECT doc_id,
                len(ls)::BIGINT AS n_lines,
                len(kl)::BIGINT AS n_kept,
                bad AS has_bad_phrase,
                (NOT bad AND len(kl) >= 5) AS keep,
                CASE WHEN NOT bad AND len(kl) >= 5
                     THEN array_to_string(kl, chr(10))
                     ELSE '' END AS clean_text
         FROM g""",

    "q_curation_pipeline" ->
      s"""WITH $c4CtesSql,
         surv AS (
           SELECT doc_id, array_to_string(kl, chr(10)) AS text
           FROM g WHERE NOT bad AND len(kl) >= 5),
         w AS (
           SELECT doc_id, text,
                  string_split_regex(trim(text), '\\s+') AS wl
           FROM surv),
         m AS (
           SELECT doc_id,
                  len(wl)::BIGINT AS n_words,
                  greatest(len(regexp_extract_all(text, '[.!?]+')),
                           1)::BIGINT AS n_sentences,
                  (len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   + len(list_filter(wl, x ->
                       NOT regexp_matches(lower(x), '[aeiouy]'))))::BIGINT
                    AS n_syllables
           FROM w),
         fl AS (
           SELECT doc_id,
                  round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                                - 84.6 * (n_syllables * 1.0 / n_words),
                        4) AS flesch
           FROM m),
         lj AS (
           SELECT fl.doc_id, d2.lang, fl.flesch
           FROM fl JOIN documents d2 ON d2.doc_id = fl.doc_id),
         r AS (
           SELECT *,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY flesch DESC, doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM lj)
         SELECT g2.doc_id,
                (NOT g2.bad AND len(g2.kl) >= 5) AS c4_keep,
                r.lang, r.flesch,
                coalesce(r.rk <= (r.n * 1 + 1) // 2, FALSE)
                  AS final_keep
         FROM g g2 LEFT JOIN r ON r.doc_id = g2.doc_id""",

    "q_bpe_merges" ->
      (bpeBaseSql + "\n         " +
        (1 to BpeMerges).map(i =>
          s"SELECT CAST($i AS BIGINT) AS merge_rank, a, b, cnt FROM best$i")
          .mkString("\n         UNION ALL ")),

    "q_bpe_vocab" ->
      (bpeBaseSql +
        s"\n         SELECT word, c, array_to_string(syms, ' ') AS seg" +
        s" FROM w$BpeMerges"),

    "q_bpe_encode" ->
      (bpeBaseSql +
        s"""
         SELECT t.doc_id, count(*)::BIGINT AS n_words,
                sum(len(w.syms))::BIGINT AS n_tokens
         FROM toks t JOIN w$BpeMerges w USING (word)
         GROUP BY 1"""),

    "q_dsir_weights" ->
      s"""WITH d AS (
           SELECT doc_id, doc_id % 37 = 0 AS tgt,
                  string_split_regex(trim(lower(text)), '\\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, tgt, unnest(toks) AS g FROM d
           UNION ALL
           SELECT doc_id, tgt,
                  unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS g
           FROM d),
         f AS (
           SELECT doc_id, tgt, $bucketExpr AS b
           FROM (SELECT doc_id, tgt, md5(g) AS h FROM g)),
         m AS (
           SELECT b, count(*) AS c_raw,
                  sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
           FROM f GROUP BY 1),
         tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM m),
         s AS (
           SELECT f.doc_id, count(*) AS n_feats,
                  sum(CAST(round((
                    round(log10((coalesce(m.c_tgt, 0) + 1.0)
                                / (tot.t_tgt + 1024)), 6)
                    - round(log10((coalesce(m.c_raw, 0) + 1.0)
                                  / (tot.t_raw + 1024)), 6)) * 1000000)
                    AS BIGINT)) AS w
           FROM f LEFT JOIN m USING (b), tot
           GROUP BY 1)
         SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
                round(w / 1000000.0, 4) AS llw
         FROM s""",

    "q_pii_scrub" ->
      """WITH w AS (
           SELECT doc_id,
                  text || ' contact u' || doc_id || '@ex' || (doc_id % 7)
                    || '.com' || ' or u' || doc_id || '@mail.example.org'
                    || ' host 10.' || (doc_id % 256) || '.'
                    || (doc_id * 7 % 256) || '.4'
                    || ' tel +1-555-' || (doc_id % 900 + 100) || '-'
                    || lpad(CAST(doc_id * 3 % 10000 AS VARCHAR), 4, '0')
                    AS text
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  AS BIGINT) AS n_email,
                CAST(len(regexp_extract_all(text,
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                  AS BIGINT) AS n_ip,
                CAST(len(regexp_extract_all(text,
                  '\+\d{1,2}-\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                  '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')
                  AS clean_text
         FROM w""",

    "q_decontaminate" ->
      s"""WITH d AS (
           SELECT doc_id, $toksSql AS toks FROM documents),
         g AS (
           SELECT DISTINCT doc_id,
                  array_to_string(toks[i + 1 : i + $NgramN], ' ') AS gram
           FROM (SELECT doc_id, toks,
                        unnest(range(0, len(toks) - ${NgramN - 1})) AS i
                 FROM d WHERE len(toks) >= $NgramN)),
         b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
         c AS (SELECT g.doc_id, count(*) AS n_shared
               FROM g JOIN b USING (gram) GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(c.n_shared, 0) AS BIGINT) AS n_shared,
                coalesce(c.n_shared, 0) > 0 AS contaminated
         FROM d LEFT JOIN c ON c.doc_id = d.doc_id""",

    "q_source_mix" ->
      """WITH n AS (
           SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         w AS (
           SELECT source,
                  (CAST(substr(source, 4) AS BIGINT) % 5 + 1) * 2 AS w_num
           FROM (SELECT DISTINCT source FROM documents))
         SELECT d.doc_id, d.source,
                (d.doc_id * 2654435761 % 1000000) * 120 * n.n_docs
                  < w.w_num * 300 * 1000000 AS kept
         FROM documents d
         JOIN n ON n.source = d.source
         JOIN w ON w.source = d.source""",

    "q_quality_repetition" ->
      s"""WITH t AS (
           SELECT doc_id,
                  string_split_regex(trim(text ||
                    repeat(' spam alert buy now click here',
                           CAST(doc_id % 4 AS INTEGER))), '\\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 5
                       THEN list_transform(range(0, len(toks) - 4),
                         i -> array_to_string(toks[i + 1 : i + 5], ' '))
                       ELSE [] END AS grams,
                  list_transform(
                    range(0, CAST(ceil(len(toks) / 12.0) AS BIGINT)),
                    p -> array_to_string(
                      toks[p * 12 + 1 : p * 12 + 12], ' ')) AS pars
           FROM t)
         SELECT doc_id,
                CAST(len(grams) AS BIGINT) AS n_grams,
                CASE WHEN len(grams) > 0
                     THEN round((len(grams) - len(list_distinct(grams)))
                                * 1.0 / len(grams), 4)
                     ELSE 0.0 END AS dup_gram_frac,
                CAST(len(pars) AS BIGINT) AS n_pars,
                CASE WHEN len(pars) > 0
                     THEN round((len(pars) - len(list_distinct(pars)))
                                * 1.0 / len(pars), 4)
                     ELSE 0.0 END AS dup_par_frac
         FROM g""",

    // NB replay: same tokenization (lower + ws split), same count
    // tables, add-1 smoothing, log10 rounded to 6dp immediately, scaled
    // to exact integer micro-units before summing — so the per-doc
    // scores are order-insensitive LONG sums on both engines.
    "q_quality_classify" ->
      """WITH d AS (
           SELECT doc_id, doc_id % 2 = 0 AS pos,
                  string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id, pos, unnest(toks) AS w FROM d),
         words AS (
           SELECT w, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
                  sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
           FROM tok GROUP BY 1),
         tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg,
                        count(*) AS v FROM words),
         dc AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
                       sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
                FROM d),
         pr AS (
           SELECT CAST(round(round(log10(n_pos * 1.0 / (n_pos + n_neg)),
                    6) * 1000000) AS BIGINT) AS p_pos,
                  CAST(round(round(log10(n_neg * 1.0 / (n_pos + n_neg)),
                    6) * 1000000) AS BIGINT) AS p_neg
           FROM dc),
         s AS (
           SELECT t.doc_id, count(*) AS n_tokens,
                  sum(CAST(round(round(log10(
                    (coalesce(words.c_pos, 0) + 1.0) / (tot.t_pos + tot.v)),
                    6) * 1000000) AS BIGINT)) AS sp,
                  sum(CAST(round(round(log10(
                    (coalesce(words.c_neg, 0) + 1.0) / (tot.t_neg + tot.v)),
                    6) * 1000000) AS BIGINT)) AS sn
           FROM tok t LEFT JOIN words USING (w), tot
           GROUP BY 1)
         SELECT s.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                round((sp + pr.p_pos - sn - pr.p_neg) / 1000000.0, 4)
                  AS llr,
                sp + pr.p_pos > sn + pr.p_neg AS pred
         FROM s, pr""",

    "q_quality_calibration" ->
      """WITH d AS (
           SELECT doc_id, doc_id % 2 = 0 AS pos,
                  string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id, pos, unnest(toks) AS w FROM d),
         words AS (
           SELECT w, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
                  sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
           FROM tok GROUP BY 1),
         tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg,
                        count(*) AS v FROM words),
         dc AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
                       sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
                FROM d),
         pr AS (
           SELECT CAST(round(round(log10(n_pos * 1.0 / (n_pos + n_neg)),
                    6) * 1000000) AS BIGINT) AS p_pos,
                  CAST(round(round(log10(n_neg * 1.0 / (n_pos + n_neg)),
                    6) * 1000000) AS BIGINT) AS p_neg
           FROM dc),
         s AS (
           SELECT t.doc_id, t.pos, count(*) AS n_tokens,
                  sum(CAST(round(round(log10(
                    (coalesce(words.c_pos, 0) + 1.0) / (tot.t_pos + tot.v)),
                    6) * 1000000) AS BIGINT)) AS sp,
                  sum(CAST(round(round(log10(
                    (coalesce(words.c_neg, 0) + 1.0) / (tot.t_neg + tot.v)),
                    6) * 1000000) AS BIGINT)) AS sn
           FROM tok t LEFT JOIN words USING (w), tot
           GROUP BY 1, 2),
         sc AS (
           SELECT s.doc_id, s.pos,
                  round((sp + pr.p_pos - sn - pr.p_neg) / 1000000.0, 4)
                    AS llr,
                  sp + pr.p_pos > sn + pr.p_neg AS pred
           FROM s, pr),
         r AS (
           SELECT *, CAST(row_number() OVER (ORDER BY llr ASC,
                            doc_id ASC) - 1 AS BIGINT) AS rw0,
                  count(*) OVER () AS n
           FROM sc),
         b AS (
           SELECT CAST(floor(rw0 * 10.0e0 / n) AS BIGINT) + 1 AS decile,
                  pos, pred
           FROM r)
         SELECT decile, count(*)::BIGINT AS n,
                CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_gold_pos,
                CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_pred_pos,
                round(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                           AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS gold_rate
         FROM b GROUP BY 1""",

    "q_seq_pack" ->
      s"""WITH RECURSIVE d AS (
           SELECT doc_id, doc_id % 8 AS shard,
                  CAST(len($toksSql) AS BIGINT) AS nt,
                  row_number() OVER (PARTITION BY doc_id % 8
                                     ORDER BY doc_id) AS rn
           FROM documents),
         p(shard, rn, doc_id, nt, window_id, fill) AS (
           SELECT shard, rn, doc_id, nt, CAST(0 AS BIGINT), nt
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.shard, d.rn, d.doc_id, d.nt,
                  CASE WHEN p.fill + d.nt <= $PackBudget THEN p.window_id
                       ELSE p.window_id + 1 END,
                  CASE WHEN p.fill + d.nt <= $PackBudget THEN p.fill + d.nt
                       ELSE d.nt END
           FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
         SELECT doc_id, CAST(shard AS BIGINT) AS shard,
                window_id, nt AS n_tokens,
                CAST(fill - nt AS BIGINT) AS token_offset
         FROM p""",

    "q_cdc_chunks" ->
      s"""WITH $cdcBaseSql
         SELECT doc_id, chunk_id, n_toks, chunk_text FROM chunks""",

    "q_cdc_dedup" ->
      s"""WITH $cdcBaseSql,
         r AS (
           SELECT doc_id, chunk_id, n_toks,
                  row_number() OVER (PARTITION BY md5(chunk_text)
                                     ORDER BY doc_id, chunk_id) AS rn
           FROM chunks)
         SELECT doc_id, count(*)::BIGINT AS n_chunks,
                sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                sum(n_toks)::BIGINT AS toks_total,
                sum(CASE WHEN rn > 1 THEN n_toks ELSE 0 END)::BIGINT
                  AS toks_dup
         FROM r GROUP BY 1""",

    "q_host_budget" ->
      s"""WITH d AS (
           SELECT doc_id, source,
                  CAST(len($toksSql) AS BIGINT) AS n_tokens,
                  -n_chars AS ord
           FROM documents),
         w AS (
           SELECT doc_id, source, n_tokens,
                  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                    ORDER BY ord, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cum_before
           FROM d)
         SELECT doc_id, source, n_tokens, cum_before,
                cum_before < $HostBudget AS kept
         FROM w""",

    "q_sample_group" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                    ::BIGINT AS rk
           FROM documents)
         WHERE rk <= 5""",

    "q_stratified_sample" ->
      """WITH r AS (
           SELECT doc_id, lang, source,
                  row_number() OVER (PARTITION BY lang, source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang, source) AS ns
           FROM documents)
         SELECT doc_id, lang, source FROM r
         WHERE rk <= (ns * 1 + 9) // 10"""
  )

}
