package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.{Num, TextFunctions => TF}
import graft.functions.PolyHash64
import graft.operators.TextAnalysis

/** Text-function (SURVEY §2.7 X1–X10) and text-analysis extension
  * queries over the `documents` table. The letter/score/think patterns
  * are exercised on synthesized suffixes so every cascade branch fires
  * on real text; the DuckDB oracle performs the identical synthesis.
  */
object TextQueries {

  // Spark-side synthesized answer text: cycles through the 4 letter
  // patterns; the oracle mirrors this construction 1:1.
  private def synthAnswer(s: SparkSession): org.apache.spark.sql.Column = {
    val l = chr(lit(65) + pmod(col("doc_id"), lit(26)))
    val m = pmod(col("doc_id"), lit(4))
    when(m === 0, concat(col("text"), lit(" ###"), l, lit("###")))
      .when(m === 1, concat(col("text"), lit(" Answer: "), l))
      .when(m === 2, concat(col("text"), lit("\n"), l, lit(".")))
      .otherwise(concat(col("text"), lit(" the correct answer is "), lower(l)))
  }

  private val synthAnswerSql: String =
    """(CASE CAST(doc_id % 4 AS INT)
      | WHEN 0 THEN text || ' ###' || chr(CAST(65 + doc_id % 26 AS INT)) || '###'
      | WHEN 1 THEN text || ' Answer: ' || chr(CAST(65 + doc_id % 26 AS INT))
      | WHEN 2 THEN text || chr(10) || chr(CAST(65 + doc_id % 26 AS INT)) || '.'
      | ELSE text || ' the correct answer is ' || lower(chr(CAST(65 + doc_id % 26 AS INT)))
      | END)""".stripMargin.replace("\n", " ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X1: 4-pattern letter-extraction cascade (letter_extract.py:9-40)
    "x1_letter_extraction" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("letter", TF.extractLetter(synthAnswer(s)))
        .groupBy(col("letter")).agg(count(lit(1)).as("n"))
        .orderBy(col("letter"))
    }),

    // X2: [[x.y]] score extraction with clamp (letter_extract.py:43-53)
    "x2_score_extraction" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("score", TF.extractScore(
          concat(col("text"), lit(" [["),
            pmod(col("doc_id"), lit(15)).cast("string"), lit(".5]]"))))
        .groupBy(col("score")).agg(count(lit(1)).as("n"))
        .orderBy(col("score"))
    }),

    // X4: <think> stripping (judging.py:13-17)
    "x4_strip_thinking" -> ((s, dir) => {
      val wrapped = when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("<think>"), col("text"), lit("</think>  kept tail")))
        .otherwise(col("text"))
      Tables.documents(s, dir)
        .withColumn("slen", length(TF.stripThinking(wrapped)))
        .groupBy(col("lang"))
        .agg(sum(col("slen")).cast("long").as("total_len"),
             count(lit(1)).as("n"))
        .orderBy(col("lang"))
    }),

    // A17 + A12: word-count histogram, reference bins (main.py:426-429)
    "a17_word_histogram" -> ((s, dir) => {
      val wc = TF.wordCount(col("text"))
      Tables.documents(s, dir)
        .withColumn("bin",
          when(wc < 50, "0-49").when(wc < 100, "50-99")
            .when(wc < 200, "100-199").when(wc < 400, "200-399")
            .when(wc < 600, "400-599").otherwise("600+"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),

    // F4: case-insensitive substring search (main.py:102-114)
    "f4_search_documents" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(lower(col("text")).contains("join the"))
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .orderBy(col("source"))
    }),

    // Extension: language-ID heuristic — predicted vs labeled confusion
    "t1_langid_confusion" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", TextAnalysis.toks(col("text")))
        .withColumn("predicted", TextAnalysis.langIdFromTokens(col("toks")))
        .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // Extension: line-level language segmentation — per-line langID
    // verdicts rolled into a per-doc language-mix summary. The corpus
    // is single-line, so mixed documents are synthesized (the oracle
    // mirrors the synthesis 1:1): every 3rd doc gains a German and a
    // French line, every 3rd+1 doc a blank line (filter must drop it)
    // plus a Spanish line.
    "t15_line_langid" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3))
      val synth = when(m === 0, concat(col("text"),
          lit("\nder und die das ist nicht mit zu den ein"),
          lit("\nle la les et est pas pour que une dans")))
        .when(m === 1, concat(col("text"),
          lit("\n\nel los las es no por para una como pero")))
        .otherwise(col("text"))
      TextAnalysis.langSegmentSummary(
          Tables.documents(s, dir).select(col("doc_id"), synth.as("text")))
        .orderBy(col("doc_id"))
    }),

    // Extension: quality scoring — per-row sample (exact doubles)
    "t2_quality_sample" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(pmod(col("doc_id"), lit(25)) === 0)
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Extension: BPE-ish token counting per language
    "t3_token_count_by_lang" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(sum(TF.tokenCount(col("text"))).cast("long").as("total_tokens"),
             sum(TF.wordCount(col("text"))).cast("long").as("total_words"))
        .orderBy(col("lang"))
    }),

    // Extension: exact θ-heavy-hitter vocabulary — Misra-Gries
    // candidate sweep (shuffle bounded by 1/θ, not vocabulary size) +
    // exact confirm; the sketch is plan-only, the counts are exact
    "t13_frequent_terms" -> ((s, dir) =>
      graft.operators.Frequent.frequentTerms(
        Tables.documents(s, dir), num = 1, denom = 150)),

    // Extension: Gopher repetition signals per doc — duplicate-line
    // fraction/chars, top-n-gram char share, duplicated-n-gram char
    // coverage. The corpus is repetition-free, so every other sampled
    // doc gets its first 12 words appended twice (the oracle mirrors
    // the synthesis 1:1) — both the zero and the non-zero branch of
    // every signal fire.
    "t14_repetition_signals" -> ((s, dir) => {
      val w = split(col("text"), " ")
      val rep = concat(col("text"), lit(" "),
        array_join(slice(w, 1, 12), " "), lit(" "),
        array_join(slice(w, 1, 12), " "))
      val docs = Tables.documents(s, dir)
        .where(pmod(col("doc_id"), lit(25)) === 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(50)) === 0, rep)
            .otherwise(col("text")).as("text"))
      TextAnalysis.repetitionSignals(docs).orderBy(col("doc_id"))
    }),

    // Extension: PII/URL scrubbing over deterministically injected PII
    "t5_pii_scrub" -> ((s, dir) => {
      import graft.operators.Scrub
      val m = pmod(col("doc_id"), lit(3))
      val synth = when(m === 0, concat(col("text"),
          lit(" visit https://ex"), pmod(col("doc_id"), lit(7)).cast("string"), lit(".com now")))
        .when(m === 1, concat(col("text"), lit(" mail bob"),
          pmod(col("doc_id"), lit(5)).cast("string"), lit("@example.org please")))
        .otherwise(concat(col("text"), lit(" call +41 44 123 45 67 ok")))
      Tables.documents(s, dir)
        .withColumn("case", m.cast("int"))
        .withColumn("synth", synth)
        .groupBy(col("case"))
        .agg(count(lit(1)).as("n"),
          sum(Scrub.urlCount(col("synth"))).cast("long").as("n_urls"),
          sum(Scrub.emailCount(col("synth"))).cast("long").as("n_emails"),
          sum(length(Scrub.scrub(col("synth")))).cast("long").as("scrubbed_len"))
        .orderBy(col("case"))
    }),

    // Extension: repeated-n-gram ratio (quality filter), per-doc sample
    "t6_repetition_ratio" -> ((s, dir) => {
      graft.operators.Scrub.repetitionRatio(
        Tables.documents(s, dir).where(pmod(col("doc_id"), lit(25)) === 0), k = 2)
        .orderBy(col("doc_id"))
    }),

    // Extension: document fingerprint via native PolyHash64 expression
    "t4_fingerprint_sample" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(pmod(col("doc_id"), lit(25)) === 0)
        .select(col("doc_id"), PolyHash64.polyHash64(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Extension: adjacent-token pair counts (the first step of BPE
    // vocabulary induction) — map-side pair explode, one shuffle
    "t8_bpe_pair_counts" -> ((s, dir) => {
      import graft.operators.TextAnalysis
      val t = TextAnalysis.toks(col("text"))
      Tables.documents(s, dir)
        .where(size(t) >= 2)
        .select(explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
    }),

    // Extension: unigram-LM document likelihood — each doc scored by the
    // mean corpus frequency of its tokens (rare-token docs score low:
    // the importance/quality-filter signal). Deliberately Σfreq/(n·total)
    // rather than mean log-prob: integer sums + one division give exact
    // cross-engine parity, where ln() would expose libm rounding drift.
    "t9_unigram_likelihood" -> ((s, dir) => {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.toks(col("text"))).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      val total = freq.agg(sum(col("f")).as("total"))
      toks.join(freq, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).as("fsum"), count(lit(1)).as("ntok"))
        .crossJoin(broadcast(total))
        .where(pmod(col("doc_id"), lit(25)) === 0)
        .select(col("doc_id"),
          (col("fsum").cast("double") / (col("ntok") * col("total"))).as("mean_tok_freq"))
        .orderBy(col("doc_id"))
    }),

    // Extension: TF-IDF relevance top-20 for a fixed query-term set —
    // fixed-point idf (integer arithmetic) for exact cross-engine scores
    "t10_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir),
        Seq("join", "window", "stream"), topN = 20)),

    // Extension: bigram-LM likelihood — per doc the mean fixed-point
    // conditional probability (c(ab)·10^6 div c(a)) over its adjacent
    // pairs; the KenLM-style fluency signal on top of t8's pair counts.
    // Denominator = full unigram count (the standard simplification);
    // integer score sums are order-independent, one final division.
    "t11_bigram_likelihood" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = TextAnalysis.toks(col("text"))
      val pairs = docs.where(size(t) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      val c2 = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
      val c1 = docs.select(explode(t).as("a"))
        .groupBy(col("a")).agg(count(lit(1)).as("c1"))
      pairs.join(c2, Seq("a", "b")).join(c1, Seq("a"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("(c2 * 1000000) div c1")).as("score_sum"),
          count(lit(1)).as("n_pairs"))
        .where(pmod(col("doc_id"), lit(25)) === 0)
        .select(col("doc_id"), col("score_sum"), col("n_pairs"),
          (col("score_sum").cast("double") / col("n_pairs")).as("mean_bigram"))
        .orderBy(col("doc_id"))
    }),

    // Extension: per-source corpus composition report — the mixing
    // dashboard a training-data pipeline reads before setting epoch
    // weights: doc/token volume, language purity, token share of the
    // whole corpus. Single map-side pass + tiny per-source aggregate;
    // the corpus total rides an empty-frame window (x10 pattern, no
    // second scan).
    "t12_source_composition" -> ((s, dir) => {
      val total = sum(col("tokens")).over(Window.partitionBy()).cast("double")
      Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          TF.tokenCount(col("text")).cast("long").as("tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("tokens"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        .withColumn("token_share", round(col("tokens") / total, 6))
        .orderBy(col("source"))
    }),

    // Capstone composition: the curation pipeline a training run feeds
    // from — Gopher quality gate → exact dedup (keep first) → per-doc
    // importance sample → per-language doc/token rollup. Each stage is
    // the library operator; the oracle is the identical chain in SQL.
    // Plan shape at scale: one scan, map-side filters on both ends,
    // and the ONLY data-sized shuffle is the dedup's md5 window.
    "c1_corpus_pipeline" -> ((s, dir) => {
      import graft.operators.{Dedup, Sampling}
      val docs = Tables.documents(s, dir)
        .withColumn("t", TextAnalysis.toks(col("text")))
        .withColumn("lines", split(col("text"), "\n"))
      val rules = TextAnalysis.gopherRules(col("text"), col("t"), col("lines"))
      val passed = docs
        .where(TextAnalysis.GopherRuleNames.map(rules).reduce(_ && _))
        .drop("t", "lines")
      val sampled = Sampling.importanceSample(Dedup.exactDedup(passed),
        weight = col("n_chars") / lit(2000.0),
        key = concat(col("doc_id").cast("string"), lit("/"), col("source")))
      sampled.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).cast("long").as("tokens"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("lang"))
    }),

    // Extension: Gopher-rule quality filter — per-rule failing counts +
    // survivors, one map-side pass over the corpus
    "t7_gopher_filter" -> ((s, dir) => {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(s, dir)
        .withColumn("t", TextAnalysis.toks(col("text")))
        .withColumn("lines", split(col("text"), "\n"))
      val rules = TextAnalysis.gopherRules(col("text"), col("t"), col("lines"))
      val pass = TextAnalysis.GopherRuleNames.map(rules).reduce(_ && _)
      val aggs = TextAnalysis.GopherRuleNames.map(r =>
        sum(when(!rules(r), 1).otherwise(0)).as(s"fail_$r")) :+
        sum(when(pass, 1).otherwise(0)).as("n_pass")
      docs.agg(count(lit(1)).as("n_docs"), aggs: _*)
    })
  )

  def oracles: Map[String, String] = Map(
    "x1_letter_extraction" ->
      s"""SELECT ${TF.extractLetterSql(synthAnswerSql)} AS letter, COUNT(*) AS n
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "x2_score_extraction" ->
      s"""SELECT ${TF.extractScoreSql(
            "(text || ' [[' || CAST(doc_id % 15 AS VARCHAR) || '.5]]')")} AS score,
         |       COUNT(*) AS n
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "x4_strip_thinking" ->
      s"""SELECT lang,
         |  CAST(SUM(length(${TF.stripThinkingSql(
              "(CASE WHEN doc_id % 2 = 0 THEN '<think>' || text || '</think>  kept tail' ELSE text END)")})) AS BIGINT) AS total_len,
         |  COUNT(*) AS n
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "a17_word_histogram" ->
      s"""SELECT CASE WHEN wc < 50 THEN '0-49' WHEN wc < 100 THEN '50-99'
         |  WHEN wc < 200 THEN '100-199' WHEN wc < 400 THEN '200-399'
         |  WHEN wc < 600 THEN '400-599' ELSE '600+' END AS bin, COUNT(*) AS n
         |FROM (SELECT ${TF.wordCountSql("text")} AS wc FROM documents) t
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f4_search_documents" ->
      """SELECT source, COUNT(*) AS n FROM documents
        |WHERE contains(lower(text), 'join the')
        |GROUP BY source ORDER BY source""".stripMargin,

    "t1_langid_confusion" ->
      s"""SELECT lang, ${TextAnalysis.langIdSql("text")} AS predicted, COUNT(*) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t15_line_langid" -> TextAnalysis.langSegmentSummarySql(
      """(CASE CAST(doc_id % 3 AS INT)
        | WHEN 0 THEN text || chr(10) || 'der und die das ist nicht mit zu den ein'
        |               || chr(10) || 'le la les et est pas pour que une dans'
        | WHEN 1 THEN text || chr(10) || chr(10)
        |               || 'el los las es no por para una como pero'
        | ELSE text END)""".stripMargin.replace("\n", " ")),

    "t2_quality_sample" ->
      s"""SELECT doc_id, ${TextAnalysis.qualitySql("text")} AS quality
         |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin,

    "t3_token_count_by_lang" ->
      s"""SELECT lang,
         |  CAST(SUM(${TF.tokenCountSql("text")}) AS BIGINT) AS total_tokens,
         |  CAST(SUM(${TF.wordCountSql("text")}) AS BIGINT) AS total_words
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "t4_fingerprint_sample" ->
      s"""SELECT doc_id, ${PolyHash64.sql("text")} AS fp
         |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin,

    "t13_frequent_terms" ->
      graft.operators.Frequent.frequentTermsSql(num = 1, denom = 150),

    "t14_repetition_signals" -> {
      val rep12 = "array_to_string(string_split(text, ' ')[1:12], ' ')"
      val src = "(SELECT doc_id, CASE WHEN doc_id % 50 = 0 " +
        s"THEN text || ' ' || $rep12 || ' ' || $rep12 ELSE text END AS text " +
        "FROM documents WHERE doc_id % 25 = 0) src"
      TextAnalysis.repetitionSignalsSql(from = src)
    },

    "t5_pii_scrub" -> {
      import graft.operators.Scrub
      val synthSql =
        """(CASE CAST(doc_id % 3 AS INT)
          | WHEN 0 THEN text || ' visit https://ex' || CAST(doc_id % 7 AS VARCHAR) || '.com now'
          | WHEN 1 THEN text || ' mail bob' || CAST(doc_id % 5 AS VARCHAR) || '@example.org please'
          | ELSE text || ' call +41 44 123 45 67 ok' END)""".stripMargin.replace("\n", " ")
      s"""SELECT CAST(doc_id % 3 AS INT) AS "case", COUNT(*) AS n,
         |  CAST(SUM(${Scrub.urlCountSql(synthSql)}) AS BIGINT) AS n_urls,
         |  CAST(SUM(${Scrub.emailCountSql(synthSql)}) AS BIGINT) AS n_emails,
         |  CAST(SUM(length(${Scrub.scrubSql(synthSql)})) AS BIGINT) AS scrubbed_len
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "t6_repetition_ratio" ->
      (graft.operators.Scrub.repetitionRatioSql(2, "WHERE doc_id % 25 = 0") +
        " ORDER BY doc_id"),

    "t8_bpe_pair_counts" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${TF.wsTokensSql("lower(text)")} AS t FROM documents),
         |p AS (
         |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
         |  FROM toks),
         |pairs AS (
         |  SELECT a.tok || ' ' || b.tok AS pair
         |  FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1)
         |SELECT pair, COUNT(*) AS n FROM pairs
         |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "t9_unigram_likelihood" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${TF.wsTokensSql("lower(text)")}) AS tok
         |  FROM documents),
         |freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS total FROM freq)
         |SELECT doc_id,
         |       CAST(SUM(f) AS DOUBLE) / (COUNT(*) * total) AS mean_tok_freq
         |FROM toks JOIN freq USING (tok), tot
         |WHERE doc_id % 25 = 0
         |GROUP BY doc_id, total ORDER BY doc_id""".stripMargin,

    "t10_tfidf_topk" ->
      TextAnalysis.tfidfSql(Seq("join", "window", "stream"), topN = 20),

    "c1_corpus_pipeline" -> {
      val pass = TextAnalysis.GopherRuleNames
        .map(TextAnalysis.gopherRulesSql("text")).mkString("(", " AND ", ")")
      val keep = graft.operators.Sampling.importanceSampleSql(
        "n_chars / 2000.0", "(CAST(doc_id AS VARCHAR) || '/' || source)")
      s"""WITH passed AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  WHERE $pass),
         |deduped AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
         |                                 ORDER BY doc_id) AS rn
         |    FROM passed) WHERE rn = 1),
         |sampled AS (SELECT * FROM deduped WHERE $keep)
         |SELECT lang, COUNT(*) AS n_docs,
         |       CAST(SUM(${TF.tokenCountSql("text")}) AS BIGINT) AS tokens,
         |       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
         |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin
    },

    "t12_source_composition" ->
      s"""WITH t AS (
         |  SELECT source, lang,
         |         CAST(${TF.tokenCountSql("text")} AS BIGINT) AS tok
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(tok) AS BIGINT) AS tokens,
         |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |       round(SUM(tok) / (SELECT CAST(SUM(tok) AS DOUBLE) FROM t), 6)
         |         AS token_share
         |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "t11_bigram_likelihood" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${TF.wsTokensSql("lower(text)")} AS t FROM documents),
         |p AS (
         |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
         |  FROM toks),
         |pr AS (
         |  SELECT a.doc_id, a.tok AS a, b.tok AS b
         |  FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
         |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM pr GROUP BY a, b),
         |c1 AS (SELECT tok AS a, COUNT(*) AS c1 FROM p GROUP BY tok)
         |SELECT doc_id,
         |       CAST(SUM((c2 * 1000000) // c1) AS BIGINT) AS score_sum,
         |       COUNT(*) AS n_pairs,
         |       CAST(SUM((c2 * 1000000) // c1) AS DOUBLE) / COUNT(*) AS mean_bigram
         |FROM pr JOIN c2 USING (a, b) JOIN c1 USING (a)
         |WHERE doc_id % 25 = 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t7_gopher_filter" -> {
      import graft.operators.TextAnalysis
      val rules = TextAnalysis.gopherRulesSql("text")
      val fails = TextAnalysis.GopherRuleNames.map(r =>
        s"CAST(SUM(CASE WHEN NOT ${rules(r)} THEN 1 ELSE 0 END) AS BIGINT) AS fail_$r")
      val pass = TextAnalysis.GopherRuleNames.map(rules).mkString("(", " AND ", ")")
      s"""SELECT COUNT(*) AS n_docs,
         |  ${fails.mkString(",\n  ")},
         |  CAST(SUM(CASE WHEN $pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         |FROM documents""".stripMargin
    }
  )
}
