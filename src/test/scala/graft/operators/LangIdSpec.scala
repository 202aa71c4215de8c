package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Trained language-ID (q8/q9): correctness on clear-cut fixtures,
  * agreement with the t1 stopword heuristic where stopwords exist,
  * the disagreement case the trained form exists for (no stopwords —
  * char n-grams still carry the signal), determinism, and the scale
  * contract: scoring is map-side after ONE broadcast of the model
  * table (the only corpus-keyed shuffle is the final per-doc argmax
  * aggregation).
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val enTrain = Seq(
    "the quick brown fox jumps over the lazy dog and runs to the hills",
    "it is a truth universally acknowledged that a single man wants a wife",
    "this is the story of a house that stood in the middle of the town")
  private val deTrain = Seq(
    "der schnelle braune fuchs springt und das ist nicht ein problem",
    "die kinder spielen mit dem ball und der hund ist zu den bergen",
    "das wetter ist nicht gut und die strassen sind mit schnee bedeckt")
  private val frTrain = Seq(
    "le renard brun saute et la maison est dans les collines pour que",
    "les enfants jouent dans la rue et le chien est pas une menace",
    "la vie est belle pour une personne que les autres aiment dans paris")

  private def labeled = (
    enTrain.map(("en", _)) ++ deTrain.map(("de", _)) ++ frTrain.map(("fr", _)))
    .zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
    .toDF("doc_id", "lang", "text")

  test("clear-cut held-out docs classify correctly; stopword heuristic agrees") {
    val held = Seq(
      (100L, "en", "the dog runs over the hills and it is a good day for that"),
      (101L, "de", "der hund ist nicht zu den kindern und das ist ein spiel"),
      (102L, "fr", "le chien est dans la rue et les enfants jouent pour que"))
      .toDF("doc_id", "lang", "text")
    val pred = LangId.trainPredict(labeled,
        held.select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(pred === Map(100L -> "en", 101L -> "de", 102L -> "fr"))
    // the t1 stopword heuristic reads the same verdicts on these
    val stop = held.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(stop === Map(100L -> "en", 101L -> "de", 102L -> "fr"))
  }

  test("disagreement case: zero stopwords — char n-grams still identify the language") {
    // German content words only: no stopword list hits anything, so
    // the t1 heuristic returns its undetermined tag; the trained
    // model recognizes the character shapes (sch/ch/en/ei...) from
    // the German training rows
    val held = Seq((200L, "schnelle fuchs springt schnee bergen kindern"))
      .toDF("doc_id", "text")
    val stop = held.select(TextAnalysis.langId(col("text"))).head.getString(0)
    assert(stop === "und", "fixture must be stopword-free")
    val pred = LangId.trainPredict(labeled, held).head.getString(1)
    assert(pred === "de")
  }

  test("training is deterministic: identical model tables across runs") {
    def modelRows = {
      val (m, lc) = LangId.train(labeled)
      (m.orderBy("lang", "f").collect().map(_.toSeq).toSeq,
        lc.orderBy("lang").collect().map(_.toSeq).toSeq)
    }
    assert(modelRows === modelRows)
  }

  test("ties break to the lexicographically smallest lang") {
    // two identically-distributed training langs -> identical scores
    // for any doc; the argmax must pick the smaller lang name
    val twin = Seq((1L, "aa", "x y z w v u"), (2L, "bb", "x y z w v u"))
      .toDF("doc_id", "lang", "text")
    val p = LangId.trainPredict(twin,
      Seq((9L, "x y z")).toDF("doc_id", "text")).head
    assert(p.getString(1) === "aa")
  }

  test("docs shorter than one trigram emit no prediction row") {
    val p = LangId.trainPredict(labeled,
      Seq((1L, "ab"), (2L, "abc")).toDF("doc_id", "text"))
    assert(p.select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("scale plan: model join broadcasts; no sort-merge join anywhere") {
    val held = (0L to 50L).map(i => (i, s"the dog number $i runs over the hills"))
      .toDF("doc_id", "text")
    val pred = LangId.trainPredict(labeled, held)
    pred.count() // settle AQE
    val plan = pred.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side shuffle join allowed:\n$plan")
  }

  test("scale plan: scoring reads the scored relation ONCE — per-doc totals are a map-side formula, not a second feature pass") {
    // tf = greatest(len-2, 0) comes straight off the docs scan; only
    // the feature stream (one scan) feeds the model join. A second
    // LocalTableScan/parquet read of the scored docs would double the
    // corpus cost at 100 TB.
    val held = (0L to 50L).map(i => (i, s"the dog number $i runs over the hills"))
      .toDF("doc_id", "text").localCheckpoint()
    val pred = LangId.trainPredict(labeled, held)
    pred.count() // settle AQE
    val plan = pred.queryExecution.executedPlan.toString
    // the totals arm is a map-side projection of the text length —
    // visible in the plan as length(lower(text)) - 2 — NOT a second
    // explode+hash+aggregate pass over the feature stream
    assert("length\\(lower\\(".r.findAllIn(plan).nonEmpty,
      s"per-doc totals must be the map-side length formula:\n$plan")
    // exactly ONE feature explode in the final plan — the scoring
    // pass (training explodes sit behind train()'s checkpointed count
    // table). The old shape re-derived the scored feature stream for
    // the totals: a second Generate over the corpus.
    val gens = "\\bGenerate\\b".r.findAllIn(plan).size
    assert(gens <= 1,
      s"expected no extra explode for per-doc totals, found $gens:\n$plan")
  }

  test("saveLangId → predictAgainstLangId equals trainPredict row for row; nightly detects the langid root") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    val train = docs.where(col("doc_id") % 3 === 1)
      .select(col("lang"), col("text"))
    val score = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("lid_save").toString
    LangId.saveLangId(train, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val persisted = rows(LangId.predictAgainstLangId(score, spark, dir))
    assert(persisted === rows(LangId.trainPredict(train, score)))
    assert(persisted.nonEmpty)
    // the artifact routes to the retrained-families arm of the nightly
    // (never the index detection, which would throw on the missing
    // meta/ table)
    val report = Maintenance.nightly(spark, dir)
    assert(report.family === "langid")
  }

  test("char_trigram_buckets ≡ the per-position substring+poly_hash64 chain (r16 feats rewrite)") {
    // fixtures cover ASCII, multi-byte (umlauts, CJK), a supplementary
    // codepoint (outside the BMP — charCount 2), exact-boundary lengths
    // (len 3), and sub-trigram strings (len < 3 → empty, dropped)
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "straße über den bergen"),
      (3L, "日本語のテキストです"),
      (4L, "a😀b😁c"), // emoji = 1 codepoint each
      (5L, "abc"),
      (6L, "ab"),
      (7L, "")).toDF("doc_id", "text")
    val t = lower(col("text"))
    val oldChain = docs.select(col("doc_id"), t.as("t"))
      .where(length(col("t")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")) - 2)).as("i"), col("t"))
      .select(col("doc_id"),
        pmod(graft.functions.PolyHash64
            .polyHash64(expr("substring(t, i, 3)")),
          lit(4096L)).as("f"))
    val newChain = docs.select(col("doc_id"), t.as("t"))
      .where(length(col("t")) >= 3)
      .select(col("doc_id"),
        explode(graft.functions.Registry.charTrigramBuckets(col("t"), 4096))
          .as("f"))
    // positional equality (order within a doc matters: the stream IS
    // the per-position tf multiset)
    val a = oldChain.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = newChain.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // len-3 doc emits exactly one feature; len<3 docs emit none
    assert(a.count(_._1 == 5L) === 1)
    assert(!a.exists(p => p._1 == 6L || p._1 == 7L))
  }

  test("predict verifies the bucket count against the one the model was trained under") {
    val (m, lc) = LangId.train(labeled, buckets = 2048)
    val held = Seq((1L, "the dog runs")).toDF("doc_id", "text")
    // matching count: fine
    assert(LangId.predict(m, lc, held, buckets = 2048).count() === 1L)
    // mismatched count: loud failure, not silent garbage scores
    val ex = intercept[Exception](
      LangId.predict(m, lc, held, buckets = 4096).collect())
    assert(ex.getMessage != null)
  }
}
