package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.LmScore

/** The persisted-LM serving path: batch scoring against a saved model
  * must equal the in-memory train+score pipeline, and the streaming
  * enrich must equal the batch scorer row for row on the same arrivals
  * with zero streaming state (the per-doc fold is a stateless shell).
  */
case class DocRow(doc_id: Long, text: String)

class LmStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(
    spark, "/root/testdata/sf0.001").select(col("doc_id"), col("text"))

  test("surprisalAgainstLm(savedLm) equals surprisal(train, docs) row for row") {
    val path = java.nio.file.Files.createTempDirectory("lm_art").toString
    LmScore.saveLm(docs, path)
    val direct = LmScore.surprisal(docs, docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val served = LmScore.surprisalAgainstLm(docs, spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("streaming lmScoreEnrich equals batch surprisalAgainstLm; shells keep zero state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("lm_art2").toString
    // train on the even docs, score the odd ones — OOV paths included
    LmScore.saveLm(docs.where(col("doc_id") % 2 === 0), path)
    val arriving = docs.where(col("doc_id") % 2 === 1)
      .as[DocRow].collect().toSeq
    assert(arriving.nonEmpty)
    val input = MemoryStream[DocRow]
    val name = s"lmstream_${System.nanoTime()}"
    val q = DocStreams.lmScoreEnrich(input.toDF(), path)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (streamed, stateRows) =
      try {
        // two triggers: scoring is per-document, the split cannot matter
        input.addData(arriving.take(arriving.size / 2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(arriving.size / 2): _*)
        q.processAllAvailable()
        (spark.table(name).orderBy("doc_id").collect().map(_.toSeq).toSeq,
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L))
      } finally q.stop()
    val batch = LmScore.surprisalAgainstLm(arriving.toDF(), spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }

  test("streaming lmScoreEnrichPerLang equals batch surprisalAgainstLmPerLang incl. the no-model lang; zero state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("pllm_stream").toString
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    // per-language targets trained on the even docs; the odd docs
    // arrive on the stream, one of them under a language NO model was
    // trained for (the lp-0 no-opinion arm)
    LmScore.saveLmPerLang(all.where(col("doc_id") % 2 === 0), path)
    val arriving = all.where(col("doc_id") % 2 === 1)
      .as[(Long, String, String)].collect().toSeq :+
      ((900001L, "xx", "some words never modelled"))
    val input = MemoryStream[(Long, String, String)]
    val name = s"pllmstream_${System.nanoTime()}"
    val q = DocStreams.lmScoreEnrichPerLang(
        input.toDF().toDF("doc_id", "lang", "text"), path)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (streamed, stateRows) =
      try {
        input.addData(arriving.take(arriving.size / 2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(arriving.size / 2): _*)
        q.processAllAvailable()
        (spark.table(name).orderBy("doc_id").collect().map(_.toSeq).toSeq,
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L))
      } finally q.stop()
    val batch = LmScore.surprisalAgainstLmPerLang(
        arriving.toDF("doc_id", "lang", "text"), spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the no-model lang took the 0L arm on BOTH engines
    assert(streamed.exists(r => r.head == 900001L && r(3) == 0L))
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }

  test("streaming lmScoreEnrichKnPerLang equals batch surprisalKnAgainstLmPerLang incl. the no-model lang; zero state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("knlm_stream").toString
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    // per-language KN targets trained on the even docs; odd docs arrive
    // on the stream — seen-bigram, continuation-backoff, and unseen-w1
    // tiers all exercised — plus one doc under a never-modelled lang
    // (the lp-0 no-opinion arm)
    LmScore.saveKnLmPerLang(all.where(col("doc_id") % 2 === 0), path)
    val arriving = all.where(col("doc_id") % 2 === 1)
      .as[(Long, String, String)].collect().toSeq :+
      ((900002L, "xx", "some words never modelled"))
    val input = MemoryStream[(Long, String, String)]
    val name = s"knlmstream_${System.nanoTime()}"
    val q = DocStreams.lmScoreEnrichKnPerLang(
        input.toDF().toDF("doc_id", "lang", "text"), path)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (streamed, stateRows) =
      try {
        input.addData(arriving.take(arriving.size / 2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(arriving.size / 2): _*)
        q.processAllAvailable()
        (spark.table(name).orderBy("doc_id").collect().map(_.toSeq).toSeq,
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L))
      } finally q.stop()
    val batch = LmScore.surprisalKnAgainstLmPerLang(
        arriving.toDF("doc_id", "lang", "text"), spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(streamed.exists(r => r.head == 900002L && r(3) == 0L))
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }
  test("streaming lmScoreEnrichMknPerLang equals batch surprisalMknAgainstLmPerLang incl. the no-model lang; zero state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("mknlm_stream").toString
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    // per-language MODIFIED-KN targets trained on the even docs; odd docs arrive
    // on the stream — seen-bigram, continuation-backoff, and unseen-w1
    // tiers all exercised — plus one doc under a never-modelled lang
    // (the lp-0 no-opinion arm)
    LmScore.saveMknLmPerLang(all.where(col("doc_id") % 2 === 0), path)
    val arriving = all.where(col("doc_id") % 2 === 1)
      .as[(Long, String, String)].collect().toSeq :+
      ((900003L, "xx", "some words never modelled"))
    val input = MemoryStream[(Long, String, String)]
    val name = s"mknlmstream_${System.nanoTime()}"
    val q = DocStreams.lmScoreEnrichMknPerLang(
        input.toDF().toDF("doc_id", "lang", "text"), path)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (streamed, stateRows) =
      try {
        input.addData(arriving.take(arriving.size / 2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(arriving.size / 2): _*)
        q.processAllAvailable()
        (spark.table(name).orderBy("doc_id").collect().map(_.toSeq).toSeq,
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L))
      } finally q.stop()
    val batch = LmScore.surprisalMknAgainstLmPerLang(
        arriving.toDF("doc_id", "lang", "text"), spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(streamed.exists(r => r.head == 900003L && r(3) == 0L))
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }

  test("streaming langIdEnrich equals batch predictAgainstLangId row for row; zero state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("lid_stream").toString
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    // classifier trained on the even docs' labels; odd docs arrive
    // unlabeled on the stream — the c13 front half, continuous
    graft.operators.LangId.saveLangId(
      all.where(col("doc_id") % 2 === 0).select(col("lang"), col("text")),
      path)
    val arriving = all.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val name = s"lidstream_${System.nanoTime()}"
    val q = DocStreams.langIdEnrich(
        input.toDF().toDF("doc_id", "text"), path)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (streamed, stateRows) =
      try {
        input.addData(arriving.take(arriving.size / 2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(arriving.size / 2): _*)
        q.processAllAvailable()
        (spark.table(name).orderBy("doc_id").collect().map(_.toSeq).toSeq,
          Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L))
      } finally q.stop()
    val batch = graft.operators.LangId.predictAgainstLangId(
        arriving.toDF("doc_id", "text"), spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(stateRows === 0L, s"expected stateless shells, got $stateRows rows")
  }
}
