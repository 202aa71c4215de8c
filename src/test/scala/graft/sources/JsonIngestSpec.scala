package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class JsonIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("serialize→parse is the identity, including JSON-hostile strings") {
    val fixture = docs(
      (1L, "plain words here", "en", "web", 16L),
      (2L, "quote \" backslash \\ slash / tab\tnewline\nend", "de", "books", 44L),
      (3L, "unicode é中😀 mixed", "fr", "web", 17L),
      (4L, "", "en", "empty", 0L))
    val back = JsonIngest.parseDocs(JsonIngest.toJsonLines(fixture))
    val got = back.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(got === fixture.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3), r.getLong(4))).toSet)
    // head_tokens really is the parsed array, not a recomputation
    val heads = back.select($"doc_id", $"head_tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(heads(1L) === List("plain", "words", "here"))
    assert(heads(4L) === List(""))
  }

  test("schema-directed parse: malformed and schema-drifted lines degrade to nulls, not exceptions") {
    val lines = Seq(
      """{"id": 7, "meta": {"lang": "en", "source": "web"}, "stats": {"chars": 3}, "head_tokens": ["a"], "text": "a b"}""",
      """{"id": "not-a-number", "meta": 5}""", // type drift
      """not json at all"""                     // malformed
    ).toDF("line")
    val parsed = JsonIngest.parseDocs(lines).collect()
    assert(parsed.length === 3)
    val ok = parsed.find(r => !r.isNullAt(0)).get
    assert(ok.getLong(0) === 7L && ok.getString(1) === "en")
    assert(parsed.count(r => r.isNullAt(0)) === 2)
  }
}
