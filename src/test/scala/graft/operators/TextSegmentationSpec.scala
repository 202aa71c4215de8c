package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Fixture-level pins for the two web-curation stage-1 operators:
  * line-level language segmentation (t15) and URL-canonical exact
  * dedup (d18). The oracle queries exercise them over synthesized
  * corpus columns; these fixtures pin the rule-by-rule semantics on
  * hand-built rows where every branch is visible.
  */
class TextSegmentationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lineLang: per-line verdicts, 1-based line_no addressing, blanks verdict 'und'") {
    val docs = Seq(
      (1L, "the a of and to in is it that for\nder die das und ist nicht mit zu den ein"),
      (2L, "x\n\n  \nthe the the")).toDF("doc_id", "text")
    val got = TextAnalysis.lineLang(docs).orderBy("doc_id", "line_no")
      .select("doc_id", "line_no", "line_lang").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 1, "en"), (1L, 2, "de"),
      // blanks stay addressable (line_no counts them) with verdict und
      (2L, 1, "und"), (2L, 2, "und"), (2L, 3, "und"), (2L, 4, "en")))
  }

  test("langSegmentSummary: mixed doc dominance by char mass, blank lines excluded, deterministic tiebreak") {
    val docs = Seq(
      // en line 33 chars, de line 40 chars -> de dominates
      (1L, "the a of and to in is it that for\nder die das und ist nicht mit zu den ein"),
      // blank + whitespace-only lines must not count
      (2L, "x\n\n  \nthe the the"),
      // equal char mass (12 vs 12): larger lang code wins -> fr
      (3L, "le la les et\nder die denn")).toDF("doc_id", "text")
    val got = TextAnalysis.langSegmentSummary(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    assert(got(0) === ((1L, 2L, 2L, "de", 0.5479))) // 40/73
    // "x" = 1 char und, "the the the" = 11 chars en
    assert(got(1) === ((2L, 2L, 2L, "en", 0.9167))) // 11/12
    assert(got(2) === ((3L, 2L, 2L, "fr", 0.5)))
  }

  test("normalizeUrl: each rule and their interplay") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM/Path/" -> "example.com/path",
      "http://example.com/path#frag" -> "example.com/path",
      "https://example.com/p?utm_source=a&b=2&a=1" -> "example.com/p?a=1&b=2",
      "example.com/p?b=2&a=1" -> "example.com/p?a=1&b=2",
      "https://example.com/?gclid=x" -> "example.com",
      "https://example.com/p/3/?fbclid=zz" -> "example.com/p/3",
      "http://www.a.org" -> "a.org",
      // www only stripped as a LEADING label, not inside the host
      "http://sub.www.a.org/x" -> "sub.www.a.org/x")
    val got = cases.map(_._1).toDF("url")
      .select(Dedup.normalizeUrl(col("url"))).collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("urlDedup: first-seen (min id) wins per canonical URL; survivors carry full rows") {
    val docs = Seq(
      (10L, "https://www.shop.com/item?b=2&a=1", "first"),
      (11L, "HTTP://SHOP.COM/item/?a=1&utm_campaign=x&b=2", "dup-of-10"),
      (12L, "https://shop.com/other", "unique")).toDF("doc_id", "url", "text")
    val groups = Dedup.urlDedup(docs).orderBy("canon_url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(groups.toSeq === Seq(
      ("shop.com/item?a=1&b=2", 10L, 2L),
      ("shop.com/other", 12L, 1L)))
    val survivors = Dedup.urlDedupSurvivors(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(survivors.toSeq === Seq((10L, "first"), (12L, "unique")))
  }
}
