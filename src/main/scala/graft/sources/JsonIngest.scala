package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingest — the wire format most raw LLM training corpora
  * arrive in. Same decode-seam stance as the multimodal family
  * (`Multimodal.synthPngMedia`/`synthWavBytes`): the "files" are
  * synthesized in-engine from the relational truth (`toJsonLines`),
  * parsed back through Spark's REAL JSON machinery (`from_json`,
  * Jackson under the hood, schema-directed so malformed rows surface as
  * nulls instead of exceptions), and every downstream value is read
  * from PARSED columns only — so the oracle, which computes the same
  * aggregate straight from the table, catches any parse defect.
  *
  * At 100 TB this is `spark.read.schema(s).json(path)`: the explicit
  * schema is what keeps ingest one pass (schema inference reads the
  * corpus twice) and keeps the scan columnar-prunable after the first
  * parse. The nested shape (meta/stats objects, a token array) mirrors
  * the typical corpus record, not a flat row.
  */
object JsonIngest {

  /** The corpus record schema — nested on purpose. */
  val docSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType),
      StructField("source", StringType)))),
    StructField("stats", StructType(Seq(
      StructField("chars", LongType)))),
    StructField("head_tokens", ArrayType(StringType)),
    StructField("text", StringType)))

  /** documents → one JSON line per doc (id, nested meta/stats, the
    * first 5 tokens as an array, full text). */
  def toJsonLines(docs: DataFrame): DataFrame =
    docs.select(to_json(struct(
      col("doc_id").as("id"),
      struct(col("lang"), col("source")).as("meta"),
      struct(col("n_chars").as("chars")).as("stats"),
      slice(split(col("text"), " "), 1, 5).as("head_tokens"),
      col("text"))).as("line"))

  /** JSON lines → typed columns, schema-directed. */
  def parseDocs(lines: DataFrame): DataFrame =
    lines.select(from_json(col("line"), docSchema).as("j"))
      .select(
        col("j.id").as("doc_id"),
        col("j.meta.lang").as("lang"),
        col("j.meta.source").as("source"),
        col("j.stats.chars").as("n_chars"),
        col("j.head_tokens").as("head_tokens"),
        col("j.text").as("text"))
}
