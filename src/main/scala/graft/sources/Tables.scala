package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet star schema
  * (TESTDATA.md). Mirrors the reference's "session per request" table
  * access (`backend/app/database.py:5-22`) as plain parquet scans —
  * Spark's vectorized reader + min/max pruning replace Postgres B-trees
  * (SURVEY §4).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loaders keep that swap local to this one file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.Registry.registerAll(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as two physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 only reads as
    * raw int64 nanos under the legacy conf) and plain TIMESTAMP(MICROS)
    * (read natively as TIMESTAMP_NTZ). Normalize both to a microsecond
    * TimestampType column — integer `div` for the nanos leg (a double
    * division would lose precision on int64 nanos), and an NTZ cast for
    * the native leg (sessions run with spark.sql.session.timeZone=UTC,
    * so the cast re-labels the same micros the file stores). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views for spark.sql use — through the
    * per-table accessors, so `events` gets its nanos→timestamp fix. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val accessors: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events,
      "documents" -> documents, "embeddings" -> embeddings)
    all.foreach(n => accessors(n)(spark, sfDir).createOrReplaceTempView(n))
  }
}
