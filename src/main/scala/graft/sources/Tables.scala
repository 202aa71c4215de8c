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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read it as raw nanos (legacy conf) and convert
    * to a microsecond TimestampType column (integer `div` — a double
    * division would lose precision on int64 nanos). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
