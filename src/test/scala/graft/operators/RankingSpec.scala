package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the distributed ranking contract: globalRank equals the rank a
  * single-partition window would assign (without ever building one),
  * and ntileExact reproduces SQL NTILE's group-size rule exactly —
  * including the uneven-remainder and n < k edges the w5 oracle's data
  * happens not to exercise. */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalRank assigns exact 1-based ranks under a total order") {
    // values deliberately unsorted and spread over many input partitions
    val rows = (1 to 97).map(i => (i.toLong, (i * 37 % 97).toLong))
    val df = spark.createDataset(rows).repartition(7).toDF("id", "v")
    val ranked = Ranking.globalRank(df, Seq(desc("v"), col("id")), "rnk",
      numPartitions = 5)
    // v = i*37 mod 97 is a permutation of 0..96, so rank by v desc is
    // 97 - v; ids never tie-break here but are part of the total order
    val got = ranked.select(col("v"), col("rnk")).as[(Long, Long)]
      .collect().toMap
    (0L to 96L).foreach { v => assert(got(v) === 97 - v, s"v=$v") }
    // helper column must not leak
    assert(!ranked.columns.contains("_rk_pid"))
  }

  test("ntileExact matches SQL NTILE group sizes when n % k != 0") {
    // n=10, k=4 -> NTILE sizes 3,3,2,2 (first n%k tiles get the extra)
    val df = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val tiles = Ranking.ntileExact(df, 4, Seq(desc("v"), col("id")), "t")
      .groupBy("t").count().as[(Int, Long)].collect().toMap
    assert(tiles === Map(1 -> 3L, 2 -> 3L, 3 -> 2L, 4 -> 2L))
    // and membership follows the order: the top-3 v values are tile 1
    val t1 = Ranking.ntileExact(df, 4, Seq(desc("v"), col("id")), "t")
      .where(col("t") === 1).select("v").as[Long].collect().toSet
    assert(t1 === Set(10L, 9L, 8L))
  }

  test("cumsumExact equals the single-partition running sum, distributed") {
    // values unsorted, spread over many input partitions, with a null
    // (counts as 0) — compare against the one-task window ground truth
    val rows = (1 to 200).map(i => (i.toLong, (i * 61 % 211).toLong,
      if (i % 17 == 0) null else java.lang.Long.valueOf(i % 7 + 1)))
    val df = spark.createDataset(rows).repartition(9).toDF("id", "v", "tok")
    val got = Ranking.cumsumExact(df, Seq(desc("v"), col("id")), col("tok"),
        "cum", numPartitions = 5)
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("v"), col("id"))
      .rowsBetween(Long.MinValue, 0)
    val want = df.withColumn("cum",
        sum(coalesce(col("tok"), lit(0L))).over(w))
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got === want)
    // degenerate partition counts: one range (the single-task shape)
    // and more ranges than rows (empty partitions must contribute
    // zero offsets, not missing map keys)
    for (np <- Seq(1, 64)) {
      val g = Ranking.cumsumExact(df, Seq(desc("v"), col("id")), col("tok"),
          "cum", numPartitions = np)
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
      assert(g === want, s"numPartitions=$np")
    }
    assert(!Ranking.cumsumExact(df, Seq(col("id")), col("tok"), "c")
      .columns.exists(c => c.startsWith("_cs_")))
  }

  test("ntileExact and cumsumExact leave a caller's cache entry for the input intact") {
    val df = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("id", "v").cache()
    try {
      df.count()
      def callerEntryLives = spark.sharedState.cacheManager
        .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isDefined
      // the transient internal persist/unpersist must not evict the
      // caller's entry (cacheManager matches by plan, not by reference);
      // cumsumExact must also LOOK UP on the caller's plan — deriving
      // its value column before the lookup would make the guard miss
      Ranking.ntileExact(df, 4, Seq(desc("v"), col("id")), "t").count()
      assert(callerEntryLives, "caller's cache entry was evicted by ntileExact")
      Ranking.cumsumExact(df, Seq(desc("v"), col("id")), col("v"), "c").count()
      assert(callerEntryLives, "caller's cache entry was evicted by cumsumExact")
    } finally df.unpersist()
  }

  test("ntileExact with n < k: one row per tile, low tiles filled first") {
    val df = Seq((1L, 5L), (2L, 3L)).toDF("id", "v")
    val tiles = Ranking.ntileExact(df, 4, Seq(desc("v"), col("id")), "t")
      .select("v", "t").as[(Long, Int)].collect().toMap
    assert(tiles === Map(5L -> 1, 3L -> 2)) // tiles 3,4 stay empty
  }

  test("rangeSnapshot non-classic fallback: degrades to transient persist, stays correct, never throws") {
    // Every local Dataset IS classic, so the connect-mode branch
    // (lookupCallerCached = false without a cache lookup) is forced via
    // the spec-only override; the contract under test is the scaladoc's:
    // the degraded path is correct, at worst it evicts a caller's
    // recomputable cache entry — it must never CCE or lose rows.
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v").repartition(5)
    def snapIds(cachedOverride: Option[Boolean]) =
      Ranking.rangeSnapshot(df, Seq(col("v"), col("id")), 4, "_pid",
          cachedOverride)
        .select("id").as[Long].collect().sorted.toSeq
    val viaLookup = snapIds(None)
    val viaFallback = snapIds(Some(false))
    assert(viaLookup === (1L to 100L))
    assert(viaFallback === viaLookup, "fallback path must be row-identical")
    // caller-cached input + fallback: the documented worst case — the
    // caller's entry may be evicted, but the frame stays consumable
    df.persist()
    try {
      df.count()
      assert(Ranking.lookupCallerCached(df), "classic lookup sees the cache")
      assert(snapIds(Some(false)) === viaLookup)
      assert(df.count() === 100L, "caller frame must survive (recomputable)")
    } finally df.unpersist()
  }

  test("TopKLongPairs equals the window row_number formulation across random layouts, ties, duplicates") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    // keys drawn from a SMALL range so cross-group ties and exact
    // duplicate (key,id) rows both occur; several partitions so merge()
    // runs between genuinely different buffers
    val rows = (1 to 4000).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(40).toLong, rnd.nextInt(50).toLong)
    }
    for (k <- Seq(1, 3, 8)) {
      val df = rows.toDF("g", "v", "id").repartition(13)
      val topk = udaf(new Ranking.TopKLongPairs(k))
      val got = df.groupBy(col("g")).agg(topk(col("v"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rnk"),
          col("col._1").as("v"), col("col._2").as("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val w = Window.partitionBy(col("g")).orderBy(desc("v"), col("id"))
      val want = df.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= k)
        .select(col("g"), col("rnk"), col("v"), col("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got === want, s"k=$k")
    }
  }

  test("TopKLongPairs: groups smaller than k return all members, still ranked") {
    val df = Seq((1L, 10L, 1L), (1L, 10L, 2L), (2L, 5L, 9L))
      .toDF("g", "v", "id")
    val topk = udaf(new Ranking.TopKLongPairs(5))
    val got = df.groupBy(col("g")).agg(topk(col("v"), col("id")).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getLong(1))))
      .toMap
    assert(got === Map(1L -> Seq((10L, 1L), (10L, 2L)), 2L -> Seq((5L, 9L))))
  }

}
