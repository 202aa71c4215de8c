package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** CDC compaction semantics (latest-wins, delete/reinsert, ties) and
  * the DQ report's violation counting on hand fixtures.
  */
class CdcQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyChangelog: latest seq wins, trailing delete removes, reinsert after delete survives") {
    val log = Seq(
      // key 1: I then U → the update's payload
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),
      // key 2: I then D → gone
      (2L, 1L, "I", "x"), (2L, 5L, "D", "x"),
      // key 3: I, D, then re-I at a higher seq → the new row survives
      (3L, 1L, "I", "old"), (3L, 2L, "D", "old"), (3L, 9L, "I", "new"),
      // key 4: out-of-order arrival (U read before I) — seq decides
      (4L, 7L, "U", "late"), (4L, 3L, "I", "early"))
      .toDF("k", "seq", "op", "payload")
    val out = Cdc.applyChangelog(log, key = "k", seq = "seq").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "b", 3L -> "new", 4L -> "late"))
  }

  test("applyChangelog: guards — unknown/null op fails the job, input _rn column survives untouched") {
    val bad = Seq((1L, 1L, "X", "a")).toDF("k", "seq", "op", "payload")
    val e = intercept[Exception] {
      Cdc.applyChangelog(bad, key = "k", seq = "seq").collect()
    }
    assert(e.getMessage.contains("op must be one of I/U/D"), e.getMessage)
    val nul = Seq((1L, 1L, null: String, "a")).toDF("k", "seq", "op", "payload")
    intercept[Exception] {
      Cdc.applyChangelog(nul, key = "k", seq = "seq").collect()
    }
    // a payload column named _rn must not be clobbered by the helper
    val withRn = Seq((1L, 1L, "I", "keep-me"), (1L, 2L, "U", "latest"))
      .toDF("k", "seq", "op", "_rn")
    val out = Cdc.applyChangelog(withRn, key = "k", seq = "seq").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "latest")))
  }

  test("mergeAggStates: key-only inputs are rejected instead of crashing opaquely") {
    val a = Seq((1L, "x")).toDF("k1", "k2")
    val e = intercept[IllegalArgumentException] {
      Cdc.mergeAggStates(a, a, keys = Seq("k1", "k2"))
    }
    assert(e.getMessage.contains("no partial columns"), e.getMessage)
  }

  test("DQ report: empty check list and unresolvable parent table are rejected with clear errors") {
    val t = Seq((1L, "a")).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Quality.report(t, Seq.empty)
    }
    assert(e1.getMessage.contains("at least one check"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Quality.report(t, Seq(Quality.OrphanCheck("fk", "id", "missing_tbl", "id")))
    }
    assert(e2.getMessage.contains("missing_tbl"), e2.getMessage)
  }

  test("applyChangelog: seq collision resolved by the explicit tiebreak column") {
    val log = Seq(
      (1L, 1L, "I", 10L, "first"), (1L, 1L, "U", 20L, "second"))
      .toDF("k", "seq", "op", "pos", "payload")
    val out = Cdc.applyChangelog(log, "k", "seq", col("pos")).collect()
    assert(out.map(_.getString(2)).toList === List("second"))
  }

  test("property: applyChangelog matches a naive per-key replay on random logs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genLog: Gen[List[(Long, Long, String, String)]] = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 8L)
        op <- Gen.oneOf("I", "U", "D")
        p <- Gen.alphaLowerStr.map(_.take(4))
      } yield (k, op, p))
    } yield rows.zipWithIndex.map { case ((k, op, p), i) => (k, i.toLong, op, p) }
    (0 until 10).foreach { i =>
      val Some(rows) = genLog.apply(Gen.Parameters.default, Seed(47L + i))
      val got =
        if (rows.isEmpty) Map.empty[Long, String]
        else Cdc.applyChangelog(rows.toDF("k", "seq", "op", "payload"), "k", "seq")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // naive: per key, the row with max seq wins; D means absent
      val want = rows.groupBy(_._1).flatMap { case (k, mine) =>
        val last = mine.maxBy(_._2)
        if (last._3 == "D") None else Some(k -> last._4)
      }
      assert(got === want, s"seed ${47 + i}")
    }
  }

  test("mergeAggStates: merged partial states equal the full-data aggregate") {
    val rows = (1 to 200).map(i => (s"g${i % 7}", i.toLong))
    val df = rows.toDF("g", "v")
    def state(d: org.apache.spark.sql.DataFrame) =
      d.groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("total"))
    val (a, b) = (df.where($"v" <= 120), df.where($"v" > 120))
    val merged = Cdc.mergeAggStates(state(a), state(b), Seq("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toList
    val full = state(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toList
    assert(merged === full)
  }

  test("DQ report: each check counts its own violation class exactly") {
    import Quality._
    val child = Seq(
      (1L, "F", 10.0, Some(100L)),  // clean
      (1L, "F", 20.0, Some(100L)),  // dup pk (both rows of key 1 count)
      (2L, "Z", 30.0, Some(100L)),  // bad domain
      (3L, "O", -5.0, Some(999L)),  // negative price AND orphan fk
      (4L, "P", 40.0, None))        // null fk → orphan (null never matches)
      .toDF("id", "status", "price", "fk")
    val parent = Seq(100L).toDF("pid")
    val got = report(child, Seq(
        UniqueCheck("pk_unique", "id"),
        PredCheck("status_domain", $"status".isin("F", "O", "P"),
          "status IN ('F','O','P')"),
        PredCheck("price_positive", $"price" > 0, "price > 0"),
        OrphanCheck("fk_resolves", "fk", "parent", "pid")),
      parents = Map("parent" -> parent))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "pk_unique" -> 2L, "status_domain" -> 1L,
      "price_positive" -> 1L, "fk_resolves" -> 2L))
  }

  test("splitLeakage: counts cross-split duplicate pairs per combination, multiplicities included") {
    // digest d1: 2 train + 1 val + 1 test → 2 train-val, 2 train-test,
    // 1 val-test; digest d2: both in train → clean; d3: unique → clean
    val rows = Seq(
      ("d1", "train"), ("d1", "train"), ("d1", "val"), ("d1", "test"),
      ("d2", "train"), ("d2", "train"),
      ("d3", "val"))
      .toDF("h", "s")
    val got = Quality.splitLeakage(rows, $"s", $"h").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(got === List(
      ("test", "train", 2L), ("test", "val", 1L), ("train", "val", 2L)))
  }

  test("DQ report: a clean table reports zero violations on every check, not null/missing rows") {
    import Quality._
    val clean = Seq((1L, "F"), (2L, "O")).toDF("id", "status")
    val got = report(clean, Seq(
        UniqueCheck("pk_unique", "id"),
        PredCheck("status_domain", $"status".isin("F", "O"), "status IN ('F','O')")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("pk_unique" -> 0L, "status_domain" -> 0L))
  }

  test("robustOutliers: histogram median/MAD equal percentile-exact median/MAD on random groups") {
    val rnd = new scala.util.Random(42)
    // odd and even group sizes, duplicates, negative values
    val rows = (0 until 500).map { i =>
      val g = s"g${i % 7}"
      (i.toLong, g, (rnd.nextInt(200) - 50).toLong)
    }
    val df = rows.toDF("id", "g", "v")
    val got = Quality.robustOutliers(df, "v", Seq("g"), zThreshold = 1.5)
      .select($"id", $"med", $"mad", $"z").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // reference: Spark's exact percentile aggregate (fine at test scale)
    val med = df.groupBy($"g").agg(percentile($"v", lit(0.5)).as("med"))
    val mad = df.join(med, "g").groupBy($"g")
      .agg(percentile(abs($"v" - $"med"), lit(0.5)).as("mad"))
    val want = df.join(med, "g").join(mad, "g")
      .withColumn("z", lit(0.6745) * ($"v" - $"med") / $"mad")
      .where($"mad" > 0 && abs($"z") > 1.5)
      .select($"id", $"med", $"mad", $"z").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === want)
    assert(got.nonEmpty, "fixture should flag at least one outlier")
  }

  test("quantileProfile: matches a sorted in-memory reference on random groups, all edge fractions") {
    val rnd = new scala.util.Random(7)
    // duplicates, negatives, singleton group, two-element group
    val rows = (0 until 400).map { i =>
      (s"g${i % 5}", (rnd.nextInt(60) - 20).toDouble)
    } ++ Seq(("solo", 42.0), ("pair", 1.0), ("pair", 9.0))
    val df = rows.toDF("g", "v")
    val qs = Seq("q0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
      "p95" -> 0.95, "q1" -> 1.0)
    val got = Quality.quantileProfile(df, "v", Seq("g"), qs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), qs.indices.map(i => r.getDouble(2 + i))))).toMap
    // reference: the pinned quantile_cont rule on a driver-side sort
    def ref(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted; val n = s.length
      val p = q * (n - 1); val lo = math.floor(p).toInt; val frac = p - lo
      if (frac == 0.0) s(lo) else s(lo) * (1 - frac) + s(lo + 1) * frac
    }
    val byG = rows.groupBy(_._1)
    for ((g, (n, gotQs)) <- got) {
      val vs = byG(g).map(_._2)
      assert(n === vs.length.toLong, s"group $g")
      for (((_, q), i) <- qs.zipWithIndex)
        assert(gotQs(i) === ref(vs, q), s"group $g q=$q")
    }
    assert(got.keySet === byG.keySet)
  }

  test("quantileProfile and robustOutliers ignore NULL values (DuckDB median/quantile semantics)") {
    val withNulls = Seq[(String, java.lang.Double)](
      ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", null), ("g", null)
    ).toDF("g", "v")
    val prof = Quality.quantileProfile(withNulls, "v", Seq("g"),
      Seq("p50" -> 0.5)).collect()
    assert(prof.length === 1)
    // n counts non-null values; the median is of {1,2,3}, not
    // null-shifted (a null-first ranking would have returned 1.5)
    assert(prof.head.getLong(1) === 3L && prof.head.getDouble(2) === 2.0)
    val ro = Quality.robustOutliers(
      (Seq[(Long, String, java.lang.Double)]((1L, "g", null)) ++
        (2L to 21L).map(i => (i, "g", java.lang.Double.valueOf((i % 5).toDouble))) :+
        ((99L, "g", java.lang.Double.valueOf(1000.0)))).toDF("id", "g", "v"),
      "v", Seq("g"), zThreshold = 3.5).collect()
    // the planted outlier is flagged against the null-free median/MAD;
    // the null-value row itself is never flagged
    assert(ro.map(_.getAs[Long]("id")).toSet === Set(99L))
  }

  test("robustOutliers: zero-MAD group is excluded; planted extreme value is flagged") {
    val df = (
      (1L to 20L).map(i => (i, "const", 100L)) ++          // all identical → MAD 0
      (21L to 40L).map(i => (i, "spread", (i % 5) + 10L)) :+ // tight cluster...
      (99L, "spread", 10000L)                               // ...one wild row
    ).toDF("id", "g", "v")
    val got = Quality.robustOutliers(df, "v", Seq("g"), zThreshold = 3.5).collect()
    assert(got.forall(_.getAs[String]("g") == "spread"))
    assert(got.exists(_.getAs[Long]("id") == 99L))
  }

  test("driftReport: zero and all-null old means cannot hide a real shift") {
    // four columns stress the degenerate promotion-gate cases:
    //  z  — old mean exactly 0, new mean nonzero  → drifted (was null pre-fix)
    //  zz — old AND new mean 0                    → no drift
    //  an — old all-null, new populated           → drifted
    //  bn — all-null on both sides                → no drift
    val oldDf = Seq[(java.lang.Double, java.lang.Double, java.lang.Double, java.lang.Double)](
      (-1.0, 0.0, null, null), (1.0, 0.0, null, null))
      .toDF("z", "zz", "an", "bn")
    val newDf = Seq[(java.lang.Double, java.lang.Double, java.lang.Double, java.lang.Double)](
      (5.0, 0.0, 7.0, null), (5.0, 0.0, 7.0, null))
      .toDF("z", "zz", "an", "bn")
    val rep = Quality.driftReport(oldDf, newDf, Seq("z", "zz", "an", "bn"))
      .collect()
      .map(r => r.getAs[String]("column") ->
        ((r.getAs[java.lang.Double]("mean_shift"),
          r.getAs[Boolean]("drifted")))).toMap
    assert(rep("z") === ((null, true)), s"$rep")   // relative shift undefined, drift real
    assert(rep("zz") === ((null, false)))
    assert(rep("an") === ((null, true)))
    assert(rep("bn") === ((null, false)))
    // never NaN/Infinity out of the zero division
    assert(!rep.values.exists(v => v._1 != null &&
      (v._1.isNaN || v._1.isInfinite)))
  }
}
