package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Sketch aggregates vs their exact answers: the correctness check for
  * approximate operators is the error CONTRACT, not a value match.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val li = graft.sources.Tables.lineitem(spark, sf)

  test("HLL distinct count lands within 3·rsd of exact, grouped and global") {
    val exact = li.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val approx = Sketches.approxDistinct(li, Nil, "l_orderkey", rsd = 0.05)
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 3 * 0.05,
      s"approx=$approx exact=$exact")

    val exactByFlag = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Sketches.approxDistinct(li, Seq("l_returnflag"), "l_orderkey", rsd = 0.05)
      .collect().foreach { r =>
        val e = exactByFlag(r.getString(0))
        assert(math.abs(r.getLong(1) - e).toDouble / e <= 3 * 0.05)
      }
  }

  test("approx quantiles respect the rank-error bound") {
    val n = li.count()
    val accuracy = 10000
    val sorted = li.select(col("l_quantity")).orderBy(col("l_quantity"))
      .as[Double].collect()
    val probs = Seq(0.1, 0.5, 0.9)
    val got = Sketches.approxQuantiles(li, "l_quantity", probs, accuracy)
      .first().getSeq[Double](0)
    probs.zip(got).foreach { case (p, v) =>
      // value must sit within ±n/accuracy ranks of the true quantile
      val rankLo = math.max(0, (p * n - n / accuracy - 1).toInt)
      val rankHi = math.min(n - 1, (p * n + n / accuracy).toInt).toInt
      assert(v >= sorted(rankLo) && v <= sorted(rankHi),
        s"p=$p v=$v allowed [${sorted(rankLo)}, ${sorted(rankHi)}]")
    }
  }

  test("stratified sampling: deterministic across partitionings, rate near target") {
    val docs = graft.sources.Tables.documents(spark, sf)
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "lang",
        concat(col("doc_id").cast("string"), lit("/"), col("lang")),
        Map("en" -> 0.5), defaultFraction = 0.1)
    val ids = sample(docs).select("doc_id").as[Long].collect().toSet
    // repartitioning must not change a single decision (content hash,
    // not partition-seeded RNG)
    val ids2 = sample(docs.repartition(7)).select("doc_id").as[Long].collect().toSet
    assert(ids === ids2)
    val enTotal = docs.where(col("lang") === "en").count().toDouble
    val enKept = sample(docs).where(col("lang") === "en").count().toDouble
    assert(math.abs(enKept / enTotal - 0.5) < 0.15,
      s"en rate ${enKept / enTotal}")
  }

  test("importance sampling: per-row keep rate tracks the weight, clamps, deterministic") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val key = concat(col("doc_id").cast("string"), lit("/"), col("source"))
    // weight ≥ 1 keeps everything; weight ≤ 0 keeps nothing
    assert(Sampling.importanceSample(docs, lit(1.5), key).count() === docs.count())
    assert(Sampling.importanceSample(docs, lit(-0.3), key).count() === 0L)
    // a 0.3 constant weight lands near a 30% rate and repartitioning
    // does not change a single decision
    val kept = Sampling.importanceSample(docs, lit(0.3), key)
      .select("doc_id").as[Long].collect().toSet
    val kept2 = Sampling.importanceSample(docs.repartition(5), lit(0.3), key)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === kept2)
    val rate = kept.size.toDouble / docs.count()
    assert(math.abs(rate - 0.3) < 0.1, s"rate $rate")
  }

  test("temperature mixing: sqrt rebalance downsamples the dominant source hardest, integer cutoffs, deterministic") {
    // 1600 docs src_big vs 100 src_small: under sqrt-temperature the
    // big source's keep RATE must fall well below the small one's
    val rows = (0 until 1600).map(i => (i.toLong, "src_big")) ++
      (10000 until 10100).map(i => (i.toLong, "src_small"))
    val df = rows.toDF("doc_id", "source").repartition(6)
    val key = concat(col("doc_id").cast("string"), lit("/"), col("source"))
    val cut = Sampling.sqrtTemperatureCutoffs(df, "source", targetDenom = 4L)
    // exact integer expectations: N=1700, T=425, S=floor(sqrt(1600))+
    // floor(sqrt(100))=50; big: 425*40*10000/(50*1600)=2125;
    // small: 425*10*10000/(50*100)=8500 — 4x the rate for 1/16 the size
    assert(cut === Map("src_big" -> 2125L, "src_small" -> 8500L))
    val kept = Sampling.temperatureMix(df, "source", key, 4L)
    val bigRate = kept.where(col("source") === "src_big").count() / 1600.0
    val smallRate = kept.where(col("source") === "src_small").count() / 100.0
    assert(math.abs(bigRate - 0.2125) < 0.05, s"big rate $bigRate")
    assert(math.abs(smallRate - 0.85) < 0.12, s"small rate $smallRate")
    // content-hash decisions: partitioning must not change the sample
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.temperatureMix(df.repartition(3), "source", key, 4L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === ids2)
  }

  test("temperature mixing at 1000 strata: broadcast-join lookup, no codegen fallback, identical rows/schema to the chain path") {
    // a 1000-source stratum column — the regime where the inlined
    // when/otherwise chain would blow expression-tree depth and
    // codegen's 64KB method limit; above maxExprCutoffs the lookup
    // must be a broadcast hash join instead
    val rows = (0 until 8000).map(i => (i.toLong, s"src_${i % 1000}"))
    val df = rows.toDF("doc_id", "source").repartition(6)
    val key = concat(col("doc_id").cast("string"), lit("/"), col("source"))
    val joined = Sampling.temperatureMix(df, "source", key, 4L) // 1000 > default 64
    // execute THIS dataframe's own queryExecution (count() would spawn
    // a separate one) so AQE finalizes the inspected physical plan
    joined.collect()
    // plan shape: the lookup is a broadcast hash join (df itself never
    // shuffles on the stratum key — the only exchanges are the
    // fixture's own round-robin repartition and the broadcast), and
    // the filter stage stays inside WholeStageCodegen (no interpreted
    // fallback — that is the point of leaving the chain form)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "lookup must not shuffle-join")
    assert(!plan.contains("HashPartitioning"), "df must not shuffle on the key")
    // "*(n)" is the whole-stage-codegen marker in AQE's final-plan
    // rendering: the join+filter stage must carry it (no interpreted
    // fallback from a blown method limit — the chain path's failure)
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("*(")), plan.take(800))
    assert(!plan.toLowerCase.contains("codegenfallback"))
    // row+schema equivalence against a driver-side replay of the
    // decision rule (hash(key) % Buckets < cutoff[source]) — NOT the
    // chain path, whose 1000-deep CaseWhen is exactly the plan this
    // path exists to avoid building
    assert(joined.columns.toSeq === df.columns.toSeq,
      "join path must preserve the caller's column order")
    val cutoffs = Sampling.sqrtTemperatureCutoffs(df, "source", 4L)
    val hashed = df
      .withColumn("_h", graft.functions.PolyHash64.polyHash64(key) % Sampling.Buckets)
      .select("doc_id", "source", "_h").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = hashed.collect {
      case (id, s, h) if h < cutoffs(s) => id }.toSet
    val a = joined.select("doc_id").as[Long].collect().toSet
    assert(a === expected,
      s"paths diverge: ${(a -- expected).take(5)} / ${(expected -- a).take(5)}")
    assert(a.nonEmpty)
  }

  test("epoch mixing: floor+fractional copies, zero-weight drop, deterministic") {
    val docs = graft.sources.Tables.documents(spark, sf)
    def mix(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochMix(df, "lang",
        concat(col("doc_id").cast("string"), lit("/"), col("lang")),
        Map("en" -> 2.5, "de" -> 0.0), defaultWeight = 1.0)
    val out = mix(docs)
    // en rows appear 2 or 3 times, de rows vanish, others exactly once
    val perDoc = out.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(perDoc.collect { case ("en", n) => n }.forall(n => n == 2 || n == 3))
    assert(!perDoc.exists(_._1 == "de"))
    assert(perDoc.collect { case (l, n) if l != "en" => n }.forall(_ == 1))
    // fractional epoch lands near 50% of en docs
    val en3 = perDoc.count(_ == ("en", 3L)).toDouble
    val enAll = perDoc.count(_._1 == "en").toDouble
    assert(math.abs(en3 / enAll - 0.5) < 0.2, s"frac-copy rate ${en3 / enAll}")
    // content-hash decisions: repartitioning changes nothing
    val a = out.groupBy(col("doc_id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = mix(docs.repartition(7)).groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("bottom-k aggregator: partition-independent, equals the sort-take oracle, buffers stay O(k)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val bk = udaf(new Sketches.BottomK(5))
    val rows = (1 to 500).map(i => (s"g${i % 3}", (i * 2654435761L >>> 7) % 1000, s"v$i"))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g").agg(bk($"h", $"v").as("sample"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val df = rows.toDF("g", "h", "v")
    val got = run(df)
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sorted.take(5).map(_._2).toList).toMap
    assert(got === want)
    // merge path: radically different partitioning, identical sketch
    assert(run(df.repartition(13)) === want)
  }

  test("KMV bottom-k-longs: distinct sorted k-min across partitionings; estimate tracks cardinality") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val k = 128
    val bk = udaf(new Sketches.BottomKLongs(k))
    // heavy duplication (each key ~4×) so the dedup path is exercised
    val keys = (1 to 8000).flatMap(i => Seq.fill(1 + i % 4)(i))
    val hash = (i: Int) => i * -7046029254386353131L + 99 // splitmix-ish, signed
    val rows = keys.map(i => ("g", hash(i)))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g").agg(bk($"h").as("hs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    val df = rows.toDF("g", "h")
    val want = keys.map(hash).distinct.sorted.take(k).toList
    assert(run(df)("g") === want)
    assert(run(df.repartition(17))("g") === want) // merge path, same sketch
    // estimator: (k−1)/u_(k) within 20% of 8000 true distinct at k=128
    val u = want.last.toDouble / 18446744073709551616.0 + 0.5
    val est = (k - 1).toDouble / u
    assert(math.abs(est - 8000) / 8000.0 < 0.20, s"estimate $est")
    // sub-k group: sketch is the whole distinct set
    val small = (1 to 40).flatMap(i => Seq(("s", hash(i)), ("s", hash(i))))
    assert(run(small.toDF("g", "h"))("s") ===
      (1 to 40).map(hash).distinct.sorted.toList)
  }

  test("frequent items never miss a true heavy hitter") {
    // l_returnflag has 3 values, each with support far above 0.2
    val items = Sketches.frequentItems(li, Seq("l_returnflag"), support = 0.2)
      .first().getSeq[String](0).toSet
    val truth = li.groupBy(col("l_returnflag")).count()
      .where(col("count") > lit(0.2) * li.count())
      .select("l_returnflag").as[String].collect().toSet
    assert(truth.subsetOf(items), s"missing ${truth.diff(items)}")
  }
}
