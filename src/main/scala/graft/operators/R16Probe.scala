package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization probes — dev-only A/B harness (not part of
  * the library surface, not benched, no oracle). Each experiment
  * times candidate operator shapes back-to-back on the same session
  * so a plan rewrite's effect is measured before it lands.
  * Usage: runMain graft.operators.R16Probe <experiment> [sfDir]
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val exp = args.headOption.getOrElse("langid")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.plans.GraftExtensions.install(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.registerAll(spark)
    graft.Isolation.begin(spark)
    // warm JVM/codegen the way Bench does
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("a9_pricing_summary")(spark, dir).count()
    graft.SparkEntry.queries("t3_token_count_by_lang")(spark, dir).count()
    graft.Isolation.scrub(spark)

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      graft.Isolation.scrub(spark)
      println(f"r16probe $label%-24s $sec%.3fs")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    exp match {
      case "langid" =>
        val docs = graft.sources.Tables.documents(spark, dir)
        val labeled = docs.where(pmod(col("doc_id"), lit(3)) =!= 2)
          .select(col("doc_id"), col("lang"), col("text"))
        val held = docs.where(pmod(col("doc_id"), lit(3)) === 2)
          .select(col("doc_id"), col("text"))
        def current(): DataFrame =
          LangId.trainPredict(labeled, held)
        // alternating 3x each
        (1 to 3).foreach { i =>
          time(s"predict-current-$i") { noop(current()) }
          time(s"predict-parts-$i") { noop(LangId.trainPredictParts(labeled, held)) }
        }
        // equality check: exact same rows both ways
        val a = current()
        val b = LangId.trainPredictParts(labeled, held)
        val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
        println(s"r16probe equality exceptAll: $d1 / $d2 (want 0 / 0)")

      case "feats" =>
        // old explode(sequence)+substring chain vs the in-row
        // CharTrigramBuckets expression now inside LangId.feats —
        // equality AND wall, on the q8 trainPredict surface
        val docs = graft.sources.Tables.documents(spark, dir)
        val labeled = docs.where(pmod(col("doc_id"), lit(3)) =!= 2)
          .select(col("doc_id"), col("lang"), col("text"))
        val held = docs.where(pmod(col("doc_id"), lit(3)) === 2)
          .select(col("doc_id"), col("text"))
        def oldFeats(d: DataFrame, keep: Seq[String]): DataFrame = {
          val cols = keep.map(col) :+ lower(col("text")).as("t")
          d.select(cols: _*)
            .where(length(col("t")) >= 3)
            .select((keep.map(col) :+
              explode(sequence(lit(1), length(col("t")) - 2)).as("i") :+
              col("t")): _*)
            .select((keep.map(col) :+
              pmod(graft.functions.PolyHash64
                  .polyHash64(expr("substring(t, i, 3)")),
                lit(4096L)).as("f")): _*)
        }
        def newFeats(d: DataFrame, keep: Seq[String]): DataFrame = {
          val cols = keep.map(col) :+ lower(col("text")).as("t")
          d.select(cols: _*)
            .where(length(col("t")) >= 3)
            .select((keep.map(col) :+
              explode(graft.functions.Registry
                .charTrigramBuckets(col("t"), 4096)).as("f")): _*)
        }
        (1 to 3).foreach { i =>
          time(s"feats-old-$i") {
            noop(oldFeats(held, Seq("doc_id"))
              .groupBy(col("doc_id"), col("f")).agg(count(lit(1)).as("c")))
          }
          time(s"feats-new-$i") {
            noop(newFeats(held, Seq("doc_id"))
              .groupBy(col("doc_id"), col("f")).agg(count(lit(1)).as("c")))
          }
          time(s"trainpredict-$i") { noop(LangId.trainPredict(labeled, held)) }
        }
        val fa = oldFeats(held, Seq("doc_id"))
        val fb = newFeats(held, Seq("doc_id"))
        println(s"r16probe feats equality: ${fa.exceptAll(fb).count()} / " +
          s"${fb.exceptAll(fa).count()} (want 0 / 0)")

      case "c6steps" =>
        // per-step wall + Spark-job count of the c6 lifecycle protocol
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
          })
        def step(label: String)(f: => Unit): Unit = {
          val j0 = jobs.get(); val t0 = System.nanoTime(); f
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"r16probe $label%-24s $sec%.3fs jobs=${jobs.get() - j0}")
        }
        val docs = graft.sources.Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"))
        val idx = java.nio.file.Files.createTempDirectory("c6probe").toString
        step("save-index") {
          Dedup.saveLshIndex(docs.where(pmod(col("doc_id"), lit(12)) === 0),
            k = 3, bands = 8, rowsPerBand = 4, idx, nBucketParts = 16)
        }
        (1 to 3).foreach { b =>
          val batch = docs.where(pmod(col("doc_id"), lit(12)) === b).cache()
          step(s"probe-$b") {
            Dedup.dedupAgainstLshIndex(batch, idx, threshold = 0.05,
                maxBucket = Some(3))
              .write.mode("overwrite").parquet(s"$idx/probe_$b")
          }
          val probed = spark.read.parquet(s"$idx/probe_$b")
          step(s"append-$b") {
            Dedup.appendToLshIndex(
              batch.join(probed.where(!col("is_dup")).select(col("doc_id")),
                "doc_id"), idx)
          }
          step(s"compact-$b") {
            Dedup.compactLshBands(spark, idx, maxFilesPerPart = 1)
          }
          batch.unpersist(blocking = false)
        }

      case "c13stages" =>
        import graft.queries.CurationStages._
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
          })
        val all = graft.sources.Tables.documents(spark, dir)
        def step(label: String)(f: => DataFrame): DataFrame = {
          val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
          println(f"r16probe $label%-24s ${(System.nanoTime()-t0)/1e9}%.3fs jobs=${jobs.get() - j0}")
          r
        }
        val docs = step("synthesized") { synthesized(all) }
        val labeled = all.where(pmod(col("doc_id"), lit(3)) === 1)
          .select(col("lang"), col("text"))
        val g = step("gated") { gated(docs) }
        val pred = step("langid-pin") {
          LangId.trainPredict(labeled,
            g.select(col("doc_id"), col("text"))).localCheckpoint()
        }
        val lmKept = step("lm-gate") {
          lmGated(g, pred.select(col("doc_id"), col("pred_lang").as("lang")))
        }
        val kept = step("decon") { decontaminated(lmKept, benchSlice(all)) }
        val pairs = step("lsh-pairs") { nearDupPairs(kept).localCheckpoint() }
        val comps = step("components") { components(pairs).localCheckpoint() }
        step("quota+agg") {
          val r = quotaRollup(curated(kept, comps)); noop(r); r
        }

      case "deconparts" =>
        // decon stage warm wall (inputs rebuilt per leg: the scrub
        // between legs evicts checkpointed frames)
        import graft.queries.CurationStages._
        val all = graft.sources.Tables.documents(spark, dir)
        (1 to 3).foreach { i =>
          time(s"decon-full-$i") {
            noop(Dedup.decontaminateFrames(gated(synthesized(all)),
              benchSlice(all), k = 8, maxContainment = 0.5))
          }
        }

      case "bigrams" =>
        val docs = graft.sources.Tables.documents(spark, dir)
        (1 to 3).foreach { i =>
          time(s"toks-only-$i") {
            noop(docs.select(col("doc_id"),
              TextAnalysis.toks(col("text")).as("t")))
          }
          time(s"bigrams-stream-$i") {
            noop(LmScore.bigrams(docs))
          }
          time(s"bigrams-agg-$i") {
            noop(LmScore.bigrams(docs)
              .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c")))
          }
          time(s"q7-full-$i") {
            noop(LmScore.surprisalPerLang(docs))
          }
        }

      case other =>
        println(s"unknown experiment: $other")
    }
    spark.stop()
  }
}
