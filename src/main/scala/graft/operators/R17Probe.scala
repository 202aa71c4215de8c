package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization probes — dev-only A/B harness (not part of
  * the library surface, not benched, no oracle), same discipline as
  * [[R16Probe]]: candidate shapes timed back-to-back on one session,
  * noop-sink consumption, scrub between legs.
  * Usage: runMain graft.operators.R17Probe <experiment> [sfDir]
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val exp = args.headOption.getOrElse("png")
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("a9_pricing_summary")(spark, dir).count()
    graft.SparkEntry.queries("t3_token_count_by_lang")(spark, dir).count()
    graft.Isolation.scrub(spark)

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      graft.Isolation.scrub(spark)
      println(f"r17probe $label%-28s $sec%.3fs")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    exp match {
      case "png" =>
        // c18-scale image stage: where does the wall go — PNG encode
        // (synthPngVariantMedia) or decode+hash (pngDHash)?
        val media = graft.sources.Tables.documents(spark, dir)
          .select(expr("doc_id div 3").as("media_id"))
        (1 to 3).foreach { i =>
          time(s"ids-only-$i") { noop(media) }
          time(s"encode-only-$i") { noop(Multimodal.synthPngVariantMedia(media)) }
          time(s"encode+dhash-$i") {
            noop(Multimodal.pngDHash(Multimodal.synthPngVariantMedia(media)))
          }
        }

      case "probejobs" =>
        // per-job wall inside ONE c6-style probe action: are the 26
        // jobs scheduling- or compute-bound? (verdict item 3 gate)
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
        val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int)]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.put(j.jobId, (System.nanoTime(),
                j.stageInfos.map(_.numTasks).sum))
            override def onJobEnd(
                j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val s = jobs.get(j.jobId)
              if (s != null)
                done.add((j.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
            }
          })
        val docs = graft.sources.Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"))
        val idx = java.nio.file.Files.createTempDirectory("r17probe").toString
        Dedup.saveLshIndex(docs.where(pmod(col("doc_id"), lit(12)) === 0),
          k = 3, bands = 8, rowsPerBand = 4, idx, nBucketParts = 16)
        val batch = docs.where(pmod(col("doc_id"), lit(12)) === 1).cache()
        batch.count()
        // warm probe once, then measure the second (JIT/codegen warm)
        Dedup.dedupAgainstLshIndex(batch, idx, threshold = 0.05,
          maxBucket = Some(3)).write.mode("overwrite").parquet(s"$idx/p0")
        (1 to 3).foreach { i =>
          done.clear()
          val t0 = System.nanoTime()
          val df = Dedup.dedupAgainstLshIndex(batch, idx, threshold = 0.05,
            maxBucket = Some(3))
          val t1 = System.nanoTime()
          df.write.mode("overwrite").parquet(s"$idx/p$i")
          val t2 = System.nanoTime()
          var sumJobs = 0.0
          done.forEach { case (id, sec, ntasks) =>
            sumJobs += sec
            if (i == 1) println(f"r17probe job=$id%-4d $sec%.3fs tasks=$ntasks")
          }
          println(f"r17probe construct ${(t1 - t0) / 1e9}%.3fs action " +
            f"${(t2 - t1) / 1e9}%.3fs sum-of-jobs $sumJobs%.3fs n-jobs ${done.size}")
        }

      case "dppcheck" =>
        // which batch-side shapes keep DPP on the band scan?
        val docs = graft.sources.Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"))
        val idx = java.nio.file.Files.createTempDirectory("dppchk").toString
        Dedup.saveLshIndex(docs.where(pmod(col("doc_id"), lit(12)) === 0),
          k = 3, bands = 8, rowsPerBand = 4, idx, nBucketParts = 16)
        val batch = docs.where(pmod(col("doc_id"), lit(12)) === 1)
        val keys = Seq("part", "band", "bucket")
        def check(label: String, sig: DataFrame): Unit = {
          val bb = Dedup.bandedFrame(sig, 8, 4)
            .withColumn("part", pmod(col("bucket"), lit(16)))
          val hit = spark.read.parquet(s"$idx/bands")
            .join(bb.select(keys.map(col): _*).distinct(), keys)
          hit.write.format("noop").mode("overwrite").save()
          val plan = hit.queryExecution.executedPlan.toString
          println(s"r17probe dpp $label -> ${plan.toLowerCase.contains("dynamicpruning")}")
        }
        val raw = Dedup.minhashSignatures(batch, 3, 32)
        check("raw", raw)
        check("ckpt-lazy", raw.localCheckpoint(false))
        check("ckpt-lazy+filter", raw.localCheckpoint(false).where(size(col("sh")) > 0))
        check("ckpt-eager+filter", raw.localCheckpoint(true).where(size(col("sh")) > 0))
        check("cache", raw.cache().where(size(col("sh")) > 0))

      case other =>
        sys.error(s"unknown experiment: $other")
    }
    spark.stop()
  }
}
