package graft.lexam.pipeline

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.lexam._

/** Parquet-backed store for the five LEXam tables (S6–S9, SURVEY §2.1).
  *
  * Mutations on immutable storage (SURVEY §7.4 item 7):
  *  - answers/judgments are append-only, partitioned by experiment
  *    (the 100 TB layout: partition pruning makes per-experiment reads
  *    and deletes touch only their own files);
  *  - deletes are rewrite-a-partition (or drop-a-partition when the
  *    predicate is the partition key) — reference cascade semantics
  *    (models.py:23,38,136; routers/experiments.py:130-137);
  *  - the tiny `experiments` dimension is read-modify-overwrite through
  *    the driver (S9 status transitions).
  */
class LexamStore(val spark: SparkSession, val baseDir: String) {
  import spark.implicits._

  /** In-process write lock: concurrent jobs (JobRunner) may mutate the
    * same tables — the experiments read-modify-overwrite and parquet
    * appends (shared _temporary staging dir) are not concurrency-safe
    * per table. Coarse lock; writes are small and infrequent next to
    * the LLM calls. */
  private val writeLock = new Object

  private def p(name: String): String = s"$baseDir/$name"
  private def exists(name: String): Boolean = Files.exists(Paths.get(p(name)))

  /** True iff the table dir holds at least one parquet file — a
    * partition drop can leave only _SUCCESS behind, which would break
    * schema inference on read. */
  private def hasData(name: String): Boolean = {
    val dir = Paths.get(p(name))
    if (!Files.exists(dir)) return false
    val stream = Files.walk(dir)
    try stream.anyMatch(f => f.toString.endsWith(".parquet"))
    finally stream.close()
  }

  // ------------------------------------------------------------- reads

  def questions: DataFrame = spark.read.parquet(p("questions"))
  def variants: DataFrame  = spark.read.parquet(p("variants"))

  def answers: DataFrame =
    if (hasData("answers")) spark.read.parquet(p("answers"))
    else spark.emptyDataset[ExperimentAnswer].toDF()

  def judgments: DataFrame =
    if (hasData("judgments")) spark.read.parquet(p("judgments"))
    else spark.emptyDataset[ExperimentJudgment].toDF()
      .withColumn("experiment_id", lit(-1L))

  /** Judgments still reachable through a surviving answer, with the
    * answer's experiment id as `eid`. The reference counts judgments
    * via the ExperimentAnswer join (routers/experiments.py:79-84,
    * 183-189; routers/judging.py:96-101), so judgments orphaned by a
    * bulk answer delete never surface anywhere — this is THE single
    * judgment read path; Api counts/breakdowns and Jobs' status
    * rollback both consume it, so the rule can't drift between them. */
  def liveJudgments(experimentId: Option[Long] = None): DataFrame = {
    val ans = experimentId
      .map(id => answers.where(col("experiment_id") === id))
      .getOrElse(answers)
    judgments.drop("experiment_id")
      .join(ans.select(col("id").as("answer_id"),
        col("experiment_id").cast("long").as("eid")), Seq("answer_id"))
  }

  def experiments: Seq[Experiment] =
    if (exists("experiments"))
      spark.read.parquet(p("experiments")).as[Experiment].collect().toSeq
    else Seq.empty

  def getExperiment(id: Long): Option[Experiment] = experiments.find(_.id == id)

  // ------------------------------------------------------------ writes

  def writeQuestions(qs: Seq[Question]): Unit =
    qs.toDS().write.mode(SaveMode.Overwrite).parquet(p("questions"))
  def writeVariants(vs: Seq[Variant]): Unit =
    vs.toDS().write.mode(SaveMode.Overwrite).parquet(p("variants"))

  /** Upsert one experiment row (S9). The dimension is tiny by contract,
    * so driver-side read-modify-overwrite is the idiomatic batch move. */
  def saveExperiment(exp: Experiment): Unit = writeLock.synchronized {
    val others = experiments.filterNot(_.id == exp.id)
    val all = (others :+ exp).sortBy(_.id)
    val tmp = p("experiments_tmp")
    all.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    swap(Paths.get(tmp), Paths.get(p("experiments")))
  }

  /** POST /api/experiments (routers/experiments.py:45-70): mint the next
    * autoincrement id, force status "created", stamp created_at. The
    * reference's DB-level constraints become requires: name non-empty
    * (nullable=False) and unique (models.py:45). Caller-supplied prompt
    * fields ride in on the Experiment defaults exactly like the
    * reference's "only set when provided" loop. */
  def createExperiment(exp: Experiment): Experiment = writeLock.synchronized {
    require(exp.name != null && exp.name.nonEmpty, "experiment name required")
    require(!experiments.exists(_.name == exp.name),
      s"experiment name '${exp.name}' already exists")
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val created = exp.copy(
      id = experiments.map(_.id).maxOption.getOrElse(0L) + 1,
      status = "created", created_at = Some(now), updated_at = Some(now))
    saveExperiment(created)
    created
  }

  /** PUT /api/experiments/{id} (routers/experiments.py:115-128): partial
    * merge — only provided fields overwrite; throws for a missing id
    * (the reference 404). Divergence, documented: the reference lets an
    * update race a live generation/judging worker (the worker holds a
    * stale row and the edit silently half-applies); here a busy
    * experiment rejects the update instead. */
  def updateExperiment(id: Long, patch: ExperimentPatch): Experiment =
    writeLock.synchronized {
      val exp = getExperiment(id)
        .getOrElse(throw new NoSuchElementException(s"experiment $id"))
      require(!StatusMachine.isBusy(exp.status),
        s"experiment busy: ${exp.status}")
      patch.name.filter(_ != exp.name).foreach(n =>
        require(!experiments.exists(_.name == n),
          s"experiment name '$n' already exists"))
      val merged = exp.copy(
        name = patch.name.getOrElse(exp.name),
        description = patch.description.orElse(exp.description),
        filter_config = patch.filter_config.getOrElse(exp.filter_config),
        open_question_prompt = patch.open_question_prompt.getOrElse(exp.open_question_prompt),
        mcq_prompt = patch.mcq_prompt.getOrElse(exp.mcq_prompt),
        judge_system_prompt = patch.judge_system_prompt.getOrElse(exp.judge_system_prompt),
        judge_prompt = patch.judge_prompt.getOrElse(exp.judge_prompt),
        model_name = patch.model_name.getOrElse(exp.model_name),
        temperature = patch.temperature.getOrElse(exp.temperature),
        max_tokens = patch.max_tokens.getOrElse(exp.max_tokens),
        judge_temperature = patch.judge_temperature.getOrElse(exp.judge_temperature),
        judge_max_tokens = patch.judge_max_tokens.getOrElse(exp.judge_max_tokens),
        n_answers = patch.n_answers.getOrElse(exp.n_answers),
        updated_at = Some(new java.sql.Timestamp(System.currentTimeMillis())))
      saveExperiment(merged)
      merged
    }

  def setStatus(id: Long, status: String): Unit =
    getExperiment(id).foreach { e =>
      StatusMachine.requireTransition(e.status, status)
      saveExperiment(e.copy(status = status))
    }

  /** Append a batch of answers under the experiment's partition (S7 —
    * batched, not the reference's per-row commits). */
  def appendAnswers(batch: DataFrame): Unit = writeLock.synchronized {
    batch.write.mode(SaveMode.Append)
      .partitionBy("experiment_id").parquet(p("answers"))
  }

  def appendJudgments(batch: DataFrame): Unit = writeLock.synchronized {
    batch.write.mode(SaveMode.Append)
      .partitionBy("experiment_id").parquet(p("judgments"))
  }

  /** Delete all answers of an experiment (S8): partition drop. */
  def deleteAnswers(experimentId: Long): Unit =
    dropPartition("answers", experimentId)

  /** Delete judgments of an experiment, optionally one judge only
    * (routers/judging.py:80-108): partition drop or partition rewrite. */
  def deleteJudgments(experimentId: Long, judgeModel: Option[String] = None): Unit =
    judgeModel match {
      case None => dropPartition("judgments", experimentId)
      case Some(m) =>
        // null-safe keep-predicate: judge_model is nullable in the
        // reference model (models.py:164) and its equality delete filter
        // keeps NULL-model rows — `=!=` would silently drop them
        rewritePartition("judgments", experimentId,
          _.where(!(col("judge_model") <=> m)))
    }

  /** Cascade delete (routers/experiments.py:130-137): judgments →
    * answers → experiment row. */
  def deleteExperiment(id: Long): Unit = writeLock.synchronized {
    deleteJudgments(id)
    deleteAnswers(id)
    val rest = experiments.filterNot(_.id == id)
    if (rest.nonEmpty || exists("experiments")) {
      val tmp = p("experiments_tmp")
      rest.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      swap(Paths.get(tmp), Paths.get(p("experiments")))
    }
  }

  /** Startup schema migration (main.py:14-30 `_migrate_experiments_table`):
    * add late columns with defaults to an EXISTING experiments table
    * that predates them. ALTER TABLE ADD COLUMN on immutable parquet =
    * read → withColumn(default) → rewrite-and-swap. Idempotent like the
    * reference: a no-op when the table is absent or already carries
    * every column. Returns the column names actually added. */
  def migrateExperimentsSchema(migrations: Seq[(String, org.apache.spark.sql.Column)]
                                 = LexamStore.ExperimentMigrations): Seq[String] =
    writeLock.synchronized {
      if (!exists("experiments")) Seq.empty
      else {
        val df = spark.read.parquet(p("experiments"))
        val missing = migrations.filterNot { case (n, _) => df.columns.contains(n) }
        if (missing.isEmpty) Seq.empty
        else {
          val migrated = missing.foldLeft(df) {
            case (d, (n, default)) => d.withColumn(n, default)
          }
          val tmp = p("experiments_tmp")
          migrated.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
          swap(Paths.get(tmp), Paths.get(p("experiments")))
          missing.map(_._1)
        }
      }
    }

  /** Compact one experiment's partition into `targetFiles` files —
    * streaming/incremental appends (S7) accumulate small files; compaction
    * is the standard maintenance pass that keeps scans fast. */
  def compactAnswers(experimentId: Long, targetFiles: Int = 1): Unit =
    writeLock.synchronized {
      rewritePartition("answers", experimentId, _.coalesce(targetFiles))
    }

  // ---------------------------------------------------------- plumbing

  private def dropPartition(table: String, experimentId: Long): Unit = {
    val dir = Paths.get(p(table), s"experiment_id=$experimentId")
    if (Files.exists(dir)) deleteRecursively(dir)
  }

  /** Rewrite one partition through a transform (delete-as-rewrite). */
  private def rewritePartition(table: String, experimentId: Long,
                               f: DataFrame => DataFrame): Unit = {
    val dir = Paths.get(p(table), s"experiment_id=$experimentId")
    if (!Files.exists(dir)) return
    val remaining = f(spark.read.parquet(dir.toString))
    val tmp = Paths.get(p(s"${table}_rewrite_tmp"))
    remaining.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swap(tmp, dir)
  }

  private def swap(tmp: Path, target: Path): Unit = {
    if (Files.exists(target)) deleteRecursively(target)
    Files.move(tmp, target)
  }

  private def deleteRecursively(path: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(path).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}

object LexamStore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit

  /** The reference's migration set (main.py:20-26), with its defaults. */
  val ExperimentMigrations: Seq[(String, Column)] = Seq(
    "judge_system_prompt" -> lit(null).cast("string"),
    "temperature"         -> lit(0.7),
    "max_tokens"          -> lit(2048),
    "judge_temperature"   -> lit(0.3),
    "judge_max_tokens"    -> lit(4096))
}

/** Experiment status state machine (P6; models.py:131 + transitions in
  * generation.py:82,127,135 / judging.py:57,105,112). */
object StatusMachine {
  val Transitions: Map[String, Set[String]] = Map(
    // created→judging is legal: the reference judge worker sets
    // status="judging" unconditionally (judging.py:57) and an experiment
    // with no answers judges zero items and finishes "completed".
    "created"    -> Set("generating", "judging", "error"),
    "generating" -> Set("generated", "error"),
    "generated"  -> Set("generating", "judging", "error"),
    "judging"    -> Set("completed", "error"),
    "completed"  -> Set("generating", "judging", "error"),
    "error"      -> Set("generating", "judging"))

  // reset-status (routers/experiments.py:140-162) writes via
  // saveExperiment directly — whitelisting its targets here would make
  // the guard vacuous for exactly the transitions the table forbids.
  def canTransition(from: String, to: String): Boolean =
    from == to || Transitions.get(from).exists(_.contains(to))

  def requireTransition(from: String, to: String): Unit =
    require(canTransition(from, to), s"illegal status transition $from -> $to")

  /** Concurrency guard (routers/generation.py:18-19, judging.py:23-24). */
  def isBusy(status: String): Boolean =
    status == "generating" || status == "judging"

  /** reset-status recomputation from data (routers/experiments.py:140-162). */
  def recompute(answerCount: Long, judgmentCount: Long): String =
    if (judgmentCount > 0) "completed"
    else if (answerCount > 0) "generated"
    else "created"
}
