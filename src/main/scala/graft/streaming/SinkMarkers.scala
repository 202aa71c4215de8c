package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Commit-marker bookkeeping shared by the foreachBatch curation sinks
  * ([[DocStreams.indexedDedupSink]] and its vector twin): each
  * micro-batch seals per-phase markers under the sink's output dir —
  * `_committed/batch_<id>` (fully committed, replay is a no-op) plus a
  * phase-1 seal (`_verdicts/…` / `_enriched/…`). One small file per
  * trigger per dir is real metadata pressure on object stores over a
  * long-running stream (months of 1-minute triggers ≈ 10⁵ files), so
  * retention GC prunes markers for batch ids at or below a FLOOR and
  * records the floor itself as a single empty file whose NAME carries
  * the value (`_committed/_floor_<id>` — created atomically, read
  * without opening; a crashed GC leaves at most an extra floor file,
  * and the max always wins).
  *
  * The exactly-once contract survives GC: a replayed batch id is
  * treated as committed when its marker exists OR the id is at or
  * below the floor. GC only ever raises the floor to an id whose
  * commit marker is PRESENT (ids above the highest committed marker
  * are never covered, even if the caller passes a larger `upTo`), so
  * a floor can never mark genuinely unprocessed work as done. Pass an
  * `upTo` at or below the stream checkpoint's committed offset — ids
  * the engine can still legitimately replay after a checkpoint
  * rollback should keep their markers.
  *
  * Cost model per trigger: a committed replay is one `exists` call;
  * a new batch additionally lists `_committed/` once to read the
  * floor — O(markers since the last GC), which the GC itself keeps
  * small. The data partitions (`batch_id=<id>`) are never touched. */
private[graft] object SinkMarkers {

  private def committedDir(outPath: String) = new HPath(s"$outPath/_committed")

  /** The retention floor: every batch id <= this is committed. */
  def floor(fs: FileSystem, outPath: String): Long = {
    val dir = committedDir(outPath)
    if (!fs.exists(dir)) Long.MinValue
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(_.startsWith("_floor_"))
      .flatMap(_.stripPrefix("_floor_").toLongOption)
      .maxOption.getOrElse(Long.MinValue)
  }

  /** Replay test: marker present, or id under the GC floor. */
  def isCommitted(fs: FileSystem, outPath: String, id: Long): Boolean =
    fs.exists(new HPath(committedDir(outPath), s"batch_$id")) ||
      id <= floor(fs, outPath)

  /** Create an empty marker file (parents included). */
  def seal(fs: FileSystem, p: HPath): Unit = {
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Parse the batch id out of a `batch_<id>` or `batch_<id>_<suffix>`
    * marker name — the suffixed form carries a value in the name (the
    * same trick as `_floor_<id>`), e.g. the curation sink's per-batch
    * decon-index fingerprint. */
  private[streaming] def parseBatchId(name: String): Option[Long] = {
    if (!name.startsWith("batch_")) return None
    val rest = name.stripPrefix("batch_")
    val digits = rest.takeWhile(_.isDigit)
    if (digits.isEmpty) None
    else if (digits.length == rest.length || rest.charAt(digits.length) == '_')
      digits.toLongOption
    else None
  }

  /** The suffix of a `batch_<id>_<suffix>` marker under `dir`, if one
    * exists for this id. Exactly one may exist: the suffix carries a
    * RECORD (e.g. the curation sink's decon fingerprint), and two
    * coexisting records for one batch make every downstream decision
    * nondeterministic (whichever listStatus returns first) — fail
    * loudly instead, naming both, so the operator removes the stale
    * one rather than a tripwire silently comparing against it. */
  def suffixOf(fs: FileSystem, dir: HPath, id: Long): Option[String] = {
    val prefix = s"batch_${id}_"
    if (!fs.exists(dir)) return None
    val found = fs.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix)).toSeq
    if (found.sizeIs > 1)
      throw new IllegalStateException(
        s"batch $id has ${found.size} suffixed markers under $dir " +
          s"(${found.sorted.mkString(", ")}): the record is ambiguous — " +
          "delete the stale marker(s) before restarting the stream")
    found.headOption
  }

  /** Prune markers for batch ids `<= upTo` from `_committed` and each
    * of `phaseDirs`, after raising the floor. The floor only rises to
    * the highest PRESENT commit marker at or below `upTo` (never past
    * committed work), and the floor file is written BEFORE any marker
    * is deleted — a crash mid-GC leaves the contract intact and the
    * next GC resumes the deletes. Returns the floor now in effect. */
  def gc(spark: SparkSession, outPath: String, upTo: Long,
         phaseDirs: Seq[String]): Long = {
    val fs = graft.sources.Hdfs.forPath(spark, outPath)
    val dir = committedDir(outPath)
    val prev = floor(fs, outPath)
    if (!fs.exists(dir)) return prev
    def batchIds(d: HPath): Seq[(Long, HPath)] =
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.map(_.getPath)
        .flatMap(p => parseBatchId(p.getName).map(_ -> p))
    val committed = batchIds(dir)
    val newFloor = (committed.map(_._1).filter(_ <= upTo) :+ prev).max
    if (newFloor > prev)
      seal(fs, new HPath(dir, s"_floor_$newFloor"))
    (dir +: phaseDirs.map(d => new HPath(s"$outPath/$d"))).foreach { d =>
      batchIds(d).filter(_._1 <= newFloor).foreach(p => fs.delete(p._2, false))
    }
    // collapse superseded floor files (max always wins, so this is
    // hygiene, not correctness)
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("_floor_"))
      .filter(_.getName.stripPrefix("_floor_").toLongOption.exists(_ < newFloor))
      .foreach(fs.delete(_, false))
    newFloor
  }
}
