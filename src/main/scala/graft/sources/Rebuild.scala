package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The crash-safe-by-re-run rebuild protocol shared by every persisted
  * index (PQ-IVF cells, LSH bands): the index's current source rows are
  * snapshotted to `<index>/rebuild_src` FIRST, and that snapshot — not
  * the possibly half-rewritten live tables — is the rebuild source, so
  * a rebuild that died mid-overwrite is healed by calling it again.
  *
  * Freshness is decided by an explicit CONTENT TOKEN, not file mtimes:
  * a random token is written into the snapshot when it commits
  * (`rebuild_src/_token`, created only after the snapshot parquet and
  * params have landed) and echoed to `<index>/rebuild_done_token` only
  * after the rebuild has committed its meta. A leftover snapshot whose
  * token EQUALS the done token belongs to a COMPLETED rebuild whose
  * final cleanup crashed — rows may have been appended since, so
  * rebuilding from it would silently roll the index back; it is
  * discarded and the live tables re-snapshotted. Any other state
  * (token present, done token absent or different) is a crashed
  * IN-FLIGHT rebuild and the snapshot is resumed from. mtime ordering
  * was rejected here: on filesystems with coarse modification-time
  * granularity (1 s on some HDFS/object stores) or renames that do
  * not preserve times, a fresh crashed snapshot can compare "older"
  * than meta and be misclassified as stale — the exact silent
  * rollback the check exists to prevent.
  *
  * Two further guarantees close the mid-rebuild windows:
  *
  *  - The index is NOT serveable mid-rebuild (its tables are
  *    overwritten in place), and that contract is ENFORCED, not just
  *    documented: `<index>/rebuild_inflight` exists from just before
  *    the first overwrite until the rebuild completes, and every
  *    probe/append entry point calls [[assertNotInflight]] — a crash
  *    between the tables and the meta commit would otherwise leave an
  *    index whose meta disagrees with its partitioning (probes would
  *    silently join on the wrong keys and MISS duplicates).
  *  - The rebuild PARAMETERS ride the snapshot (`rebuild_src/_params`,
  *    written before the token), so a re-run can heal even when the
  *    crash tore the meta table itself — re-entry never needs to read
  *    the live index. A healed re-run therefore completes the ORIGINAL
  *    rebuild's parameters; to apply different ones, rebuild again
  *    after the heal.
  */
object Rebuild {

  /** Run `rebuild` against a committed snapshot of `snapshot`'s rows
    * and key-value params. `snapshot` is only evaluated (and
    * materialized) when no committed snapshot already exists — a
    * re-run after a crash resumes from the existing snapshot AND its
    * persisted params, touching nothing in the live index. `rebuild`
    * receives the snapshot read back from disk plus the params and
    * must commit the index so that a RE-RUN from the same snapshot
    * converges (write meta last). */
  def withCommittedSnapshot(spark: SparkSession, indexRoot: String,
                            snapshot: => (DataFrame, Map[String, String]))(
                            rebuild: (DataFrame, Map[String, String]) => Unit): Unit = {
    val fs = Hdfs.forPath(spark, indexRoot)
    val src = new HPath(s"$indexRoot/rebuild_src")
    val tokenFile = new HPath(src, "_token")
    val paramsFile = new HPath(src, "_params")
    val doneFile = new HPath(s"$indexRoot/rebuild_done_token")
    val inflight = new HPath(s"$indexRoot/rebuild_inflight")
    val srcTok = readFile(fs, tokenFile)
    if (srcTok.isDefined && srcTok == readFile(fs, doneFile)) {
      // completed rebuild's leftover: stale, discard — and a FAILED
      // delete must abort, or the stale snapshot would be rebuilt from
      // after all (the silent-rollback this protocol exists to prevent)
      if (!fs.delete(src, true))
        throw new java.io.IOException(
          s"cannot discard stale rebuild snapshot $src — aborting rather " +
            "than rebuilding from it")
    }
    // the enforcement marker goes up BEFORE anything else — including
    // the snapshot itself. It must cover every window in which a
    // committed snapshot exists without its done token: if appends
    // could land in such a window (e.g. a crash right after the token
    // landed, before the first overwrite), the next rebuild's resume
    // from that snapshot would silently roll them back. With the
    // marker up first, probes and appends fail loudly from here until
    // the done token commits.
    writeFile(fs, inflight, "up")
    if (readFile(fs, tokenFile).isEmpty) {
      // no committed snapshot (never started, crashed mid-snapshot, or
      // the stale one was just discarded): drop any partial dir and
      // snapshot the CURRENT live rows + params; the token lands last,
      // so the snapshot is committed exactly when the token is readable.
      // A failure anywhere in here (bad caller params, an unreadable
      // meta, a transient IO error) leaves the live index UNTOUCHED
      // with nothing to resume — clear the marker we just raised, or a
      // validation typo would block every probe until someone pays for
      // a full rebuild just to remove a file
      try {
        if (fs.exists(src)) fs.delete(src, true)
        val (df, params) = snapshot
        df.write.mode("overwrite").parquet(src.toString)
        writeFile(fs, paramsFile, params.toSeq.sorted
          .map { case (k, v) => s"$k=$v" }.mkString("\n"))
        writeFile(fs, tokenFile, java.util.UUID.randomUUID().toString)
      } catch {
        case t: Throwable =>
          if (readFile(fs, tokenFile).isEmpty) fs.delete(inflight, false)
          throw t
      }
    }
    val tok = readFile(fs, tokenFile).getOrElse(throw new IllegalStateException(
      s"snapshot token vanished under $src"))
    val params = readFile(fs, paramsFile).map(parseParams)
      .getOrElse(throw new IllegalStateException(
      s"committed rebuild snapshot $src has no _params file (written by " +
        "an older layout?) — if the live index is consistent, delete " +
        s"$src and $inflight and re-run; otherwise write $paramsFile by " +
        "hand from the index's intended parameters before re-running"))
    rebuild(spark.read.parquet(src.toString), params)
    // commit order: done token FIRST, then the marker comes down, then
    // the snapshot goes. A crash after the done token with the marker
    // still up is loud (probes blocked) and heals as stale at the next
    // entry; deleting the marker before the done token would instead
    // leave an unguarded index with a resumable-looking snapshot —
    // appends landing there would be rolled back by the next rebuild.
    writeFile(fs, doneFile, tok)
    if (!fs.delete(inflight, false))
      throw new java.io.IOException(
        s"rebuild committed but could not clear $inflight — probes stay " +
          s"blocked; remove the marker (and $src) by hand or re-run")
    fs.delete(src, true)
  }

  /** True while a rebuild is (or crashed) mid-overwrite at
    * `indexRoot`. */
  def isInflight(spark: SparkSession, indexRoot: String): Boolean =
    Hdfs.forPath(spark, indexRoot)
      .exists(new HPath(s"$indexRoot/rebuild_inflight"))

  /** The persisted params of a committed-but-unfinished rebuild
    * snapshot, if one exists — lets a healer identify the index
    * family/parameters even when the crash tore the live tables the
    * detection would otherwise read. */
  def snapshotParams(spark: SparkSession,
                     indexRoot: String): Option[Map[String, String]] =
    readFile(Hdfs.forPath(spark, indexRoot),
      new HPath(s"$indexRoot/rebuild_src/_params")).map(parseParams)

  /** The one parser for the `_params` key=value lines — the resume
    * path and the healer's family detection must never disagree on the
    * format. */
  private def parseParams(content: String): Map[String, String] =
    content.linesIterator.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap

  /** The probe/append guard: an index with an in-flight (crashed or
    * concurrent) rebuild must fail loudly instead of silently serving
    * half-rewritten tables against a possibly-mismatched meta. */
  def assertNotInflight(spark: SparkSession, indexRoot: String): Unit =
    if (isInflight(spark, indexRoot))
      throw new IllegalStateException(
        s"index at $indexRoot has an in-flight (crashed or concurrent) " +
          "rebuild — re-run the rebuild to heal before probing or appending")

  private def readFile(fs: FileSystem, p: HPath): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, UTF_8))
      } finally in.close()
    }

  private def writeFile(fs: FileSystem, p: HPath, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(UTF_8)) finally out.close()
  }
}
