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
  * (`rebuild_src/_token`, created only after the snapshot parquet has
  * landed) and echoed to `<index>/rebuild_done_token` only after the
  * rebuild has committed its meta. A leftover snapshot whose token
  * EQUALS the done token belongs to a COMPLETED rebuild whose final
  * cleanup crashed — rows may have been appended since, so rebuilding
  * from it would silently roll the index back; it is discarded and the
  * live tables re-snapshotted. Any other state (token present, done
  * token absent or different) is a crashed IN-FLIGHT rebuild and the
  * snapshot is resumed from. mtime ordering was rejected here: on
  * filesystems with coarse modification-time granularity (1 s on some
  * HDFS/object stores) or renames that do not preserve times, a fresh
  * crashed snapshot can compare "older" than meta and be misclassified
  * as stale — the exact silent rollback the check exists to prevent.
  *
  * The index is NOT serveable mid-rebuild (its tables are overwritten
  * in place); the guarantee is that no crash point loses data or rolls
  * back appends, never that probes stay online through the rebuild.
  */
object Rebuild {

  /** Run `rebuild` against a committed snapshot of `snapshot`'s rows.
    * `snapshot` is only evaluated (and materialized) when no committed
    * snapshot already exists — a re-run after a crash resumes from the
    * existing one. `rebuild` receives the snapshot read back from disk
    * and must commit the index atomically-enough that a RE-RUN from
    * the same snapshot converges (write meta last). */
  def withCommittedSnapshot(spark: SparkSession, indexRoot: String,
                            snapshot: => DataFrame)(
                            rebuild: DataFrame => Unit): Unit = {
    val fs = Hdfs.forPath(spark, indexRoot)
    val src = new HPath(s"$indexRoot/rebuild_src")
    val tokenFile = new HPath(src, "_token")
    val doneFile = new HPath(s"$indexRoot/rebuild_done_token")
    val srcTok = readToken(fs, tokenFile)
    if (srcTok.isDefined && srcTok == readToken(fs, doneFile)) {
      // completed rebuild's leftover: stale, discard — and a FAILED
      // delete must abort, or the stale snapshot would be rebuilt from
      // after all (the silent-rollback this protocol exists to prevent)
      if (!fs.delete(src, true))
        throw new java.io.IOException(
          s"cannot discard stale rebuild snapshot $src — aborting rather " +
            "than rebuilding from it")
    }
    if (readToken(fs, tokenFile).isEmpty) {
      // no committed snapshot (never started, crashed mid-snapshot, or
      // the stale one was just discarded): drop any partial dir and
      // snapshot the CURRENT live rows; the token lands last, so the
      // snapshot is committed exactly when the token is readable
      if (fs.exists(src)) fs.delete(src, true)
      snapshot.write.mode("overwrite").parquet(src.toString)
      writeToken(fs, tokenFile, java.util.UUID.randomUUID().toString)
    }
    val tok = readToken(fs, tokenFile).getOrElse(throw new IllegalStateException(
      s"snapshot token vanished under $src"))
    rebuild(spark.read.parquet(src.toString))
    // commit order: done token BEFORE deleting the snapshot — a crash
    // between the two leaves a stale-classified leftover, cleaned at
    // the next entry; a crash before the token re-runs the (idempotent)
    // rebuild from the same snapshot
    writeToken(fs, doneFile, tok)
    fs.delete(src, true)
  }

  private def readToken(fs: FileSystem, p: HPath): Option[String] =
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

  private def writeToken(fs: FileSystem, p: HPath, tok: String): Unit = {
    val out = fs.create(p, true)
    try out.write(tok.getBytes(UTF_8)) finally out.close()
  }
}
