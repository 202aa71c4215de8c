package graft.sources

import org.apache.spark.sql.SparkSession

/** Crash-safe small-file compaction for hive-partitioned parquet
  * tables — the maintenance pass every append-grown index needs
  * (IVF cells, LSH band partitions): each appended batch adds at
  * least one file per touched partition, and probe scans go
  * metadata-bound once partitions hold hundreds of tiny files.
  *
  * Extracted from the IVF compactor so every partitioned store shares
  * ONE audited swap protocol instead of re-growing its own: rewrite to
  * a tmp dir, stage the live dir aside, swap, delete the stage — every
  * crash point leaves the data recoverable, and the startup sweep
  * repairs a previous crash (restores a staged dir whose live twin
  * vanished mid-swap, drops orphaned tmp rewrites).
  */
object Compaction {

  /** Compact partitions of `tableRoot` (dirs named `<prefix><value>`)
    * whose parquet-file count exceeds `maxFilesPerPart` down to
    * `targetFiles` files. Tmp/stage dirs live in `tableRoot`'s parent
    * (underscore-prefixed — invisible to parquet readers). Content is
    * never changed, only row layout: readers see identical rows before
    * and after (spec-asserted by both call sites). Returns the
    * compacted partition VALUES (dir-name suffixes). */
  def compactPartitions(spark: SparkSession, tableRoot: String,
                        prefix: String, maxFilesPerPart: Int,
                        targetFiles: Int = 1): Seq[String] = {
    require(maxFilesPerPart >= 1 && targetFiles >= 1)
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val root = new HPath(tableRoot)
    val parent = root.getParent
    val fs = FileSystem.get(root.toUri, spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"no partitioned table at $tableRoot")
    // Startup recovery: a previous compaction that crashed mid-swap
    // leaves _compact_tmp_*/_compact_old_* dirs behind. The dangerous
    // window is between rename(live -> old) and rename(tmp -> live):
    // there the partition is ABSENT from the table and only the staged
    // copy holds its data — without this sweep the loss is silent
    // (scans just skip the missing partition). Restore the staged copy
    // when the live dir is missing; otherwise the swap completed (or
    // never started) and the leftovers are just litter.
    fs.listStatus(parent).map(_.getPath)
      .filter(p => p.getName.startsWith("_compact_old_")).foreach { trash =>
        val live = new HPath(root, trash.getName.stripPrefix("_compact_old_"))
        if (!fs.exists(live)) {
          if (!fs.rename(trash, live))
            throw new java.io.IOException(
              s"crash recovery could not restore $trash to $live")
        } else fs.delete(trash, true)
      }
    fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith("_compact_tmp_"))
      .foreach(fs.delete(_, true)) // incomplete rewrites — always safe to drop
    val compacted = Seq.newBuilder[String]
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(prefix)).foreach { dir =>
        val nFiles = fs.listStatus(dir)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (nFiles > maxFilesPerPart) {
          val tmp = new HPath(parent, s"_compact_tmp_${dir.getName}")
          // reading the partition dir directly drops the partition
          // column — intended: the dir name carries it, rows need not
          spark.read.parquet(dir.toString).coalesce(targetFiles)
            .write.mode("overwrite").parquet(tmp.toString)
          // stage the live dir ASIDE before renaming the replacement
          // in: a crash between a delete and a rename would silently
          // drop the whole partition; with the two-step every crash
          // point leaves the data recoverable
          val trash = new HPath(parent, s"_compact_old_${dir.getName}")
          if (fs.exists(trash)) fs.delete(trash, true)
          if (!fs.rename(dir, trash))
            throw new java.io.IOException(s"compaction could not stage $dir aside")
          if (!fs.rename(tmp, dir)) {
            fs.rename(trash, dir) // restore the original partition
            throw new java.io.IOException(s"compaction rename failed for $dir")
          }
          fs.delete(trash, true)
          compacted += dir.getName.stripPrefix(prefix)
        }
      }
    // Spark caches parquet file listings per path (SharedInMemoryCache):
    // readers opened after the rewrite would otherwise chase deleted files
    spark.catalog.refreshByPath(tableRoot)
    compacted.result()
  }
}
