package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot directory with a commit-pointer protocol — the
  * object-store-safe replacement for rename-swap (a directory rename is
  * neither atomic nor cheap on S3-style stores; writing a small pointer
  * file is a single atomic PUT).
  *
  * Layout under `root`:
  * {{{
  *   root/v=<version>/   parquet data, one directory per committed epoch
  *   root/_LATEST        tiny file holding the committed version number
  * }}}
  *
  * Protocol: (1) write the new epoch's data into a fresh `v=<n>` directory
  * — readers never look at it because the pointer still names the prior
  * version; (2) overwrite `_LATEST` with `n` — the commit point, one
  * atomic small-object write; (3) garbage-collect versions older than the
  * previous one (kept as the reader grace window; production retention
  * would be time-based). A crash between (1) and (2) leaves a dangling
  * uncommitted directory and a fully readable prior snapshot; a crash
  * during (3) leaves extra old versions — both repaired by the next
  * commit. Versions must be monotonic; streaming callers use the
  * micro-batch id, which survives restarts via the query checkpoint.
  *
  * Everything goes through the Hadoop FileSystem API, so the same code
  * runs on local disk, HDFS, or any object store with a Hadoop connector.
  */
object SnapshotStore {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "_LATEST")
  private def versionDir(root: String, v: Long) = new Path(root, s"v=$v")

  /** Step (1): stage an epoch's data WITHOUT committing it. */
  def writeVersion(df: DataFrame, root: String, version: Long): Unit =
    df.write.mode("overwrite").parquet(versionDir(root, version).toString)

  /** Step (2): commit — point readers at `version`. Written to a temp file
    * and renamed into place with OVERWRITE: `create(overwrite=true)` would
    * truncate-then-write, letting a concurrent reader observe an empty
    * pointer on local FS / HDFS; rename is atomic there, and object stores
    * with atomic PUT are covered either way.
    */
  def commitPointer(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s"_LATEST.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(root).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, pointer(root), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Step (3): drop committed-over versions, keeping `current` and its
    * predecessor as a reader grace window.
    */
  def gc(spark: SparkSession, root: String, current: Long): Unit = {
    val f = fs(spark, root)
    val keep = listVersions(spark, root).filter(_ <= current).sorted.takeRight(2).toSet
    listVersions(spark, root)
      .filter(v => v <= current && !keep(v))
      .foreach(v => f.delete(versionDir(root, v), true))
  }

  /** Full commit: stage, point, collect garbage. */
  def commit(df: DataFrame, root: String, version: Long): Unit = {
    val spark = df.sparkSession
    writeVersion(df, root, version)
    commitPointer(spark, root, version)
    gc(spark, root, version)
  }

  /** The committed version, or None before the first commit. Defensive
    * against a torn/empty pointer (possible only on stores with neither
    * atomic rename nor atomic PUT): retries the read briefly, then treats a
    * still-unparsable pointer as absent rather than throwing
    * NumberFormatException at the reader.
    */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    def readOnce(): Option[Long] =
      if (!f.exists(pointer(root))) None
      else {
        val in = f.open(pointer(root))
        try {
          val s = new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
          s.toLongOption
        } finally in.close()
      }
    var attempt = 0
    var result: Option[Long] = None
    var present = true
    while (attempt < 3 && result.isEmpty && present) {
      if (attempt > 0) Thread.sleep(50L * attempt)
      present = f.exists(pointer(root))
      if (present) result = readOnce()
      attempt += 1
    }
    result
  }

  private def listVersions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) Seq.empty
    else f.listStatus(r).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
  }

  /** The committed snapshot, or None before the first commit. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    latestVersion(spark, root)
      .map(v => spark.read.parquet(versionDir(root, v).toString))

  /** The committed snapshot as of strictly before `version` — what an
    * epoch writing `version` must merge against. Matters on crash replay:
    * if the pointer already names `version` (committed, but the caller's
    * own checkpoint didn't advance), reading "latest" would read the very
    * directory the replay is about to overwrite; the predecessor version
    * is still present thanks to the GC grace window.
    */
  def readBefore(spark: SparkSession, root: String,
      version: Long): Option[DataFrame] =
    latestVersion(spark, root) match {
      case Some(v) if v < version =>
        Some(spark.read.parquet(versionDir(root, v).toString))
      case Some(_) =>
        listVersions(spark, root).filter(_ < version).sorted.lastOption
          .map(v => spark.read.parquet(versionDir(root, v).toString))
      case None => None
    }
}
