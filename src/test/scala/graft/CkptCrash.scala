package graft

import org.apache.spark.sql.SparkSession

/** Shared checkpoint-crash protocol for streaming specs: rewind a
  * checkpoint to the consistent snapshot a process killed inside batch k
  * leaves behind (offsets {0..k} present, commits {0..k-1}) so a resumed
  * query must replay batch k idempotently. Used by `WireReplaySpec` (CDC
  * sinks) and `DedupStreamSpec` (incremental dedup index). */
object CkptCrash {

  def logFiles(ckpt: String, log: String): Seq[java.io.File] = {
    val d = new java.io.File(s"$ckpt/$log")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong).toSeq
  }

  /** Block until `n` commits land (or fail after 120s). */
  def awaitCommits(ckpt: String, n: Int): Unit = {
    val deadline = System.currentTimeMillis() + 120000
    while (logFiles(ckpt, "commits").size < n &&
           System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(logFiles(ckpt, "commits").size >= n,
      s"stream never committed $n batches in $ckpt")
  }

  /** Rewind the checkpoint to a consistent crash-inside-batch-k snapshot:
    * offsets {0..k} present, commits {0..k-1} — exactly what a process
    * killed after starting batch k but before its commit leaves behind.
    * (Deleting only the commit would fabricate an impossible state: an
    * offsets entry k+1 can only be written after commit k.) Deletions go
    * through the Hadoop FS so the local ChecksumFileSystem's hidden
    * `.N.crc` siblings go too — a stale crc left by java.io deletion makes
    * the resumed query's commit rename fail as a bogus
    * "multiple streaming queries" conflict. */
  def simulateCrashAtLastCommit(spark: SparkSession, ckpt: String): Long = {
    val commits = logFiles(ckpt, "commits")
    assert(commits.size >= 2, s"stream never committed two batches in $ckpt")
    val k = commits.last.getName.toLong
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def rm(f: java.io.File): Unit =
      assert(fs.delete(new org.apache.hadoop.fs.Path(f.getAbsolutePath), false),
        s"could not delete $f")
    rm(commits.last)
    logFiles(ckpt, "offsets").filter(_.getName.toLong > k).foreach(rm)
    k
  }
}
