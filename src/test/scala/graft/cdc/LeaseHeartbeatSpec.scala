package graft.cdc

import graft.SparkSpec

/** Heartbeat degradation paths (ADVICE r10): the preferred heartbeat is
  * one `setTimes` RPC, but a filesystem may (a) THROW
  * UnsupportedOperationException from setTimes — previously uncaught, it
  * propagated out of acquire and failed every batch — or (b) implement it
  * as a SILENT NO-OP (some object stores), freezing a healthy holder's
  * mtime until a second driver "legitimately" takes over a live stream.
  * Both must degrade to rewriting the lease file as the heartbeat. The
  * spec drives REAL acquires through two RawLocalFileSystem variants
  * registered under their own schemes. */
class LeaseHeartbeatSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def localFile(statePath: String): java.io.File =
    new java.io.File(new org.apache.hadoop.fs.Path(
      DriverLease.leasePath(statePath)).toUri.getPath)

  private def ageBack(statePath: String, ms: Long): Long = {
    val f = localFile(statePath)
    val aged = System.currentTimeMillis() - ms
    assert(f.setLastModified(aged), s"cannot age $f")
    f.lastModified()
  }

  test("setTimes throwing UnsupportedOperationException: acquire does not " +
    "fail the batch — the heartbeat falls back to rewriting the lease, the " +
    "mtime advances, and the identity survives") {
    conf.set("fs.nosettimes.impl", classOf[NoSetTimesFs].getName)
    val dir = tmpDir("hb-nosettimes")
    val statePath = s"nosettimes:$dir/t"
    DriverLease.acquire(spark, statePath, identity = "hbA")
    val before = ageBack(statePath, 10000L)
    // pre-fix this threw UnsupportedOperationException out of acquire
    DriverLease.acquire(spark, statePath, identity = "hbA")
    val f = localFile(statePath)
    assert(f.lastModified() > before,
      "the rewrite fallback must advance the heartbeat mtime")
    assert(DriverLease.holder(spark, statePath).map(_._1) === Some("hbA"),
      "the rewritten lease must carry the same identity")
    // steady state: the path is in rewrite mode now — still refreshing
    val before2 = ageBack(statePath, 10000L)
    DriverLease.acquire(spark, statePath, identity = "hbA")
    assert(localFile(statePath).lastModified() > before2)
    // the fence still works: a second driver is refused on the fresh lease
    intercept[IllegalStateException] {
      DriverLease.acquire(spark, statePath, identity = "hbB")
    }
    DriverLease.release(spark, statePath, identity = "hbA")
  }

  test("setTimes as a SILENT NO-OP: the one-time verification catches the " +
    "frozen mtime and degrades to the rewrite heartbeat, so a healthy " +
    "holder's lease never decays toward a wrongful takeover") {
    conf.set("fs.frozentimes.impl", classOf[FrozenTimesFs].getName)
    val dir = tmpDir("hb-frozen")
    val statePath = s"frozentimes:$dir/t"
    DriverLease.acquire(spark, statePath, identity = "hbC")
    // age well past the verification gap so a frozen mtime is measurable
    val before = ageBack(statePath, 10000L)
    // pre-fix this "succeeded" while the mtime stayed frozen at `before`
    DriverLease.acquire(spark, statePath, identity = "hbC")
    assert(localFile(statePath).lastModified() > before,
      "the no-op must be detected and the heartbeat rewritten")
    assert(DriverLease.holder(spark, statePath).map(_._1) === Some("hbC"))
    // a second driver is still refused: the heartbeat is genuinely fresh
    intercept[IllegalStateException] {
      DriverLease.acquire(spark, statePath, identity = "hbD")
    }
    DriverLease.release(spark, statePath, identity = "hbC")
  }

  test("healthy filesystem: setTimes stays the heartbeat (no rewrite " +
    "needed) and the mtime advances") {
    val statePath = tmpDir("hb-healthy") + "/t"
    DriverLease.acquire(spark, statePath, identity = "hbE")
    val before = ageBack(statePath, 10000L)
    DriverLease.acquire(spark, statePath, identity = "hbE")
    assert(localFile(statePath).lastModified() > before)
    DriverLease.release(spark, statePath, identity = "hbE")
  }
}

/** RawLocalFileSystem whose setTimes THROWS — the (a) degradation. */
class NoSetTimesFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "nosettimes"
  override def getUri: java.net.URI = java.net.URI.create("nosettimes:///")
  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long,
                        atime: Long): Unit =
    throw new UnsupportedOperationException("setTimes not supported")
}

/** RawLocalFileSystem whose setTimes is a SILENT NO-OP — the (b)
  * degradation (the object-store shape). */
class FrozenTimesFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "frozentimes"
  override def getUri: java.net.URI = java.net.URI.create("frozentimes:///")
  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long,
                        atime: Long): Unit = ()
}
