package graft.cdc

import org.apache.spark.sql.SparkSession

/** Fail-loud single-driver lease on a sink state path (r9 verdict #1).
  *
  * The sink's concurrency protocols (state lock, mutation stamp, swap
  * monitor, marker ownership) serialize writers within ONE driver JVM;
  * cross-process racers are merely tolerated by rename-retry with
  * last-copy-wins semantics — a second driver process streaming to the same
  * state path is OUTSIDE the deployment contract, but until this lease
  * nothing stopped it: two drivers would silently interleave complete-copy
  * swaps, each dropping the other's applied rows. The lease turns that
  * silent interleaving into a loud failure at the second driver's first
  * mutating call.
  *
  * Mechanism (the [[FileProgressStore]] file-discipline precedent): a
  * one-line lease file at `<statePath>.lease` holding the owner's process
  * identity (pid + random token, minted once per JVM); the HEARTBEAT is the
  * file's mtime, refreshed by every [[acquire]] — one `setTimes` RPC per
  * micro-batch, no rewrite. Every mutating entry point
  * (`Pipeline.applySync`, `commitRefreshSwap`, `replayDeadLetters`) acquires
  * under the state lock:
  *
  *  - no lease, or OUR identity        -> own it, refresh the heartbeat
  *  - foreign identity, heartbeat FRESH -> throw (the fail-loud contract)
  *  - foreign identity, heartbeat STALE -> take over (the previous driver is
  *    presumed dead: crashed drivers leave their lease behind, and takeover
  *    on staleness is what lets a restart reclaim its own state path after
  *    the token changed)
  *
  * The lease is a DETECTION fence, not a perfect mutex: two processes
  * racing the very first claim can both momentarily believe they own it
  * (the initial create is atomic where the filesystem provides atomic
  * create-no-overwrite — HDFS, local — but takeover's delete+create has a
  * window). The guarantee that matters survives: within one heartbeat
  * interval, at least one of the two observes a fresh foreign lease and
  * dies LOUDLY, which is precisely the contract violation the lease exists
  * to surface. A genuinely dead holder is reclaimed after
  * [[PipelineConfig.leaseStaleMs]] with a WARN.
  *
  * Scale posture: one tiny-file read + one setTimes per batch per sync —
  * noise next to the batch's own writes; nothing scales with data.
  */
object DriverLease {

  /** This JVM's lease identity: pid plus a random token so a RESTARTED
    * driver (same pid space, new process) never collides with its crashed
    * predecessor's lease content — the stale-heartbeat takeover is what
    * reclaims it. */
  val processIdentity: String =
    ProcessHandle.current().pid() + "-" +
      java.util.UUID.randomUUID().toString.take(8)

  /** Default staleness horizon: a heartbeat (mtime) older than this marks
    * the holder dead and the lease claimable. Must exceed the trigger
    * interval (every batch refreshes the heartbeat); the config surface is
    * `lease.stale.ms` -> [[graft.model.PipelineConfig.leaseStaleMs]]. */
  val DefaultStaleMs: Long = 60L * 1000L

  def leasePath(statePath: String): String = statePath + ".lease"

  /** Grace before a torn (unreadable) lease file may be reclaimed: long
    * enough that a healthy in-flight create (transiently length 0) is
    * never deleted from under its writer, short enough that a
    * crash-stranded torn file never wedges acquires. */
  val TornGraceMs: Long = 5000L

  /** Floor on the staleness horizon: the heartbeat cadence is
    * max(1 s, staleMs/3) plus RPC time, so horizons much below this are
    * unsustainable even for a healthy live stream — the fence would evict
    * the wrong party (review r10). */
  val MinStaleMs: Long = 5000L

  private val log = org.slf4j.LoggerFactory.getLogger("graft.lease")

  // same-JVM acquire serialization per path (two refreshAsync tasks must
  // not interleave the read-evaluate-write); cross-process exclusion is the
  // file content itself
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lock(statePath: String): Object =
    locks.computeIfAbsent(statePath, _ => new Object)

  // the shared cdc (FileSystem, Path) resolver — one discipline with the
  // swap/marker file protocols (review r10)
  private def hfs(spark: SparkSession, p: String) = StateCommit.hfs(spark, p)

  private def readIdentity(fs: org.apache.hadoop.fs.FileSystem,
                           p: org.apache.hadoop.fs.Path): Option[(String, Long)] =
    try {
      if (!fs.exists(p)) None
      else {
        val st = fs.getFileStatus(p)
        val len = st.getLen.toInt
        if (len == 0 || len > 256) None // torn or out-of-protocol: claimable
        else {
          val bytes = new Array[Byte](len)
          val in = fs.open(p)
          try in.readFully(0, bytes) finally in.close()
          Some((new String(bytes, "UTF-8").trim, st.getModificationTime))
        }
      }
    } catch { case _: java.io.FileNotFoundException => None }

  private def writeLease(fs: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path, identity: String,
                         overwrite: Boolean): Boolean =
    try {
      val parent = p.getParent
      if (parent != null && !fs.exists(parent)) { fs.mkdirs(parent); () }
      val out = fs.create(p, overwrite)
      try out.write(identity.getBytes("UTF-8")) finally out.close()
      true
    } catch {
      case _: java.io.IOException => false // lost an atomic-create race
    }

  /** Acquire (or re-confirm) the lease for `identity`; throws
    * [[IllegalStateException]] if a DIFFERENT identity holds it with a
    * heartbeat younger than `staleMs`. Refreshes our heartbeat on success. */
  def acquire(spark: SparkSession, statePath: String,
              identity: String = processIdentity,
              staleMs: Long = DefaultStaleMs): Unit =
    lock(statePath).synchronized {
      // a zero/negative/tiny horizon reads every (or even a healthy
      // heartbeating) foreign lease as stale — two drivers would each take
      // over per batch, silently restoring the exact last-copy-wins
      // interleaving the lease exists to make loud (review r10); same
      // guard class as setStagingReapHorizonMs
      require(staleMs >= MinStaleMs,
        s"lease.stale.ms must be >= $MinStaleMs (the heartbeat cadence " +
          s"cannot sustain shorter horizons), got $staleMs")
      val (fs, p) = hfs(spark, leasePath(statePath))
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        require(attempts <= 4,
          s"cannot acquire driver lease at $p after $attempts attempts")
        readIdentity(fs, p) match {
          case Some((held, _)) if held == identity =>
            // ours: refresh the heartbeat without rewriting (a rewrite's
            // torn-read window would make a concurrent reader see garbage)
            try fs.setTimes(p, System.currentTimeMillis(), -1)
            catch { case _: java.io.IOException => () }
            done = true
          case Some((held, mtime)) =>
            val age = System.currentTimeMillis() - mtime
            if (age <= staleMs)
              throw new IllegalStateException(
                s"sink state $statePath is leased by driver '$held' " +
                  s"(heartbeat ${age / 1000}s ago, horizon ${staleMs / 1000}s). " +
                  "A second driver process on the same state path is outside " +
                  "the deployment contract (see Pipeline's scaladoc) — stop " +
                  "it, or wait for its lease to expire.")
            else {
              log.warn(s"taking over stale driver lease at $p from '$held' " +
                s"(heartbeat ${age / 1000}s ago > ${staleMs / 1000}s horizon)")
              try { fs.delete(p, false); () }
              catch { case _: java.io.IOException => () }
              if (writeLease(fs, p, identity, overwrite = false)) done = true
              // else: lost the takeover race — loop re-reads what won
            }
          case None =>
            // a TORN lease (empty/oversized/unreadable) is owned by nobody
            // — but a JUST-CREATED lease is also transiently length 0
            // (create-then-write), so reclaim only past a short grace on
            // the mtime: an in-flight writer completes in ms and the next
            // loop iteration reads its identity; a crash-stranded torn file
            // has a stale mtime and is deleted so the no-overwrite create
            // can proceed (review r10: an ungated delete here raced a
            // healthy create and let BOTH drivers believe they owned it)
            if (fs.exists(p) &&
                System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
                  > TornGraceMs) {
              try fs.delete(p, false)
              catch { case _: java.io.IOException => () }
            }
            if (writeLease(fs, p, identity, overwrite = false)) done = true
            // else: lost the claim race or an in-flight create holds the
            // file — brief pause, then re-read what won
            else Thread.sleep(50L)
        }
      }
    }

  /** Release the lease if `identity` holds it (shutdown hygiene and specs;
    * a crashed driver's lease is reclaimed by staleness instead). */
  def release(spark: SparkSession, statePath: String,
              identity: String = processIdentity): Unit =
    lock(statePath).synchronized {
      val (fs, p) = hfs(spark, leasePath(statePath))
      readIdentity(fs, p) match {
        case Some((held, _)) if held == identity =>
          try { fs.delete(p, false); () }
          catch { case _: java.io.IOException => () }
        case _ => ()
      }
    }

  /** Current holder and heartbeat age in ms, if any (status surface). */
  def holder(spark: SparkSession, statePath: String): Option[(String, Long)] =
    lock(statePath).synchronized {
      val (fs, p) = hfs(spark, leasePath(statePath))
      readIdentity(fs, p).map { case (id, mtime) =>
        (id, System.currentTimeMillis() - mtime)
      }
    }
}
