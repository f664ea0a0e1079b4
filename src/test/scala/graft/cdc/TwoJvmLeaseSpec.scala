package graft.cdc

import graft.SparkSpec

/** The single-driver fence across REAL process boundaries (r10 verdict
  * #1): DriverLeaseSpec simulates a second driver with a separate lease
  * identity inside one JVM; the deployment claim is about two JVMs. Here
  * a second JVM is actually spawned (same classpath + JDK17 add-opens as
  * this forked test JVM) and:
  *
  *  1. runs the real CLI `replay` verb — a mutating entry point whose
  *     first step is `DriverLease.acquire` inside `replayDeadLetters` —
  *     against a lease-held state path, and must DIE with the
  *     holder-naming contract message (nonzero exit);
  *  2. HOLDS a lease (heartbeating) and is then `kill -9`'d: a fresh
  *     foreign acquire inside the staleness horizon is still refused, and
  *     one past the horizon takes the lease over.
  */
class TwoJvmLeaseSpec extends SparkSpec {

  /** JDK17 --add-opens of THIS forked JVM, replayed onto children (Spark
    * cannot start without them outside spark-submit). */
  private def addOpens: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val in = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toVector
    in.zipWithIndex.flatMap {
      case (a, i) if a == "--add-opens" && i + 1 < in.size => Seq(a, in(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case _ => Nil
    }
  }

  private def spawn(mainClass: String, args: Seq[String],
                    out: java.io.File): Process = {
    val java = sys.props("java.home") + "/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), mainClass) ++ args
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(out)
      .start()
  }

  private def slurp(f: java.io.File): String =
    if (f.exists()) new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8") else ""

  test("a second JVM's CLI replay dies loud against a lease-held state " +
    "path, naming the holder (the fail-loud deployment contract, " +
    "process-for-real)") {
    val sinkRoot = tmpDir("twojvm-sink")
    val statePath = s"$sinkRoot/t"
    val scratch = tmpDir("twojvm-scratch")
    // THIS process is the live driver: it holds a fresh lease
    DriverLease.acquire(spark, statePath)
    try {
      val cfg = new java.io.File(scratch, "graft.properties")
      // a GENEROUS staleness horizon in the child config (review r11):
      // with the 60 s default, a slow child start (JVM spawn + Spark init
      // on a loaded host — the test budgets 180 s) would read the parent's
      // unrefreshed lease as stale and LEGALLY take it over, flipping the
      // expected refusal into a spurious red
      java.nio.file.Files.write(cfg.toPath,
        s"""feed.dir=$scratch/feed
           |table.dir=$scratch/tables
           |sink.root=$sinkRoot
           |lease.stale.ms=600000
           |sync.t.pk=id
           |sync.t.schema=id INT, score BIGINT
           |""".stripMargin.getBytes("UTF-8"))
      val out = new java.io.File(scratch, "replay.out")
      val p = spawn("graft.cli.Main", Seq("replay", cfg.getPath), out)
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"child replay JVM did not exit; output so far:\n${slurp(out)}")
      val log = slurp(out)
      assert(p.exitValue() !== 0,
        s"the second driver's replay must DIE, not proceed:\n$log")
      assert(log.contains(DriverLease.processIdentity),
        s"the failure must NAME the holder (${DriverLease.processIdentity}):\n$log")
      assert(log.contains("outside the deployment contract"),
        s"the failure must cite the contract:\n$log")
      // and the holder is untouched
      assert(DriverLease.holder(spark, statePath).map(_._1) ===
        Some(DriverLease.processIdentity))
    } finally DriverLease.release(spark, statePath)
  }

  test("kill -9 of a real holder JVM: a foreign acquire inside the " +
    "staleness horizon is refused; past it, the lease is taken over") {
    val sinkRoot = tmpDir("twojvm-kill")
    val statePath = s"$sinkRoot/t"
    val out = new java.io.File(tmpDir("twojvm-kill-out"), "hold.out")
    val p = spawn("graft.cdc.LeaseHoldMain", Seq(statePath), out)
    try {
      // wait until the child REALLY holds the lease (it prints HELD after
      // its first acquire; the lease file carries its identity)
      val deadline = System.currentTimeMillis() + 120000L
      var heldBy: Option[String] = None
      while (heldBy.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        heldBy = DriverLease.holder(spark, statePath).map(_._1)
      }
      assert(heldBy.isDefined,
        s"child never acquired the lease; output:\n${slurp(out)}")
      assert(heldBy.get != DriverLease.processIdentity,
        "the lease must carry the CHILD's identity")
      // poll for the HELD confirmation (review r11): the lease file is
      // visible INSIDE acquire(), before the child prints and flushes —
      // a single slurp raced that window
      val heldDeadline = System.currentTimeMillis() + 30000L
      while (!slurp(out).contains("HELD") &&
             System.currentTimeMillis() < heldDeadline) Thread.sleep(100L)
      assert(slurp(out).contains("HELD"), s"child did not confirm:\n${slurp(out)}")
      // kill -9: no shutdown hook, no release — the crash shape
      p.destroyForcibly()
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      // inside the horizon the dead holder's heartbeat still reads fresh:
      // the fence refuses (nothing yet distinguishes a crash from a pause).
      // Probed with a GENEROUS horizon so a slow parent (GC, loaded host)
      // between the kill and this call can't accidentally cross it.
      val killedAt = System.currentTimeMillis()
      val e = intercept[IllegalStateException] {
        DriverLease.acquire(spark, statePath, staleMs = 120000L)
      }
      assert(e.getMessage.contains(heldBy.get))
      // past the horizon the takeover reclaims it: sleep until the dead
      // heartbeat is provably older than the probe horizon
      val wait = killedAt + DriverLease.MinStaleMs + 1500L - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      DriverLease.acquire(spark, statePath, staleMs = DriverLease.MinStaleMs)
      assert(DriverLease.holder(spark, statePath).map(_._1) ===
        Some(DriverLease.processIdentity),
        "the stale takeover must install the new driver's identity")
      DriverLease.release(spark, statePath)
    } finally { p.destroyForcibly(); () }
  }
}

/** Child-JVM main for the kill -9 scenario: acquire the lease on args(0)
  * and heartbeat it forever (the spec SIGKILLs this process). */
object LeaseHoldMain {
  def main(args: Array[String]): Unit = {
    val statePath = args(0)
    val spark = graft.GraftSession.get("local[2]", 2)
    DriverLease.acquire(spark, statePath)
    println("HELD " + DriverLease.processIdentity)
    Console.out.flush()
    while (true) {
      Thread.sleep(500L)
      DriverLease.acquire(spark, statePath)
    }
  }
}
