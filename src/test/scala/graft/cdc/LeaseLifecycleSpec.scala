package graft.cdc

import graft.SparkSpec

/** The lease lifecycle's refcount protocol, exercised at ATOM granularity
  * (in-package so the private[cdc] transitions are drivable directly —
  * review r10: the protocol shipped spec-less): every interleaving of a
  * new stream's registration, an old stream's deregistration, and a
  * shutdown release must leave a lease iff a registration is live; and the
  * interrupt classifier must distinguish thread interrupts from I/O
  * timeouts (SocketTimeoutException EXTENDS InterruptedIOException — a
  * transient network timeout must never read as "stop the heartbeat"). */
class LeaseLifecycleSpec extends SparkSpec {

  private def freshPath(tag: String): String = tmpDir(s"lease-lc-$tag") + "/t"

  /** What Pipeline.start does per path: register, then acquire. */
  private def startAtom(path: String): Unit = {
    DriverLease.pathLock(path).synchronized {
      Pipeline.streamRefCount(path).incrementAndGet(); ()
    }
    DriverLease.acquire(spark, path)
  }

  /** What the heartbeat's finally does per path. */
  private def stopAtom(path: String): Unit =
    Pipeline.deregisterStream(spark, path)

  /** What releaseLeases does per path (the double-checked gated release). */
  private def releaseAtom(path: String): Unit =
    if (Pipeline.streamRefCount(path).get() == 0L)
      DriverLease.pathLock(path).synchronized {
        if (Pipeline.streamRefCount(path).get() == 0L)
          DriverLease.release(spark, path)
      }

  private def held(path: String): Boolean =
    DriverLease.holder(spark, path).isDefined

  test("refcount transitions: every interleaving of restart/shutdown/" +
    "release atoms leaves a lease iff a registration is live") {
    // restart: old stream live, new stream starts, old heartbeat exits —
    // both orders of {new-start, old-stop} must keep the lease held
    for ((order, tag) <- Seq(
      (Seq("S", "H"), "start-then-stop"), (Seq("H", "S"), "stop-then-start"))) {
      val p = freshPath(tag)
      startAtom(p) // the OLD stream
      order.foreach { case "S" => startAtom(p); case "H" => stopAtom(p) }
      assert(Pipeline.streamRefCount(p).get() === 1L)
      assert(held(p), s"$tag: a live registration must keep the lease")
      releaseAtom(p)
      assert(held(p), s"$tag: the gated release must skip a live registration")
      stopAtom(p)
      assert(!held(p), s"$tag: the last deregistration releases")
    }
    // shutdown hygiene: {old-stop, gated-release} in both orders ends absent
    for ((order, tag) <- Seq(
      (Seq("H", "R"), "stop-then-release"), (Seq("R", "H"), "release-then-stop"))) {
      val p = freshPath(tag)
      startAtom(p)
      order.foreach { case "H" => stopAtom(p); case "R" => releaseAtom(p) }
      assert(!held(p), s"$tag: no registration left, lease must be gone")
    }
    // cold start vs stray release: both orders end with the new stream leased
    for ((order, tag) <- Seq(
      (Seq("S", "R"), "start-then-release"), (Seq("R", "S"), "release-then-start"))) {
      val p = freshPath(tag)
      order.foreach { case "S" => startAtom(p); case "R" => releaseAtom(p) }
      assert(Pipeline.streamRefCount(p).get() === 1L && held(p),
        s"$tag: the registered stream must end up leased")
      stopAtom(p)
    }
  }

  test("interrupt classification: a socket TIMEOUT passes through as a " +
    "plain IO failure; real interrupts restore the flag and throw") {
    // timeout: no throw, no interrupt flag
    DriverLease.rethrowIfInterrupt(new java.net.SocketTimeoutException("read timed out"))
    assert(!Thread.currentThread().isInterrupted,
      "a timeout must not poison the interrupt flag")
    // genuine interrupt wrappers: throw AND restore the flag
    for (e <- Seq[java.io.IOException](
      new java.io.InterruptedIOException("interrupted"),
      new java.nio.channels.ClosedByInterruptException())) {
      intercept[IllegalStateException] { DriverLease.rethrowIfInterrupt(e) }
      assert(Thread.interrupted(), // reads AND clears for the next round
        s"${e.getClass.getSimpleName} must restore the interrupt flag")
    }
    // anything else passes through
    DriverLease.rethrowIfInterrupt(new java.io.IOException("disk"))
    assert(!Thread.currentThread().isInterrupted)
  }
}
