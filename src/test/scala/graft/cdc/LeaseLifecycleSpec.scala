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
    DriverLease.locked(path) {
      Pipeline.streamRefCount(path).incrementAndGet(); ()
    }
    DriverLease.acquire(spark, path)
  }

  /** What the heartbeat's finally does per path. */
  private def stopAtom(path: String): Unit =
    Pipeline.deregisterStream(spark, path)

  /** What releaseLeases does per path — the REAL shared gating logic
    * (review r10: a hand-copied gate would drift from production). */
  private def releaseAtom(path: String): Unit = {
    Pipeline.releasePathIfUnused(spark, path); ()
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

  test("gated release re-checks the count UNDER the lock: a registration " +
    "landing between the lock-free pre-check and the lock acquisition is " +
    "honored, not raced (the deleted-live-lease regression guard)") {
    val p = freshPath("recheck")
    startAtom(p); stopAtom(p) // lease released, count 0
    DriverLease.acquire(spark, p) // a stray lease with count 0
    val l = DriverLease.pathLock(p)
    l.lock() // play the concurrent holder
    val releaser = new Thread(() => { Pipeline.releasePathIfUnused(spark, p); () })
    try {
      releaser.start()
      // DETERMINISTIC sync (review r10: a fixed sleep degraded to testing
      // only the pre-check on a loaded host): wait until the releaser is
      // provably parked on the lock queue — past its pre-check
      val deadline = System.currentTimeMillis() + 10000
      while (!l.hasQueuedThread(releaser) &&
             System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(l.hasQueuedThread(releaser),
        "the releaser must be parked on the lock, past its pre-check")
      // a start registers while the releaser waits (we hold the lock, so
      // the register is safe to do directly on the count)
      Pipeline.streamRefCount(p).incrementAndGet()
    } finally l.unlock()
    releaser.join(5000)
    assert(!releaser.isAlive)
    assert(held(p),
      "the in-lock re-check must see the new registration and skip the release")
    assert(Pipeline.streamRefCount(p).get() === 1L)
    stopAtom(p)
  }

  test("gated release SKIPS (never hangs on) a path whose lock a wedged " +
    "holder keeps, and reports false") {
    val p = freshPath("wedged")
    DriverLease.acquire(spark, p) // lease present, count 0
    val l = DriverLease.pathLock(p)
    // the wedged holder must be a DIFFERENT thread: the lock is reentrant,
    // so holding it on this thread would let tryLock succeed immediately
    val holding = new java.util.concurrent.CountDownLatch(1)
    val free = new java.util.concurrent.CountDownLatch(1)
    val wedger = new Thread(() => {
      l.lock()
      try { holding.countDown(); free.await() } finally l.unlock()
    })
    wedger.start()
    assert(holding.await(5, java.util.concurrent.TimeUnit.SECONDS))
    try {
      val t0 = System.currentTimeMillis()
      val released = Pipeline.releasePathIfUnused(spark, p, tryMs = 200L)
      val took = System.currentTimeMillis() - t0
      assert(!released, "a held lock must be skipped, not waited out")
      assert(took < 3000, s"the tryLock bound must hold (took ${took}ms)")
    } finally free.countDown()
    wedger.join(5000)
    // asserted only after the wedger released: held() itself takes the
    // path lock, so probing it mid-wedge would deadlock the test
    assert(held(p), "the lease stays for the wedged holder to finish with")
    DriverLease.release(spark, p)
  }

  test("deregistration under a PENDING interrupt still releases (the flag " +
    "is cleared for the I/O and restored after) — the interrupt-driven " +
    "shutdown path cannot silently strand a lease") {
    val p = freshPath("interrupted")
    startAtom(p)
    assert(held(p))
    Thread.currentThread().interrupt() // the rethrowIfInterrupt aftermath
    try {
      stopAtom(p)
      assert(Thread.currentThread().isInterrupted,
        "the caller's interrupt flag must be restored after deregistration")
    } finally { Thread.interrupted(); () } // clear for the next test
    assert(!held(p),
      "the release I/O must run with a clean flag and actually delete the lease")
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
