package graft.cdc

import graft.SparkSpec

/** Seeded schedule FUZZER for the [[StateCommit]] protocol (r10 verdict
  * #2): [[graft.StateCommitScheduleSpec]] enumerates the ≤5-atom schedule
  * space exhaustively against real parquet state; this spec composes
  * RANDOM legal schedules of 8–12 atoms — multiple batches, crash-replays
  * (same-lineage and checkpoint-reset), dead-letter replays with edited
  * retries, a rebuild (complete or crashed), orphan heals — from the same
  * atom vocabulary, 1,200 seeds per run, and asserts the same two
  * invariants between EVERY atom pair.
  *
  * To make 1,000+ schedules fit in CI seconds, the DATA plane is an
  * in-memory model (bucket → rows; manifest → per-bucket stats — the
  * exhaustive spec already proves the parquet splice/publish plumbing);
  * every PROTOCOL step is the real thing: `claimMarkerDetailed` /
  * `markForeignWrite` / `releaseMarker` / `forceMarker` / `clearMarker` /
  * `mutationStamp` / `stateLock` against real marker/sidecar files. The
  * invariants:
  *
  *  1. ''marker ABSENT ⇒ manifest describes the state exactly'' (the
  *     pruned-read exactness premise: readers prune by the manifest only
  *     while no marker is up);
  *  2. a non-owning write under a standing marker always leaves the
  *     sidecar, so `releaseMarker` can never clear over it.
  *
  * A failure prints its seed and the atom script for replay. */
class StateCommitFuzzSpec extends SparkSpec {

  private val Buckets = 4
  private val Seeds = 1200
  private val base = tmpDir("sc-fuzz")

  // ---- the in-memory data model -------------------------------------
  private final class Model(val statePath: String, val zm: String) {
    val state = scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Int, Long]]()
    var manifest = Map[Long, (Int, Long, Long)]()
    def write(bucket: Long, row: Int, score: Long): Unit =
      state.getOrElseUpdate(bucket, scala.collection.mutable.Map()) += (row -> score)
    def recompute(): Map[Long, (Int, Long, Long)] =
      state.toMap.collect { case (b, rows) if rows.nonEmpty =>
        b -> ((rows.size, rows.values.min, rows.values.max)) }
    def splice(bucket: Long): Unit = {
      val rows = state.getOrElse(bucket, scala.collection.mutable.Map())
      manifest =
        if (rows.isEmpty) manifest - bucket
        else manifest + (bucket -> ((rows.size, rows.values.min, rows.values.max)))
    }
  }

  private def checkInvariants(m: Model, ctx: String): Unit = {
    if (!StateCommit.markerExists(spark, m.zm)) {
      assert(m.manifest === m.recompute(),
        s"$ctx: marker ABSENT but manifest stale — pruned reads would " +
          s"diverge (manifest=${m.manifest}, state=${m.recompute()})")
      assert(!StateCommit.hasForeignWrite(spark, m.zm),
        s"$ctx: sidecar standing with no marker — a release cleared over " +
          "foreign-write evidence")
    }
  }

  // ---- atoms: the exact production step sequences ---------------------

  /** The writeCompacted sequence. crashAt: 0 = complete; 1 = crash right
    * after the claim decision (before sidecar/write); 2 = crash after the
    * sidecar mark + sink write (before splice/release). Crashed atoms
    * still bump the stamp (the schedule-spec convention: conservative —
    * a lost bump could only mask mutations; an extra one only forces a
    * rescan). */
  private def batchAtom(m: Model, id: Long, lineage: String,
                        writes: Seq[(Long, Int, Long)], crashAt: Int): Unit =
    StateCommit.stateLock(m.statePath).synchronized {
      try {
        val claim = StateCommit.claimMarkerDetailed(spark, m.zm, id, lineage)
        val fast = claim == StateCommit.FreshClaim ||
          (claim == StateCommit.ReOwnedClaim && id >= 0 &&
            !StateCommit.hasForeignWrite(spark, m.zm))
        if (crashAt == 1) return
        if (!fast) StateCommit.markForeignWrite(spark, m.zm)
        writes.foreach { case (b, r, s) => m.write(b, r, s) }
        if (crashAt == 2) return
        if (fast) {
          writes.map(_._1).distinct.foreach(m.splice)
          StateCommit.releaseMarker(spark, m.zm, id)
        }
      } finally { StateCommit.mutationStamp(m.statePath).incrementAndGet(); () }
    }

  /** The rebuild: commit (force-own + snapshot swap + stamp), lock-free
    * scan, quiesce-gated publish+clear — the commitRefreshSwap /
    * rebuildZoneMap sequence. */
  private final class RebuildAtoms(m: Model, ownerId: Long,
                                   snapshot: Seq[(Long, Int, Long)]) {
    private var s1 = -1L
    private var pending: Map[Long, (Int, Long, Long)] = Map.empty
    def commit(): Unit = StateCommit.stateLock(m.statePath).synchronized {
      try {
        StateCommit.forceMarker(spark, m.zm, ownerId)
        m.state.clear()
        snapshot.foreach { case (b, r, s) => m.write(b, r, s) }
      } finally { StateCommit.mutationStamp(m.statePath).incrementAndGet(); () }
    }
    def scan(): Unit = {
      s1 = StateCommit.mutationStamp(m.statePath).get()
      pending = m.recompute()
    }
    def clearCheck(): Unit = StateCommit.stateLock(m.statePath).synchronized {
      if (StateCommit.mutationStamp(m.statePath).get() == s1) {
        m.manifest = pending
        StateCommit.clearMarker(spark, m.zm)
      }
    }
  }

  /** The quiesced heal (the streak escalation / next-refresh close) — the
    * REAL [[StateCommit.quiescedClear]] drives the retry/starvation logic;
    * only the data plane rides the model (compute stashes a recomputed
    * manifest and returns an empty frame; publish installs the stash). */
  private def healAtom(m: Model): Unit = {
    var pending: Map[Long, (Int, Long, Long)] = Map.empty
    StateCommit.quiescedClear(spark, m.statePath, m.zm) { () =>
      pending = m.recompute()
      spark.emptyDataFrame
    } { _ => m.manifest = pending }
  }

  // ---- schedule composition ------------------------------------------

  private case class Atom(name: String, run: () => Unit)

  /** Random legal schedule: per-thread atom order is preserved by a
    * random fair merge; ids, lineages, buckets, crash points and the
    * rebuild's fate are all seed-derived. */
  private def compose(seed: Int, m: Model): Vector[Atom] = {
    val rnd = new scala.util.Random(seed)
    var nextId = 0L
    def freshId(): Long = { val i = nextId; nextId += 1; i }
    var row = 1000 * seed // unique row keys per schedule
    def freshWrites(n: Int): Seq[(Long, Int, Long)] =
      (1 to n).map { _ =>
        row += 1
        (rnd.nextInt(Buckets).toLong, row, rnd.nextInt(10000).toLong)
      }
    val threads = scala.collection.mutable.ArrayBuffer[Vector[Atom]]()

    // 1-3 complete batches
    (1 to (1 + rnd.nextInt(3))).foreach { _ =>
      val id = freshId()
      val w = freshWrites(1 + rnd.nextInt(2))
      threads += Vector(Atom(s"b$id", () => batchAtom(m, id, "L1", w, 0)))
    }
    // 1-2 crash-replay pairs; half the replays model a CHECKPOINT RESET
    // (new lineage, independent write set — the ADVICE-r10 hazard), half a
    // same-lineage retry (identical write set by the checkpoint contract)
    (1 to (1 + rnd.nextInt(2))).foreach { _ =>
      val id = freshId()
      val w = freshWrites(1 + rnd.nextInt(2))
      val crashAt = 1 + rnd.nextInt(2)
      val reset = rnd.nextBoolean()
      val (lin2, w2) =
        if (reset) ("L2", freshWrites(1 + rnd.nextInt(2))) else ("L1", w)
      threads += Vector(
        Atom(s"crash$id@$crashAt", () => batchAtom(m, id, "L1", w, crashAt)),
        Atom(s"replay$id${if (reset) ":reset" else ""}",
          () => batchAtom(m, id, lin2, w2, 0)))
    }
    // maybe a dead-letter replay; maybe crashed with an EDITED retry
    if (rnd.nextBoolean()) {
      val w = freshWrites(1)
      if (rnd.nextBoolean())
        threads += Vector(Atom("dl", () => batchAtom(m, -2L, "replay", w, 0)))
      else {
        val w2 = freshWrites(1) // the operator edited the quarantine
        threads += Vector(
          Atom("dlCrash", () => batchAtom(m, -2L, "replay", w, 2)),
          Atom("dlRetry", () => batchAtom(m, -2L, "replay", w2, 0)))
      }
    }
    // a rebuild — complete or crashed after its commit
    locally {
      val snap = freshWrites(3)
      val r = new RebuildAtoms(m, -100000L - seed, snap)
      threads +=
        (if (rnd.nextBoolean())
          Vector(Atom("rCommit", () => r.commit()),
            Atom("rScan", () => r.scan()),
            Atom("rClear", () => r.clearCheck()))
        else Vector(Atom("rCrash", () => r.commit())))
    }
    // maybe a mid-schedule heal
    if (rnd.nextBoolean())
      threads += Vector(Atom("heal", () => healAtom(m)))
    // pad to the 8-atom floor with more complete batches (the verdict's
    // 8-12 band; the cap lands naturally at ~13)
    while (threads.map(_.size).sum < 8) {
      val id = freshId()
      val w = freshWrites(1)
      threads += Vector(Atom(s"b$id", () => batchAtom(m, id, "L1", w, 0)))
    }

    // random fair merge preserving per-thread order
    val queues = threads.map(t => scala.collection.mutable.Queue(t: _*))
    val out = Vector.newBuilder[Atom]
    while (queues.exists(_.nonEmpty)) {
      val live = queues.filter(_.nonEmpty)
      out += live(rnd.nextInt(live.size)).dequeue()
    }
    out.result()
  }

  test(s"$Seeds random legal schedules of 8-12 atoms preserve the " +
    "marker/manifest invariant between every atom pair and converge to a " +
    "clean, exact state under the quiesced heal (failing seed printed)") {
    var totalAtoms = 0
    (1 to Seeds).foreach { seed =>
      val m = new Model(s"$base/s$seed/t", s"$base/s$seed/t.zonemap")
      val sched = compose(seed, m)
      totalAtoms += sched.size
      val script = sched.map(_.name).mkString(",")
      try {
        sched.zipWithIndex.foreach { case (a, i) =>
          a.run()
          checkInvariants(m, s"after atom $i=${a.name}")
        }
        // convergence: whatever the schedule left (orphans, sidecars,
        // torn interleavings), one quiesced heal restores a clean exact
        // state — the production close (streak heal / next refresh)
        if (StateCommit.markerExists(spark, m.zm)) healAtom(m)
        assert(!StateCommit.markerExists(spark, m.zm), "marker must clear")
        assert(!StateCommit.hasForeignWrite(spark, m.zm),
          "the heal must clear the sidecar")
        checkInvariants(m, "final")
      } catch {
        case e: Throwable =>
          fail(s"FUZZ seed=$seed schedule=[$script]: ${e.getMessage}", e)
      }
    }
    info(s"$Seeds schedules, $totalAtoms atoms, all invariants held")
    // the ACTUAL floor (review r11): compose() pads every schedule to at
    // least 8 atoms, so the old 2/3-slack bound could never fire
    assert(totalAtoms >= 8 * Seeds, "schedules must be non-trivial")
  }
}
