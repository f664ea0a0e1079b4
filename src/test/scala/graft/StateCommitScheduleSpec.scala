package graft

import graft.cdc._
import org.apache.spark.sql.functions._

/** Deterministic EXHAUSTIVE-schedule verification of the [[StateCommit]]
  * protocol (r9 verdict #2: the existing swap/marker stress specs are
  * probabilistic; this one enumerates the schedule space outright).
  *
  * The atoms are exactly the units the production code executes
  * indivisibly (each batch/commit step runs under `stateLock`; the
  * rebuild's scan is the one lock-free step, which is why it gets its own
  * atom and the clear re-checks the stamp). Between every pair of atoms we
  * assert the protocol's normative invariants:
  *
  *  1. ''reads are always exact'': `prunedRead` returns the same rows as
  *     the exact unpruned filter, marked or not;
  *  2. ''marker ABSENT ⇒ manifest accurate'': whenever no pending marker
  *     is up, the manifest equals a full recompute of the live state.
  *
  * Families: (A) a full rebuild interleaved every possible way with two
  * complete batches — 10 schedules (C(5,2) merges of [commit, scan,
  * clear-check] with [b1, b2]); (B) a rebuild that CRASHES after its
  * commit (the orphaned-marker state) interleaved with three batches — 4
  * schedules, then the quiesced heal; (C) batches crashing at each
  * sub-atom boundary, replayed at-least-once, with and without an
  * interleaved rebuild — 4 scripted scenarios. Every schedule runs against
  * real files with the real StateCommit/Maintenance calls. */
class StateCommitScheduleSpec extends SparkSpec {
  import spark.implicits._

  private val B = BucketedUpsertSink.BucketCol
  private val Cols = Seq("score")
  private val AllBuckets: Seq[Long] = 0L to 3L

  private case class Fx(statePath: String, zm: String)

  private def mkFixture(tag: String): Fx = {
    val statePath = tmpDir(s"sched-$tag") + "/t"
    val zm = statePath + ".zonemap"
    (0 until 8).map(i => (i, i * 10L, (i % 4).toLong))
      .toDF("id", "score", B)
      .write.partitionBy(B).parquet(statePath)
    graft.ops.Maintenance.refreshZoneMap(spark, statePath, zm, AllBuckets, Cols)
    Fx(statePath, zm)
  }

  /** Invariants 1 and 2, asserted between every pair of atoms. */
  private def checkInvariants(f: Fx, ctx: String): Unit = {
    for ((lo, hi) <- Seq((0L, 40L), (5000L, 6000L))) {
      val pruned = graft.ops.Maintenance
        .prunedRead(spark, f.statePath, f.zm, "score", lo, hi)
        .select("id").collect().map(_.getInt(0)).sorted.toSeq
      val exact = spark.read.parquet(f.statePath)
        .filter(col("score") >= lo && col("score") <= hi)
        .select("id").collect().map(_.getInt(0)).sorted.toSeq
      assert(pruned === exact,
        s"$ctx: pruned read diverged from exact on [$lo,$hi]")
    }
    if (!StateCommit.markerExists(spark, f.zm)) {
      val manifest = spark.read.parquet(f.zm).orderBy("bucket")
        .collect().map(_.toSeq).toSeq
      val full = graft.ops.Maintenance
        .bucketZoneMap(spark, f.statePath, Cols)
        .collect().map(_.toSeq).toSeq
      assert(manifest === full, s"$ctx: marker absent but manifest stale")
    }
  }

  // ----- batch atoms (the applySync/writeCompacted sequence) -----

  /** One COMPLETE batch: claim -> (foreign ? mark sidecar) -> write ->
    * (fast path ? splice + release) -> stamp — indivisible in production
    * (stateLock). The fast path is licensed by a FRESH claim or a RE-OWNED
    * one with the foreign-write sidecar absent: a re-owned orphan whose
    * window saw a foreign write keeps the marker for the quiesced heal
    * (the writeCompacted rule — review r10). */
  private def batch(f: Fx, i: Int, lineage: String = ""): Unit =
    StateCommit.stateLock(f.statePath).synchronized {
      val claim = StateCommit.claimMarkerDetailed(spark, f.zm, i.toLong, lineage)
      val fastPath = claim == StateCommit.FreshClaim ||
        (claim == StateCommit.ReOwnedClaim && i >= 0 &&
          !StateCommit.hasForeignWrite(spark, f.zm))
      // EVERY non-owning write leaves sidecar evidence write-ahead —
      // foreign claimers AND deferring re-owners (the writeCompacted rule)
      if (!fastPath) StateCommit.markForeignWrite(spark, f.zm)
      try {
        val b = (i % 4).toLong
        batchWrite(f, i)
        if (fastPath) {
          graft.ops.Maintenance.refreshZoneMap(spark, f.statePath, f.zm, Seq(b), Cols)
          StateCommit.releaseMarker(spark, f.zm, i.toLong)
        }
      } finally { StateCommit.mutationStamp(f.statePath).incrementAndGet(); () }
    }

  private def batchWrite(f: Fx, i: Int): Unit =
    Seq((100 + i, 5000L + i, (i % 4).toLong)).toDF("id", "score", B)
      .write.mode("append").partitionBy(B).parquet(f.statePath)

  // ----- rebuild atoms (the refresh commit + quiesced clear) -----

  private final class Rebuild(f: Fx, ownerId: Long) {
    private var s1 = -1L
    var cleared = false

    /** Atom 1 — the locked commit: force-own, swap a snapshot live, stamp. */
    def commit(): Unit = StateCommit.stateLock(f.statePath).synchronized {
      StateCommit.forceMarker(spark, f.zm, ownerId)
      try {
        val snap = (0 until 8).map(i => (i, i * 10L + 1L, (i % 4).toLong))
          .toDF("id", "score", B)
        StateCommit.stageSwap(spark, f.statePath)(tmp =>
          snap.write.partitionBy(B).parquet(tmp))
      } finally { StateCommit.mutationStamp(f.statePath).incrementAndGet(); () }
    }

    private var pending: Option[org.apache.spark.sql.DataFrame] = None

    /** Atom 2 — the LOCK-FREE full manifest COMPUTE (stamp snapshot
      * first); nothing publishes yet — a stale compute must be discardable
      * (review r10: publishing before the quiesce check let a slower
      * stale scan land after a faster rebuild's clear). */
    def scan(): Unit = {
      s1 = StateCommit.mutationStamp(f.statePath).get()
      pending = Some(graft.ops.Maintenance.computeFullZoneMap(
        spark, f.statePath, Cols))
    }

    /** Atom 3 — the locked quiesce check: publish + clear iff no mutation
      * landed since the compute's stamp snapshot. */
    def clearCheck(): Unit =
      cleared = StateCommit.stateLock(f.statePath).synchronized {
        if (StateCommit.mutationStamp(f.statePath).get() == s1) {
          graft.ops.Maintenance.publishZoneMap(spark, f.zm, pending.get)
          StateCommit.clearMarker(spark, f.zm); true
        } else false
      }

    /** Completion — the REAL production loop: re-compute until quiesced
      * (in a sequential schedule the first re-compute quiesces; schedules
      * where a batch landed between scan and clearCheck exercise exactly
      * the retry this models). */
    def finish(): Unit =
      if (!cleared || StateCommit.markerExists(spark, f.zm))
        healQuiesced(f)
  }

  /** The real quiesced heal, shared by every family's completion. */
  private def healQuiesced(f: Fx): Unit =
    StateCommit.quiescedClear(spark, f.statePath, f.zm)(() =>
      graft.ops.Maintenance.computeFullZoneMap(spark, f.statePath, Cols))(
      m => graft.ops.Maintenance.publishZoneMap(spark, f.zm, m))

  private def interleavings[A](xs: List[A], ys: List[A]): List[List[A]] =
    (xs, ys) match {
      case (Nil, _) => List(ys)
      case (_, Nil) => List(xs)
      case (x :: xt, _ :: _) =>
        interleavings(xt, ys).map(x :: _) ++
          interleavings(xs, ys.tail).map(ys.head :: _)
    }

  test("family A: a full rebuild interleaved EVERY possible way with two " +
    "complete batches — all 10 schedules preserve exact reads and the " +
    "marker/manifest invariant at every step") {
    var ownerSeq = -2000L
    val rSteps = List("commit", "scan", "clearCheck")
    val bSteps = List("b1", "b2")
    val schedules = interleavings(rSteps, bSteps)
    assert(schedules.size === 10)
    schedules.zipWithIndex.foreach { case (sched, si) =>
      val f = mkFixture(s"a$si")
      ownerSeq -= 1
      val r = new Rebuild(f, ownerSeq)
      sched.zipWithIndex.foreach { case (step, ai) =>
        step match {
          case "commit"     => r.commit()
          case "scan"       => r.scan()
          case "clearCheck" => r.clearCheck()
          case "b1"         => batch(f, 1)
          case "b2"         => batch(f, 2)
        }
        checkInvariants(f, s"schedule $si (${sched.mkString(",")}) after atom $ai=$step")
      }
      r.finish()
      assert(!StateCommit.markerExists(spark, f.zm),
        s"schedule $si: completed rebuild must leave no marker")
      checkInvariants(f, s"schedule $si final")
    }
  }

  test("family B: a rebuild CRASHING after its commit (orphaned negative " +
    "marker) interleaved with three batches — reads stay exact, batches " +
    "skip but never clear, and the quiesced heal restores pruning") {
    var ownerSeq = -3000L
    val schedules = interleavings(List("crashCommit"), List("b1", "b2", "b3"))
    assert(schedules.size === 4)
    schedules.zipWithIndex.foreach { case (sched, si) =>
      val f = mkFixture(s"b$si")
      ownerSeq -= 1
      val r = new Rebuild(f, ownerSeq)
      sched.zipWithIndex.foreach { case (step, ai) =>
        step match {
          case "crashCommit" => r.commit() // then: crash — scan/clear never run
          case "b1"          => batch(f, 1)
          case "b2"          => batch(f, 2)
          case "b3"          => batch(f, 3)
        }
        checkInvariants(f, s"B schedule $si after atom $ai=$step")
      }
      assert(StateCommit.markerExists(spark, f.zm),
        s"B schedule $si: the orphan must survive every batch (no foreign clear)")
      // the heal (what the orphan-streak escalation and the next refresh run)
      healQuiesced(f)
      assert(!StateCommit.markerExists(spark, f.zm))
      checkInvariants(f, s"B schedule $si healed")
    }
  }

  test("family C: batches crashing at each sub-atom boundary, replayed " +
    "at-least-once, with and without an interleaved rebuild — the marker " +
    "discipline heals every ordering") {
    // c1: crash after claim, NO foreign write in the orphan window — the
    // replay re-owns, finds the foreign-write sidecar absent, and heals
    // instantly on the fast path (review r10: unconditional pessimism
    // would cost every transient crash a full-scan heal)
    locally {
      val f = mkFixture("c1")
      StateCommit.stateLock(f.statePath).synchronized {
        assert(StateCommit.claimMarker(spark, f.zm, 7L)) // then: crash
        StateCommit.mutationStamp(f.statePath).incrementAndGet()
      }
      checkInvariants(f, "c1 post-crash (marker up, no write)")
      batch(f, 7) // the checkpoint replay
      assert(!StateCommit.markerExists(spark, f.zm),
        "c1: sidecar absent -> the replay re-owns, splices, and releases")
      checkInvariants(f, "c1 final")
    }
    // c2: crash after claim + sink write (no splice, no clear); replay
    // heals instantly for the same reason
    locally {
      val f = mkFixture("c2")
      StateCommit.stateLock(f.statePath).synchronized {
        assert(StateCommit.claimMarker(spark, f.zm, 8L))
        batchWrite(f, 8) // then: crash before splice/clear
        StateCommit.mutationStamp(f.statePath).incrementAndGet()
      }
      checkInvariants(f, "c2 post-crash (marker up, write landed)")
      batch(f, 8)
      assert(!StateCommit.markerExists(spark, f.zm),
        "c2: sidecar absent -> instant heal")
      checkInvariants(f, "c2 final")
    }
    // c3: crash after claim; a rebuild force-steals and completes BEFORE
    // the replay — the replay then claims fresh (marker absent) and splices
    locally {
      val f = mkFixture("c3")
      StateCommit.stateLock(f.statePath).synchronized {
        assert(StateCommit.claimMarker(spark, f.zm, 9L))
        StateCommit.mutationStamp(f.statePath).incrementAndGet()
      }
      val r = new Rebuild(f, -4001L)
      r.commit(); checkInvariants(f, "c3 after steal")
      r.scan(); r.clearCheck(); r.finish()
      assert(!StateCommit.markerExists(spark, f.zm))
      checkInvariants(f, "c3 after rebuild")
      batch(f, 9)
      checkInvariants(f, "c3 final")
    }
    // c5: a dead-letter replay (constant id -2) crashes post-write; a
    // RETRY with an operator-EDITED (different-bucket) write set re-owns —
    // it must NOT fast-path (no checkpoint determinism contract), or the
    // predecessor's bucket would go unspliced under no marker (review r10)
    locally {
      val f = mkFixture("c5")
      StateCommit.stateLock(f.statePath).synchronized {
        assert(StateCommit.claimMarkerDetailed(spark, f.zm, -2L) ===
          StateCommit.FreshClaim)
        batchWrite(f, 20) // bucket 0; then: crash before splice
        StateCommit.mutationStamp(f.statePath).incrementAndGet()
      }
      checkInvariants(f, "c5 post-crash")
      // the retry: same id, different bucket (quarantine edited) — runs
      // through the shared atom, which defers (id < 0) and marks the
      // sidecar write-ahead like production
      batch(f, -2)
      assert(StateCommit.markerExists(spark, f.zm),
        "c5: a re-owned replay marker must be kept for the quiesced heal")
      assert(StateCommit.hasForeignWrite(spark, f.zm),
        "c5: the deferring re-owner must leave sidecar evidence — the " +
          "marker alone is launderable (r10 review)")
      checkInvariants(f, "c5 post-retry")
      healQuiesced(f)
      assert(!StateCommit.markerExists(spark, f.zm))
      checkInvariants(f, "c5 final")
    }
    // c6: releaseMarker REFUSES while the foreign-write sidecar stands (a
    // premise-violation defense: a usurped-lease writer's evidence must
    // survive the stalled owner's release)
    locally {
      val f = mkFixture("c6")
      assert(StateCommit.claimMarkerDetailed(spark, f.zm, 99L) ===
        StateCommit.FreshClaim)
      StateCommit.markForeignWrite(spark, f.zm)
      StateCommit.releaseMarker(spark, f.zm, 99L)
      assert(StateCommit.markerExists(spark, f.zm),
        "c6: release over a standing sidecar must refuse")
      healQuiesced(f)
      assert(!StateCommit.markerExists(spark, f.zm) &&
        !StateCommit.hasForeignWrite(spark, f.zm))
      checkInvariants(f, "c6 final")
    }
    // c4: crash after claim + write; a rebuild commits (steal) but has NOT
    // cleared when the replay arrives — the replay's claim fails (foreign)
    // so it skips manifest work; the rebuild's quiesced clear then heals
    // over a scan that includes both writes
    locally {
      val f = mkFixture("c4")
      StateCommit.stateLock(f.statePath).synchronized {
        assert(StateCommit.claimMarker(spark, f.zm, 10L))
        batchWrite(f, 10)
        StateCommit.mutationStamp(f.statePath).incrementAndGet()
      }
      val r = new Rebuild(f, -4002L)
      r.commit(); checkInvariants(f, "c4 after steal")
      batch(f, 10) // replay: claim fails, write + stamp only
      assert(StateCommit.markerExists(spark, f.zm),
        "c4: the replay must not clear the rebuild's marker")
      checkInvariants(f, "c4 after replay")
      r.scan(); r.clearCheck(); r.finish()
      assert(!StateCommit.markerExists(spark, f.zm))
      checkInvariants(f, "c4 final")
    }
  }

  test("family D: a FOREIGN write lands under a batch's orphaned marker, " +
    "then the owner's replay completes — the re-own rule keeps the marker " +
    "over the foreign buckets' stale stats, and the quiesced heal closes " +
    "it (the review-r10 silent-row-loss hole, pinned)") {
    val f = mkFixture("d0")
    // batch 50 claims + writes bucket 2, then CRASHES before its splice
    StateCommit.stateLock(f.statePath).synchronized {
      assert(StateCommit.claimMarkerDetailed(spark, f.zm, 50L) ===
        StateCommit.FreshClaim)
      batchWrite(f, 50) // bucket 50 % 4 = 2
      StateCommit.mutationStamp(f.statePath).incrementAndGet()
    }
    checkInvariants(f, "D post-crash")
    // a foreign writer (a dead-letter replay in production) writes a
    // DIFFERENT bucket under the orphan: its claim fails against the
    // stored owner 50, so sink write only, splice skipped
    batch(f, 1) // bucket 1; claim(1) vs stored 50 = foreign
    checkInvariants(f, "D post-foreign-write")
    assert(StateCommit.markerExists(spark, f.zm))
    assert(StateCommit.hasForeignWrite(spark, f.zm),
      "D: the foreign writer must have marked the sidecar write-ahead")
    // the owner's checkpoint replay completes: RE-OWNS, writes, KEEPS —
    // with the pre-r10 release rule this cleared the marker while bucket
    // 1's stats were stale, and the "marker absent => manifest accurate"
    // invariant (hence pruned-read exactness) broke
    batch(f, 50)
    assert(StateCommit.markerExists(spark, f.zm),
      "D: the re-owner must keep the marker — bucket 1's stats are stale " +
        "under it and only a full scan may clear")
    checkInvariants(f, "D post-replay")
    healQuiesced(f)
    assert(!StateCommit.markerExists(spark, f.zm))
    assert(!StateCommit.hasForeignWrite(spark, f.zm),
      "D: the heal clears the sidecar with the marker")
    checkInvariants(f, "D healed")
  }

  test("family E: a checkpoint RESET reuses batch ids against an old " +
    "lineage's orphan — the lineage-scoped claim reads it FOREIGN, the " +
    "reset replay's different write set never splice-and-releases over the " +
    "orphan's unspliced bucket, and the quiesced heal closes it; a " +
    "SAME-lineage replay still fast-paths (ADVICE r10)") {
    val f = mkFixture("e0")
    // lineage L1's batch 0 claims + writes bucket 0, then CRASHES before
    // its splice — the marker records (0, L1)
    StateCommit.stateLock(f.statePath).synchronized {
      assert(StateCommit.claimMarkerDetailed(spark, f.zm, 0L, "L1") ===
        StateCommit.FreshClaim)
      batchWrite(f, 0) // bucket 0
      StateCommit.mutationStamp(f.statePath).incrementAndGet()
    }
    checkInvariants(f, "E post-crash")
    // the operator DISCARDS the checkpoint: a new lineage L2 replays batch
    // id 0 carrying a DIFFERENT write set (bucket 1). Pre-fix, the id-only
    // claim read ReOwned with the sidecar absent, spliced only bucket 1,
    // and RELEASED — leaving bucket 0's stats stale under no marker (the
    // silent wrong-pruned-reads case). The lineage-scoped claim reads it
    // FOREIGN instead.
    StateCommit.stateLock(f.statePath).synchronized {
      val claim = StateCommit.claimMarkerDetailed(spark, f.zm, 0L, "L2")
      assert(claim === StateCommit.ForeignClaim,
        "E: a same-id claim from a different lineage must read FOREIGN")
      StateCommit.markForeignWrite(spark, f.zm) // the production write-ahead
      try Seq((200, 5200L, 1L)).toDF("id", "score", B)
        .write.mode("append").partitionBy(B).parquet(f.statePath)
      finally { StateCommit.mutationStamp(f.statePath).incrementAndGet(); () }
    }
    assert(StateCommit.markerExists(spark, f.zm),
      "E: the old lineage's orphan must survive the reset replay")
    assert(StateCommit.hasForeignWrite(spark, f.zm))
    checkInvariants(f, "E post-reset-replay")
    healQuiesced(f)
    assert(!StateCommit.markerExists(spark, f.zm) &&
      !StateCommit.hasForeignWrite(spark, f.zm))
    checkInvariants(f, "E healed")
    // the common transient crash within ONE lineage still heals instantly:
    // same id AND same lineage re-owns, sidecar absent -> fast path
    locally {
      val g = mkFixture("e1")
      StateCommit.stateLock(g.statePath).synchronized {
        assert(StateCommit.claimMarkerDetailed(spark, g.zm, 3L, "L1") ===
          StateCommit.FreshClaim)
        batchWrite(g, 3)
        StateCommit.mutationStamp(g.statePath).incrementAndGet()
      }
      checkInvariants(g, "E same-lineage post-crash")
      batch(g, 3, lineage = "L1") // the checkpoint replay, same lineage
      assert(!StateCommit.markerExists(spark, g.zm),
        "E: a same-lineage re-own with the sidecar absent keeps the " +
          "instant fast-path heal")
      checkInvariants(g, "E same-lineage final")
    }
  }
}
