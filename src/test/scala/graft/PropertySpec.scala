package graft

import graft.cdc.{Transforms, UpsertSink}
import graft.model.ChangeEvent
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): the invariants the CDC semantics promise,
  * checked over generated event logs rather than hand-picked cases.
  * (Plain scalacheck generators driven deterministically — the
  * scalatest/scalacheck bridge artifact isn't on the offline classpath.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(op: String, pk: Int, v: Int, offset: Long) {
    def toEvent: ChangeEvent =
      ChangeEvent(op, "t", offset, null, s"""{"id": $pk, "v": $v}""")
  }

  private val genLog: Gen[List[Ev]] = Gen.listOfN(30, for {
    op <- Gen.oneOf("create", "update", "delete")
    pk <- Gen.choose(0, 5)
    v <- Gen.choose(0, 1000)
  } yield Ev(op, pk, v, 0L))
    .map(_.zipWithIndex.map { case (e, i) => e.copy(offset = i.toLong) })

  private def samples(n: Int): Seq[List[Ev]] =
    (0 until n).map(i => genLog.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  /** Reference semantics, computed directly: final non-delete event per pk. */
  private def expectedState(log: Seq[Ev]): Seq[(Int, Int)] =
    log.groupBy(_.pk).view.mapValues(_.maxBy(_.offset)).toMap
      .collect { case (pk, e) if e.op != "delete" => (pk, e.v) }
      .toSeq.sorted

  private def compact(b: Seq[Ev]) = {
    val df = b.map(_.toEvent).toDF()
      .withColumn("id", get_json_object(col("data"), "$.id").cast("int"))
      .withColumn("v", get_json_object(col("data"), "$.v").cast("int"))
    Transforms.lastWriteWins(df, col("id")).select(col("op"), col("id"), col("v"))
  }

  private def emptyState = Seq.empty[(Int, Int)].toDF("id", "v")

  test("applying a CDC log equals keeping each pk's final non-delete event") {
    samples(8).foreach { log =>
      val got = UpsertSink.applyBatch(emptyState, compact(log), "id")
        .as[(Int, Int)].collect().toSeq.sorted
      assert(got === expectedState(log), s"log=$log")
    }
  }

  test("batch apply is idempotent: replaying the same batch changes nothing") {
    samples(8).foreach { log =>
      val once = UpsertSink.applyBatch(emptyState, compact(log), "id")
      val twice = UpsertSink.applyBatch(once, compact(log), "id")
      assert(once.as[(Int, Int)].collect().sorted.toSeq ===
        twice.as[(Int, Int)].collect().sorted.toSeq, s"log=$log")
    }
  }

  test("projection/rename round-trip: renaming out and back is identity") {
    import graft.model.{FieldMapping, SyncConfig}
    val base = Seq((1, "a", 2.0), (2, "b", 3.5)).toDF("id", "name", "score")
    val out = Transforms.projectAndCoerce(base, SyncConfig("t", pk = "id",
      fields = Seq(FieldMapping("id", Some("pk")), FieldMapping("name", Some("label")),
        FieldMapping("score"))))
    val back = Transforms.projectAndCoerce(out, SyncConfig("t", pk = "pk",
      fields = Seq(FieldMapping("pk", Some("id")), FieldMapping("label", Some("name")),
        FieldMapping("score"))))
    assert(back.columns.toSeq === base.columns.toSeq)
    assert(back.collect().toSeq === base.collect().toSeq)
  }

  test("salted two-stage compaction equals single-stage last-write-wins") {
    samples(8).foreach { log =>
      val df = log.map(_.toEvent).toDF()
        .withColumn("id", get_json_object(col("data"), "$.id").cast("int"))
      val plain = Transforms.lastWriteWins(df, col("id"))
        .select("op", "id", "offset").as[(String, Int, Long)].collect().sorted.toSeq
      val salted = Transforms.saltedLastWriteWins(df, col("id"), salt = 4)
        .select("op", "id", "offset").as[(String, Int, Long)].collect().sorted.toSeq
      assert(salted === plain, s"log=$log")
    }
  }

  test("splitting a log into batches gives the same state as one batch") {
    samples(8).zipWithIndex.foreach { case (log, i) =>
      val cut = 1 + (i * 7) % 28
      val (b1, b2) = log.splitAt(cut)
      val split = UpsertSink.applyBatch(
        UpsertSink.applyBatch(emptyState, compact(b1), "id"), compact(b2), "id")
      val got = split.as[(Int, Int)].collect().toSeq.sorted
      assert(got === expectedState(log), s"cut=$cut log=$log")
    }
  }
}
