package graft

import graft.cdc.{ParquetCdcSource, Pipeline}
import graft.cli.Main
import graft.tools.FeedGen
import org.apache.spark.sql.functions._

/** End-to-end over the generated demo feed: FeedGen -> the CLI's config
  * parser -> ParquetCdcSource -> Pipeline (backfill + stream drain) ->
  * sink state matches the event plan's derived expectations. */
class FeedGenSpec extends SparkSpec {

  test("generated demo feed drains through the pipeline to the expected state") {
    val root = tmpDir("feedgen")
    val lay = FeedGen.generate(spark, root)

    // config flows through the same parser the CLI uses
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(lay.propsPath)
    try props.load(in) finally in.close()
    val cfg = Main.parseConfig(props)
    val sync = cfg.syncFor("users").get
    assert(sync.full && sync.pk === "id")

    val src = new ParquetCdcSource(spark, lay.feedDir, lay.tableDir,
      maxFilesPerTrigger = 1)
    val pipe = new Pipeline(spark, cfg, src, lay.sinkRoot)
    pipe.backfillIfNeeded()
    val q = pipe.start(lay.ckptDir, monotonic = true)
    q.processAllAvailable(); q.stop()

    val state = pipe.sinkState(sync)
    val (expectedCount, created, deleted) = FeedGen.expected()
    assert(state.count() === expectedCount)
    val ids = state.select("id").collect().map(_.getInt(0)).toSet
    assert(created.subsetOf(ids))             // every create materialized
    assert(deleted.intersect(ids).isEmpty)    // every deleted id gone
    // a partially-updated row keeps its non-updated columns from backfill
    val touched = state.filter(col("name").startsWith("renamed_")).collect()
    assert(touched.nonEmpty)
    touched.foreach(r => assert(!r.isNullAt(r.fieldIndex("score"))))
    // timestamps were P2-coerced to epoch longs in the sink
    assert(state.schema("updated").dataType ===
      org.apache.spark.sql.types.LongType)
  }
}
