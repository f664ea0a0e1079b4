package graft

import graft.cli.Main
import graft.model.FieldMapping

class CliSpec extends SparkSpec {
  test("properties config parses into SyncConfigs") {
    val p = new java.util.Properties()
    p.setProperty("sync.users.pk", "_id")
    p.setProperty("sync.users.full", "true")
    p.setProperty("sync.users.index", "users_idx")
    p.setProperty("sync.users.fields", "_id:id,age")
    p.setProperty("sync.users.schema", "_id STRING, age INT, time TIMESTAMP")
    p.setProperty("sync.orders.schema", "id INT")
    val cfg = Main.parseConfig(p)
    assert(cfg.tables === Seq("orders", "users"))
    val u = cfg.syncFor("users").get
    assert(u.pk === "_id" && u.full && u.indexName === "users_idx")
    assert(u.fields === Seq(FieldMapping("_id", Some("id")), FieldMapping("age")))
    assert(u.schema.get.fieldNames.toSeq === Seq("_id", "age", "time"))
    assert(cfg.syncFor("orders").get.pk === "id")
  }

  test("B2 flush knobs parse into PipelineConfig") {
    val p = new java.util.Properties()
    p.setProperty("sync.t.schema", "id INT")
    p.setProperty("insert.size", "1000")
    p.setProperty("insert.interval.seconds", "10")
    val cfg = Main.parseConfig(p)
    assert(cfg.insertSize === Some(1000))
    assert(cfg.insertIntervalSecs === Some(10))
    // absent => None (immediate micro-batches via configTrigger)
    val bare = Main.parseConfig {
      val q = new java.util.Properties(); q.setProperty("sync.t.schema", "id INT"); q
    }
    assert(bare.insertSize === None && bare.insertIntervalSecs === None)
  }

  test("zone-map column list parses (trimmed, blanks dropped) and defaults " +
    "empty") {
    val p = new java.util.Properties()
    p.setProperty("sync.t.schema", "id INT")
    p.setProperty("state.buckets", "8")
    p.setProperty("state.zonemap.cols", " score , ts ,, ")
    val cfg = Main.parseConfig(p)
    assert(cfg.stateBuckets === Some(8))
    assert(cfg.zoneMapCols === Seq("score", "ts"))
    val bare = Main.parseConfig {
      val q = new java.util.Properties(); q.setProperty("sync.t.schema", "id INT"); q
    }
    assert(bare.zoneMapCols === Seq.empty)
  }

  test("U1: plugins load by class name and their hooks run end-to-end") {
    import graft.cdc._
    import graft.model._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val hooks = PluginHooks.load(Seq("graft.UppercasePlugin"))
    val sinkRoot = tmpDir("sink")
    val sync = SyncConfig("t", pk = "id", schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))))
    val src = new MemoryCdcSource(spark)
    val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)), src, sinkRoot, hooks)
    src.addEvents(ChangeEvent("create", "t", 1,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), """{"id": 1, "name": "ann"}"""))
    val q = pipe.start(tmpDir("ckpt"))
    q.processAllAvailable(); q.stop()
    assert(pipe.sinkState(sync).collect().toSeq === Seq(Row(1, "ANN")))
    assert(UppercasePlugin.batches.get() >= 1)
  }

  test("U1: a table-scoped plugin leaves other syncs' views untouched") {
    val hooks = graft.cdc.PluginHooks.load(Seq("graft.UsersOnlyPlugin"))
    import spark.implicits._
    val view = Seq((1, 9.5)).toDF("id", "amount") // no 'name' column at all
    // applying the hook under table 'orders' must be the identity, not an
    // unresolved-column crash that would kill every sync in the query
    val out = hooks.preEvent.foldLeft(view)((df, h) => h("orders", df))
    assert(out.collect().toSeq === view.collect().toSeq)
  }

  test("U1: a non-global plugin is re-instantiated per invocation, a global one is not") {
    PerBatchPlugin.constructed.set(0)
    GlobalCountPlugin.constructed.set(0)
    val hooks = graft.cdc.PluginHooks.load(
      Seq("graft.PerBatchPlugin", "graft.GlobalCountPlugin"))
    val afterLoad = PerBatchPlugin.constructed.get()
    hooks.postBatch.foreach(_("t", 0L))
    hooks.postBatch.foreach(_("t", 1L))
    hooks.postBatch.foreach(_("t", 2L))
    // non-global: the load-time probe plus one fresh instance per postBatch
    assert(PerBatchPlugin.constructed.get() === afterLoad + 3)
    // global: only the load-time singleton, however many batches fire
    assert(GlobalCountPlugin.constructed.get() === 1)
  }

  test("U1: blank plugin entries are ignored, bad classes name themselves") {
    assert(graft.cdc.PluginHooks.load(Seq("", "  ")).preEvent.isEmpty)
    val err = intercept[IllegalArgumentException] {
      graft.cdc.PluginHooks.load(Seq("com.example.Nope"))
    }
    assert(err.getMessage.contains("com.example.Nope"))
  }
}

/** Scoped plugin: must leave other tables' views untouched. */
class UsersOnlyPlugin extends graft.cdc.GraftPlugin {
  override def tables: Set[String] = Set("users")
  override def preEvent(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("name", org.apache.spark.sql.functions.upper(
      org.apache.spark.sql.functions.col("name"))) // column only users has
}

/** Test fixture for the reflection plugin loader. */
class UppercasePlugin extends graft.cdc.GraftPlugin {
  override def preEvent(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("name", org.apache.spark.sql.functions.upper(
      org.apache.spark.sql.functions.col("name")))
  override def postBatch(table: String, batchId: Long): Unit = {
    UppercasePlugin.batches.incrementAndGet(); ()
  }
}
object UppercasePlugin {
  val batches = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Non-global fixture: counts constructions to prove per-batch mode. */
class PerBatchPlugin extends graft.cdc.GraftPlugin {
  PerBatchPlugin.constructed.incrementAndGet()
  override def isGlobal: Boolean = false
}
object PerBatchPlugin {
  val constructed = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Global fixture: the loader's probe must be the only construction. */
class GlobalCountPlugin extends graft.cdc.GraftPlugin {
  GlobalCountPlugin.constructed.incrementAndGet()
}
object GlobalCountPlugin {
  val constructed = new java.util.concurrent.atomic.AtomicInteger(0)
}
