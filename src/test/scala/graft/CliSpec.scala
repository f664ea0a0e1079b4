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
}
