package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_overlap_count == size(array_intersect) on sorted distinct arrays") {
    TextFunctions.register(spark)
    // real shingle-hash sets from the fixture: distinct by construction,
    // sorted here as the Dedup verification path does
    val sets = ops.Tables(spark, sf, "documents")
      .select(col("doc_id"), array_sort(expr("graft_shingle_hashes(text, 3)")).as("hs"))
    val a = sets.select(col("doc_id").as("ia"), col("hs").as("ha"))
    val b = sets.select(col("doc_id").as("ib"), col("hs").as("hb"))
    val rows = a.join(b, col("ia") < col("ib"))
      .limit(2000)
      .select(
        expr("graft_overlap_count(ha, hb)").as("merge"),
        size(array_intersect(col("ha"), col("hb"))).as("hashset"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("graft_overlap_count participates in whole-stage codegen") {
    TextFunctions.register(spark)
    val df = ops.Tables(spark, sf, "documents")
      .select(array_sort(expr("graft_shingle_hashes(text, 3)")).as("hs"))
      .select(expr("graft_overlap_count(hs, hs)").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_overlap_count""".r.findFirstIn(plan).isDefined, plan)
  }

  test("graft_overlap_count edges: empty, disjoint, identical, null") {
    TextFunctions.register(spark)
    val rows = Seq(
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))),
      (Some(Seq(1L, 3L, 5L)), Some(Seq(2L, 4L, 6L))),
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 2L, 3L))),
      (Option.empty[Seq[Long]], Some(Seq(1L))))
      .toDF("a", "b")
      .select(expr("graft_overlap_count(a, b)").as("c"))
      .collect()
    assert(rows(0).getInt(0) === 0)
    assert(rows(1).getInt(0) === 0)
    assert(rows(2).getInt(0) === 3)
    assert(rows(3).isNullAt(0))
  }

  test("graft_overlap_count rejects non-long arrays") {
    TextFunctions.register(spark)
    val err = intercept[Exception] {
      Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
        .select(expr("graft_overlap_count(a, b)")).collect()
    }
    assert(err.getMessage.contains("array<bigint>"))
  }

  test("graft_word_blocks matches the transform/slice HOF it replaces") {
    TextFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1 to 40).map(i => s"w$i").mkString(" "), // 2 full blocks + tail
      (1 to 16).map(i => s"w$i").mkString(" "), // exactly one block
      "short tail only",                        // sub-block doc
      "solo",                                   // single token
      ""                                        // empty string -> [""]
    ).toDF("text")
    val got = df.select(expr("graft_word_blocks(text, 16)").as("b"))
      .collect().map(_.getSeq[String](0))
    val ref = df.select(expr(
      """transform(sequence(0, cast(ceil(size(split(text, ' ')) / 16.0) as int) - 1),
        |  i -> array_join(slice(split(text, ' '), i * 16 + 1, 16), ' '))"""
        .stripMargin).as("b")).collect().map(_.getSeq[String](0))
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
    // blocks partition the tokens: rejoining reproduces the text
    got.zip(Seq(
      (1 to 40).map(i => s"w$i").mkString(" "),
      (1 to 16).map(i => s"w$i").mkString(" "),
      "short tail only", "solo", ""))
      .foreach { case (g, t) => assert(g.mkString(" ") === t) }
  }

  test("md5-prefix hashes match the oracle engine's hex-cast formula") {
    TextFunctions.register(spark)
    import spark.implicits._
    // DuckDB: CAST('0x' || substr(md5('abc'), 1, 15) AS BIGINT) — md5('abc')
    // = 900150983cd24fb0..., top 60 bits = 0x0900150983cd24fb
    val expected = java.lang.Long.parseLong("900150983cd24fb", 16)
    assert(expected === 648541476951500027L) // pinned against a live DuckDB run
    val one = Seq("abc").toDF("text")
      .select(expr("graft_chargram_md5_hashes(text, 3)").as("hs"))
      .collect().head.getSeq[Long](0)
    assert(one === Seq(expected))
    // the shingle variant hashes whole distinct word n-grams the same way
    val sh = Seq("abc abc abc abc").toDF("text")
      .select(expr("graft_shingle_md5_hashes(text, 3)").as("hs"))
      .collect().head.getSeq[Long](0)
    val gram = "abc abc abc".getBytes("UTF-8")
    val dig = java.security.MessageDigest.getInstance("MD5").digest(gram)
    val hex = dig.take(8).map(b => f"${b & 0xff}%02x").mkString
    assert(sh === Seq(java.lang.Long.parseLong(hex.take(15), 16)))
    assert(sh.forall(_ >= 0L)) // 60-bit domain is non-negative by design
    // agreement with Spark's own md5() on the same bytes (hex prefix route)
    val viaSql = Seq("abc").toDF("t")
      .select(expr("conv(substr(md5(cast(t as binary)), 1, 15), 16, 10)"))
      .collect().head.getString(0)
    assert(viaSql.toLong === expected)
  }
}
