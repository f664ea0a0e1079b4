package graft.cdc

import graft.SparkSpec
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Seeded differential fuzz of the four CDC wire decoders (r12 verdict #3
  * — mechanizing the lens that found the r11 TRUNCATE silent-drop by
  * hand): every seed generates a wire message TOGETHER with what a
  * reference-semantics model says it must do — decode to exactly these
  * envelope rows, drop as informational, or FAIL LOUD — then the real
  * [[EnvelopeDecoders]] runs and the outcomes are compared. Mutations
  * (truncations, type flips, stripped mandatory fields, unknown kinds,
  * duplicate keys, destructive collection ops) adjust the model, never
  * bypass it. The invariant under fuzz: NO wire message is ever silently
  * lost or truncated — it decodes to the model's rows, drops only where
  * the model says the entry is informational, or raises with the decoder's
  * named message.
  *
  * Payload values deliberately carry tabs, newlines, quotes, backslashes,
  * emoji, CJK, RTL marks and zero-width characters (the split-limit /
  * escaping loss class), nested objects and arrays, and JSON nulls.
  * Comparison is structural (Jackson JsonNode equality), so VARIANT
  * re-serialization key order cannot false-positive.
  *
  * Self-tests (the fuzzer must be able to FAIL): re-introducing the
  * reference's rows[0]-only binlog bug and its first-change-only wal2json
  * bug against the same model diverges — proof the model constrains
  * multi-row expansion, not just happy paths. */
class WireDecoderFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val SeedsPerFormat = 300

  // ------------------------------------------------------------------
  // value generators — every string pool entry is an escaping hazard
  // ------------------------------------------------------------------
  private val nasty = Vector(
    "plain", "with\ttab", "line\nbreak", "quote\"inside", "back\\slash",
    "emoji 😀", "中文文本", "rtl \u202Eoverride",
    "zero\u200Bwidth", "", " leading and trailing ", "comma,colon:brace}")

  private def genString(r: Random): String =
    nasty(r.nextInt(nasty.size)) + (if (r.nextBoolean()) r.nextInt(100) else "")

  private def genValue(r: Random, depth: Int = 0): JsonNode =
    r.nextInt(if (depth == 0) 7 else 5) match {
      case 0 => mapper.getNodeFactory.numberNode(r.nextInt(10000) - 5000)
      case 1 => mapper.getNodeFactory.numberNode(r.nextInt(1000) + 0.5)
      case 2 => mapper.getNodeFactory.booleanNode(r.nextBoolean())
      case 3 => mapper.getNodeFactory.nullNode()
      case 4 => mapper.getNodeFactory.textNode(genString(r))
      case 5 =>
        val o = mapper.createObjectNode()
        (0 until 1 + r.nextInt(2)).foreach(i =>
          o.set[JsonNode](s"n$i", genValue(r, depth + 1)))
        o
      case _ =>
        val a = mapper.createArrayNode()
        (0 until 1 + r.nextInt(3)).foreach(_ => a.add(genValue(r, depth + 1)))
        a
    }

  private def genCols(r: Random): Seq[(String, JsonNode)] = {
    val names = Seq("id", "v", "txt col", "ünicöde", "x1", "x2")
    r.shuffle(names).take(1 + r.nextInt(4)).map(n => n -> genValue(r))
  }

  private def objOf(fields: Seq[(String, JsonNode)]): ObjectNode = {
    val o = mapper.createObjectNode()
    fields.foreach { case (k, v) => o.set[JsonNode](k, v) }
    o
  }

  // ------------------------------------------------------------------
  // model
  // ------------------------------------------------------------------
  /** One expected envelope row; data None = SQL NULL payload. */
  private case class Exp(op: String, table: String, ridx: Int,
                         data: Option[JsonNode],
                         nextlsn: Option[String] = None)
  private sealed trait Outcome
  private case class Decodes(rows: Seq[Exp]) extends Outcome
  /** Must throw; empty substring accepts any raise (e.g. duplicate-key
    * map construction), nonempty must appear in the failure chain. */
  private case class Loud(substr: String) extends Outcome
  private case class Wire(line: String, out: Outcome, tag: String)

  private def parsedOrNull(s: String): Option[JsonNode] =
    Option(s).map(mapper.readTree)

  // ------------------------------------------------------------------
  // wal2json
  // ------------------------------------------------------------------
  private def genWal2json(r: Random): Wire = {
    val lsn = s"0/${r.nextInt(1 << 20).toHexString.toUpperCase}"
    val table = if (r.nextBoolean()) "orders" else genString(r).take(12) + "_t"
    // mostly substantive transactions; 1-in-8 a legit EMPTY one
    val nEntries = if (r.nextInt(8) == 0) 0 else 1 + r.nextInt(3)
    case class Entry(node: ObjectNode, exp: Option[Exp], loud: Option[String])
    val entries = (0 until nEntries).map { i =>
      val e = mapper.createObjectNode()
      e.put("schema", "public"); e.put("table", table)
      r.nextInt(8) match {
        case 0 | 1 | 2 | 3 => // insert / update
          val kind = if (r.nextBoolean()) "insert" else "update"
          e.put("kind", kind)
          val cols = genCols(r)
          val cn = mapper.createArrayNode(); val cv = mapper.createArrayNode()
          cols.foreach { case (n, v) => cn.add(n); cv.add(v) }
          e.set[JsonNode]("columnnames", cn); e.set[JsonNode]("columnvalues", cv)
          Entry(e, Some(Exp(if (kind == "insert") "create" else "update",
            table, i, Some(objOf(cols)), Some(lsn))), None)
        case 4 | 5 => // delete with oldkeys
          e.put("kind", "delete")
          val keys = genCols(r).take(1 + r.nextInt(2))
          val kn = mapper.createArrayNode(); val kv = mapper.createArrayNode()
          keys.foreach { case (n, v) => kn.add(n); kv.add(v) }
          val ok = mapper.createObjectNode()
          ok.set[JsonNode]("keynames", kn); ok.set[JsonNode]("keyvalues", kv)
          e.set[JsonNode]("oldkeys", ok)
          Entry(e, Some(Exp("delete", table, i, Some(objOf(keys)), Some(lsn))),
            None)
        case 6 => // informational kind: the ENTRY drops, ridx gap remains
          e.put("kind", if (r.nextBoolean()) "message" else "copy")
          Entry(e, None, None)
        case _ => // multi-col insert with a duplicated COLUMN name:
          // map_from_arrays under the EXCEPTION dedup policy must raise —
          // never silently keep one of the two values
          e.put("kind", "insert")
          val cn = mapper.createArrayNode(); val cv = mapper.createArrayNode()
          cn.add("dup"); cn.add("dup")
          cv.add(genValue(r)); cv.add(genValue(r))
          e.set[JsonNode]("columnnames", cn); e.set[JsonNode]("columnvalues", cv)
          Entry(e, None, Some(""))
      }
    }
    val msg = mapper.createObjectNode()
    // permuted top-level field order — must never matter
    if (r.nextBoolean()) {
      msg.put("nextlsn", lsn)
      msg.set[JsonNode]("change",
        mapper.createArrayNode().addAll(entries.map(_.node).asJavaCollection))
    } else {
      msg.set[JsonNode]("change",
        mapper.createArrayNode().addAll(entries.map(_.node).asJavaCollection))
      msg.put("nextlsn", lsn)
    }
    val base = Wire(msg.toString,
      entries.collectFirst { case Entry(_, _, Some(s)) => Loud(s) }
        .getOrElse(Decodes(entries.flatMap(_.exp))), "valid")
    // mutations
    r.nextInt(6) match {
      case 0 => base
      case 1 => base
      case 2 => truncated(r, base.line, "undecodable wal2json")
      case 3 => // type flip: change becomes a scalar -> change null -> loud
        val m2 = mapper.createObjectNode()
        m2.put("change", 42); m2.put("nextlsn", lsn)
        Wire(m2.toString, Loud("undecodable wal2json"), "typeflip")
      case 4 => // TRUNCATE anywhere in the transaction: loud, names refresh
        val t = mapper.createObjectNode()
        t.put("kind", "truncate"); t.put("schema", "public"); t.put("table", table)
        val withT = mapper.createObjectNode()
        val arr = mapper.createArrayNode()
        entries.map(_.node).foreach(arr.add)
        arr.add(t)
        withT.set[JsonNode]("change", arr); withT.put("nextlsn", lsn)
        // a base that already carries a dup-column entry may raise on the
        // map build before the TRUNCATE guard evaluates — either raise
        // satisfies the no-silent-loss invariant
        val expect = base.out match {
          case Loud(_) => Loud("")
          case _ => Loud("TRUNCATE")
        }
        Wire(withT.toString, expect, "truncate-kind")
      case _ => // delete WITHOUT oldkeys: loud, names REPLICA IDENTITY
        val d = mapper.createObjectNode()
        d.put("kind", "delete"); d.put("schema", "public"); d.put("table", table)
        val m2 = mapper.createObjectNode()
        m2.set[JsonNode]("change", mapper.createArrayNode().add(d))
        m2.put("nextlsn", lsn)
        Wire(m2.toString, Loud("REPLICA IDENTITY"), "keyless-delete")
    }
  }

  /** Truncate strictly inside the line at a point Jackson agrees is
    * malformed (falling back to cutting the final char, which always is). */
  private def truncated(r: Random, line: String, substr: String): Wire = {
    val cut = (1 until line.length).iterator
      .map(_ => 1 + r.nextInt(line.length - 1))
      .find(c => scala.util.Try(mapper.readTree(line.take(c))).isFailure)
      .getOrElse(line.length - 1)
    Wire(line.take(cut), Loud(substr), "truncated")
  }

  // ------------------------------------------------------------------
  // mysql binlog
  // ------------------------------------------------------------------
  private def genBinlog(r: Random): Wire = {
    val table = if (r.nextBoolean()) "t" else genString(r).take(10) + "_b"
    val tpe = Seq("write", "update", "delete")(r.nextInt(3))
    val nRows = 1 + r.nextInt(4) // multi-row events are the reference bug
    val rowsArr = mapper.createArrayNode()
    val exps = (0 until nRows).map { i =>
      val rowObj = mapper.createObjectNode()
      val cols = genCols(r)
      tpe match {
        case "write" | "delete" =>
          rowObj.set[JsonNode]("values", objOf(cols))
        case _ =>
          rowObj.set[JsonNode]("before_values", objOf(genCols(r)))
          rowObj.set[JsonNode]("after_values", objOf(cols))
      }
      rowsArr.add(rowObj)
      Exp(if (tpe == "write") "create" else tpe, table, i, Some(objOf(cols)))
    }
    val msg = mapper.createObjectNode()
    msg.put("schema", "db"); msg.put("table", table); msg.put("type", tpe)
    msg.set[JsonNode]("rows", rowsArr)
    r.nextInt(6) match {
      case 0 | 1 => Wire(msg.toString, Decodes(exps), "valid")
      case 2 => truncated(r, msg.toString, "undecodable mysql binlog")
      case 3 => // non-row event types drop whole-message (F2 posture)
        msg.put("type", Seq("rotate", "format", "gtid")(r.nextInt(3)))
        Wire(msg.toString, Decodes(Nil), "informational-type")
      case 4 => // row event WITHOUT rows[]: loud, never a silent vanish
        msg.remove("rows")
        Wire(msg.toString, Loud("row event without rows"), "rows-stripped")
      case _ => // mandatory `type` stripped: loud
        msg.remove("type")
        Wire(msg.toString, Loud("undecodable mysql binlog"), "type-stripped")
    }
  }

  // ------------------------------------------------------------------
  // mongo change stream
  // ------------------------------------------------------------------
  private def genMongo(r: Random): Wire = {
    val coll = if (r.nextBoolean()) "c" else genString(r).take(10) + "_m"
    val ns = mapper.createObjectNode()
    ns.put("db", "d"); ns.put("coll", coll)
    val key = objOf(Seq("_id" -> genValue(r)))
    val msg = mapper.createObjectNode()
    msg.set[JsonNode]("ns", ns)
    msg.set[JsonNode]("documentKey", key.deepCopy[ObjectNode]())
    r.nextInt(8) match {
      case 0 | 1 => // insert / replace -> create with the full document
        val opT = if (r.nextBoolean()) "insert" else "replace"
        msg.put("operationType", opT)
        val doc = objOf(genCols(r))
        msg.set[JsonNode]("fullDocument", doc)
        Wire(msg.toString,
          Decodes(Seq(Exp("create", coll, 0, Some(doc)))), "valid")
      case 2 => // update: updatedFields ∪ documentKey — and when the two
        // CLASH on _id (half the seeds plant one), the documentKey's value
        // must win (the splice emits uf first, dk last; last-wins is the
        // JSON-object merge both the model and readTree apply)
        msg.put("operationType", "update")
        val ufCols = genCols(r) ++
          (if (r.nextBoolean()) Seq("_id" -> genValue(r)) else Nil)
        val uf = objOf(ufCols)
        val ud = mapper.createObjectNode()
        ud.set[JsonNode]("updatedFields", uf)
        msg.set[JsonNode]("updateDescription", ud)
        val merged = uf.deepCopy[ObjectNode]()
        merged.setAll[ObjectNode](key.deepCopy[ObjectNode]())
        Wire(msg.toString,
          Decodes(Seq(Exp("update", coll, 0, Some(merged)))), "valid")
      case 3 => // update with EMPTY updatedFields -> the key alone
        msg.put("operationType", "update")
        val ud = mapper.createObjectNode()
        ud.set[JsonNode]("updatedFields", mapper.createObjectNode())
        msg.set[JsonNode]("updateDescription", ud)
        Wire(msg.toString,
          Decodes(Seq(Exp("update", coll, 0, Some(key)))), "empty-uf")
      case 4 => // delete -> the key alone
        msg.put("operationType", "delete")
        Wire(msg.toString,
          Decodes(Seq(Exp("delete", coll, 0, Some(key)))), "valid")
      case 5 => // DDL/informational kinds drop silently
        msg.put("operationType",
          Seq("create", "createIndexes", "modify", "shardCollection")(r.nextInt(4)))
        Wire(msg.toString, Decodes(Nil), "informational-op")
      case 6 => // destructive collection ops: loud (r13 — TRUNCATE posture)
        msg.put("operationType",
          Seq("drop", "dropDatabase", "rename", "invalidate")(r.nextInt(4)))
        Wire(msg.toString, Loud("refresh"), "destructive-op")
      case _ => // operationType stripped: loud
        Wire(msg.toString, Loud("undecodable mongo change stream"),
          "op-stripped")
    }
  }

  // ------------------------------------------------------------------
  // debezium
  // ------------------------------------------------------------------
  private def genDebezium(r: Random): Wire = {
    val table = if (r.nextBoolean()) "t" else genString(r).take(10) + "_z"
    val src = mapper.createObjectNode(); src.put("table", table)
    def wrap(inner: ObjectNode): String =
      if (r.nextBoolean()) inner.toString
      else {
        val w = mapper.createObjectNode()
        w.set[JsonNode]("payload", inner); w.toString
      }
    val msg = mapper.createObjectNode()
    msg.set[JsonNode]("source", src); msg.put("ts_ms", r.nextInt(1 << 30))
    r.nextInt(7) match {
      case 0 | 1 => // c / r -> create with after
        msg.put("op", if (r.nextBoolean()) "c" else "r")
        val after = objOf(genCols(r))
        msg.set[JsonNode]("after", after)
        Wire(wrap(msg), Decodes(Seq(Exp("create", table, 0, Some(after)))),
          "valid")
      case 2 => // u -> update with the full after image
        msg.put("op", "u")
        msg.set[JsonNode]("before", objOf(genCols(r)))
        val after = objOf(genCols(r))
        msg.set[JsonNode]("after", after)
        Wire(wrap(msg), Decodes(Seq(Exp("update", table, 0, Some(after)))),
          "valid")
      case 3 => // d -> delete with before (the key image)
        msg.put("op", "d")
        val before = objOf(genCols(r))
        msg.set[JsonNode]("before", before)
        Wire(wrap(msg), Decodes(Seq(Exp("delete", table, 0, Some(before)))),
          "valid")
      case 4 => // logical-decoding message: dropped, rest of feed intact
        msg.put("op", "m")
        Wire(wrap(msg), Decodes(Nil), "informational-op")
      case 5 => // unknown/truncate op: loud
        msg.put("op", Seq("t", "x", "zz")(r.nextInt(3)))
        Wire(wrap(msg), Loud("unsupported op"), "unknown-op")
      case _ => truncated(r, { msg.put("op", "c")
        msg.set[JsonNode]("after", objOf(genCols(r))); wrap(msg) },
        "undecodable debezium")
    }
  }

  // ------------------------------------------------------------------
  // drive + compare
  // ------------------------------------------------------------------
  private def decodeFmt(fmt: String, df: DataFrame): DataFrame = fmt match {
    case "wal2json" => EnvelopeDecoders.decodeWal2json(df)
    case "binlog"   => EnvelopeDecoders.decodeMysqlBinlog(df)
    case "mongo"    => EnvelopeDecoders.decodeMongoChangeStream(df)
    case "debezium" => EnvelopeDecoders.decodeDebezium(df)
  }

  private def rawDf(cases: Seq[(Long, String)]): DataFrame =
    cases.toDF("offset", "data")

  private def collectDecoded(fmt: String, df: DataFrame)
      : Seq[(String, String, Long, Int, Option[JsonNode], Option[String])] =
    decodeFmt(fmt, df).collect().toSeq.map { row =>
      (row.getString(row.fieldIndex("op")),
        row.getString(row.fieldIndex("table")),
        row.getLong(row.fieldIndex("offset")),
        row.getInt(row.fieldIndex("_ridx")),
        parsedOrNull(row.getString(row.fieldIndex("data"))),
        // only wal2json exposes the replication position; graded in the
        // SAME pass as everything else (review r13 — no second decode job)
        if (fmt == "wal2json")
          Option(row.getString(row.fieldIndex("nextlsn")))
        else None)
    }

  private def runFormat(fmt: String, gen: Random => Wire,
                        seedBase: Long): Unit = {
    val cases = (0 until SeedsPerFormat).map(i => gen(new Random(seedBase + i)))
    val (louds, decs) = cases.zipWithIndex.partition(_._1.out.isInstanceOf[Loud])
    // non-vacuousness: the generator must actually cover the hazard space
    assert(louds.size >= 20, s"$fmt: too few loud cases (${louds.size})")
    assert(decs.count { case (w, _) =>
      w.out.asInstanceOf[Decodes].rows.nonEmpty } >= 50,
      s"$fmt: too few decoding cases")
    assert(cases.count(c => c.line.contains("\\t") || c.line.contains("\\n")) >= 20,
      s"$fmt: too few tab/newline-bearing payloads")
    if (fmt == "wal2json" || fmt == "binlog")
      assert(decs.count { case (w, _) =>
        w.out.asInstanceOf[Decodes].rows.exists(_.ridx > 0) } >= 20,
        s"$fmt: too few multi-row messages (the reference-bug class)")

    // batch: every case the model says DECODES (possibly to zero rows)
    val decoded = collectDecoded(fmt,
      rawDf(decs.map { case (w, i) => (i.toLong, w.line) }))
    val expected = decs.flatMap { case (w, i) =>
      w.out.asInstanceOf[Decodes].rows.map(e =>
        (e.op, e.table, i.toLong, e.ridx, e.data, e.nextlsn))
    }
    def sortKey(t: (String, String, Long, Int, Option[JsonNode],
        Option[String])) = (t._3, t._4)
    val got = decoded.sortBy(sortKey)
    val want = expected.sortBy(sortKey)
    assert(got.size === want.size,
      s"$fmt: decoded ${got.size} rows, model says ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g === w, s"$fmt divergence:\n  got  $g\n  want $w")
    }

    // loud cases: each must RAISE (concurrently — Spark jobs are
    // submission-thread-safe) with the decoder's named message
    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val checks = louds.map { case (w, i) => Future {
      val t = intercept[Throwable] {
        collectDecoded(fmt, rawDf(Seq((i.toLong, w.line))))
      }
      val msg = causeChain(t)
      val sub = w.out.asInstanceOf[Loud].substr
      assert(sub.isEmpty || msg.contains(sub),
        s"$fmt [${w.tag}] raised without the named message " +
          s"(wanted '$sub'):\n$msg\nwire: ${w.line}")
    }}
    Await.result(Future.sequence(checks), 600.seconds)
  }

  test("wal2json: 300 seeded wires decode-to-model or fail loud") {
    runFormat("wal2json", genWal2json, 0xA11CE000L)
  }
  test("mysql binlog: 300 seeded wires decode-to-model or fail loud") {
    runFormat("binlog", genBinlog, 0xB0B0B000L)
  }
  test("mongo change stream: 300 seeded wires decode-to-model or fail loud") {
    runFormat("mongo", genMongo, 0xC0FFEE00L)
  }
  test("debezium: 300 seeded wires decode-to-model or fail loud") {
    runFormat("debezium", genDebezium, 0xDEB00000L)
  }

  test("self-test: re-introducing the reference's rows[0]-only /" +
    " first-change-only bugs DIVERGES from the model (the fuzzer can fail)") {
    // binlog: keep only _ridx 0 — mysql.py:110-116's bug
    val bCases = (0 until 100).map(i => genBinlog(new Random(0xB0B0B000L + i)))
      .zipWithIndex.filter(_._1.out.isInstanceOf[Decodes])
    val bGot = collectDecoded("binlog",
        rawDf(bCases.map { case (w, i) => (i.toLong, w.line) }))
      .filter(_._4 == 0) // the sabotage
    val bWant = bCases.flatMap { case (w, i) =>
      w.out.asInstanceOf[Decodes].rows.map(e => (e.op, e.table, i.toLong, e.ridx, e.data)) }
    assert(bGot.size < bWant.size,
      "rows[0]-only must decode FEWER rows than the model demands")
    // wal2json: keep only the first change of each transaction —
    // postgres.py:97-98's early-return shape
    val wCases = (0 until 100).map(i => genWal2json(new Random(0xA11CE000L + i)))
      .zipWithIndex.filter(_._1.out.isInstanceOf[Decodes])
    val wGot = collectDecoded("wal2json",
        rawDf(wCases.map { case (w, i) => (i.toLong, w.line) }))
      .groupBy(_._3).map(_._2.minBy(_._4)).toSeq // the sabotage
    val wWant = wCases.flatMap { case (w, i) =>
      w.out.asInstanceOf[Decodes].rows.map(e => (e.op, e.table, i.toLong, e.ridx, e.data)) }
    assert(wGot.size < wWant.size,
      "first-change-only must decode FEWER rows than the model demands")
  }
}
