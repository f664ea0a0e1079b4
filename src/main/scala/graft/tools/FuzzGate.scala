package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-fixture differential fuzz of the oracle gate (r11 verdict
  * #1). Every round's gate runs the 180-query surface against the SAME
  * fixed fixtures — so a data-dependent edge case (an empty group meeting
  * a HOF range, a null join key, an all-duplicate corpus collapsing a
  * banding premise) only surfaces if the fixed data happens to contain it.
  * This tool stages seeded fixture VARIANTS at sf0.01 shape and re-runs
  * the exact Verify dump path per variant; `scripts/fuzz_gate.py` then
  * runs the DuckDB oracle over each dump — a full three-way differential
  * check per variant. Spark-side failures land in `errors.json` so the
  * gate can distinguish a DECLARED contract refusal (a loud `require`
  * naming the repair) from a silent divergence.
  *
  * Variants (all deterministic — seeded column hashes, no RNG state):
  *  - `empty`     every table zero rows, schema intact
  *  - `single`    every table cut to its first row by primary key
  *  - `alldup`    all-duplicate corpus: every document carries doc 1's
  *                text, every embedding carries vec 1's vector
  *  - `nulls_a/b` 25% of every non-key cell nulled, per-cell xxhash64
  *                selection (two seeds — null placement is the variable)
  *  - `unicode`   documents.text stressed with combining marks, emoji,
  *                CJK, RTL overrides, zero-width chars, and ~7 KB
  *                max-length rows; n_chars kept consistent
  *  - `extremes`  numeric stress on the fact columns: x1e6..x1e9
  *                magnitudes (orders x1e6, part x1e7, events x1e9),
  *                negated amounts, zero quantities, an out-of-range
  *                discount
  *  - r13 composed/widened: `nulls_extremes`, `unicode_alldup` (every doc
  *                carries the 7.2 KB stressed row), `nulls_single`,
  *                `unicode_keys` (value-keyed unicode suffix on
  *                events.event_type + customer/nation strings),
  *                `extremes_time` (epoch-0 / year-2255 / whole-second-tie
  *                timestamps, epoch + 9999-12-31 order dates) — see the
  *                Variants val for the rationale per variant
  *
  * Dev tool, not part of the engine surface.
  * Usage: runMain graft.tools.FuzzGate [srcDir] [outRoot] [variant...]
  *   `--stage-only` among the variants stages the listed fixtures and
  *   skips the dump — iterate one query over them with VerifySome +
  *   check_oracle.py instead of paying the full sweep per variant.
  */
object FuzzGate {
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Primary-key columns kept non-null and used as the per-row hash
    * identity for deterministic cell selection. */
  val Pk: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  val Variants: Seq[String] =
    Seq("empty", "single", "alldup", "nulls_a", "nulls_b", "unicode",
      "extremes",
      // r12 verdict #2 — COMPOSED variants (real corrupt shards combine
      // failure modes; each base variant alone had been probed green):
      //   nulls_extremes  numeric extremes, then 25% cells nulled (seed 303)
      //   unicode_alldup  unicode-stressed docs collapsed to ONE text —
      //                   doc 1's stressed row is the 7.2 KB repeated form,
      //                   so the dup tiers chew identical multi-KB unicode
      //   nulls_single    one row per table, 25% of its cells nulled (404)
      // and WIDENED single-axis variants:
      //   unicode_keys    unicode pushed into JOIN/GROUP keys — a
      //                   value-keyed suffix on events.event_type and the
      //                   customer/nation strings (consistent per value, so
      //                   groups/joins survive; engine-vs-oracle collation
      //                   of the keys is what is under test)
      //   extremes_time   timestamp extremes — epoch 0, a far-future 2255
      //                   (near the TIMESTAMP(NANOS) long ceiling),
      //                   whole-second TIES (sub-second order erased), and
      //                   epoch/9999-12-31 order dates
      "nulls_extremes", "unicode_alldup", "nulls_single", "unicode_keys",
      "extremes_time")

  /** Per-cell deterministic nulling of every non-pk column (the nulls_*
    * base transform, seed-parameterized for composition). */
  private def nullCells(df: DataFrame, table: String, seed: Int): DataFrame = {
    val pk = Pk(table)
    df.select(df.columns.map { c =>
      if (pk.contains(c)) col(c)
      else {
        val h = pmod(xxhash64(
          lit(seed) +: lit(table) +: lit(c) +: pk.map(col): _*), lit(100))
        when(h < 25, lit(null).cast(df.schema(c).dataType))
          .otherwise(col(c)).as(c)
      }
    }: _*)
  }

  /** Value-keyed unicode suffix: the SAME input value always gains the
    * same suffix, so equality joins and group keys stay consistent while
    * every key carries combining marks / bidi overrides / astral chars. */
  private def uniKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.isNull, c).otherwise(concat(c, element_at(
      array(lit("e\u0301"), lit("\ud83d\ude80"),
        lit("\u202e21\u202c"), lit("\u6f22\u200b")),
      (pmod(xxhash64(c), lit(4)) + 1).cast("int"))))

  def transform(df: DataFrame, table: String, variant: String): DataFrame =
    variant match {
      case "empty" => df.where(lit(false))
      case "single" => df.orderBy(Pk(table).map(col): _*).limit(1)
      case "nulls_extremes" =>
        nullCells(transform(df, table, "extremes"), table, 303)
      case "unicode_alldup" =>
        // compose so the duplicated text is the 7.2 KB repeated unicode
        // row (the m==1 stress form), NOT doc 0's short suffix form —
        // plain alldup picks min(doc_id)=0 and the advertised
        // identical-multi-KB-unicode hazard would never stage (review r13)
        if (table != "documents")
          transform(transform(df, table, "unicode"), table, "alldup")
        else {
          val uni = transform(df, table, "unicode")
          val one = uni.filter(pmod(col("doc_id"), lit(7)) === 1)
            .orderBy("doc_id").limit(1)
            .select(col("text").as("__dup_text"))
          require(one.count() == 1L,
            "unicode_alldup needs a doc with doc_id % 7 == 1 (the 7.2 KB " +
              "stressed row) — stage from a corpus with >= 2 documents")
          uni.crossJoin(broadcast(one))
            .withColumn("text", col("__dup_text"))
            .withColumn("n_chars", length(col("text")).cast("long"))
            .select(df.columns.map(col): _*)
        }
      case "nulls_single" =>
        nullCells(transform(df, table, "single"), table, 404)
      case "unicode_keys" => table match {
        case "events" =>
          df.withColumn("event_type", uniKey(col("event_type")))
        case "customer" =>
          df.withColumn("c_mktsegment", uniKey(col("c_mktsegment")))
            .withColumn("c_name", uniKey(col("c_name")))
        case "nation" => df.withColumn("n_name", uniKey(col("n_name")))
        case _ => df
      }
      case "extremes_time" => table match {
        case "events" =>
          //   %23==0 -> epoch 0; ==1 -> far-future year 2255 (near the
          //   TIMESTAMP(NANOS) int64 ceiling); ==2/3/4 -> truncated to the
          //   WHOLE second (sub-second order erased -> forced ties for
          //   every window tie-break); others unchanged. Type-adaptive:
          //   ts arrives as LONG nanos under nanosAsLong or as a real
          //   timestamp type depending on the fixture's physical type.
          val m = pmod(col("event_id"), lit(23))
          val (epoch0, far, wholeSec) = df.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              (lit(0L), lit(9000000000L * 1000000000L),
                expr("(ts div 1000000000) * 1000000000"))
            case tt =>
              (lit("1970-01-01 00:00:00").cast(tt),
                lit("2255-01-01 00:00:00").cast(tt),
                date_trunc("second", col("ts")).cast(tt))
          }
          df.withColumn("ts",
            when(m === 0, epoch0).when(m === 1, far)
              .when(m.isin(2, 3, 4), wholeSec)
              .otherwise(col("ts")))
        case "orders" =>
          val m = pmod(col("o_orderkey"), lit(29))
          df.withColumn("o_orderdate",
            when(m === 0, to_date(lit("1970-01-01")))
              .when(m === 1, to_date(lit("9999-12-31")))
              .otherwise(col("o_orderdate")))
        case _ => df
      }
      case "alldup" => table match {
        case "documents" =>
          val one = df.orderBy("doc_id").limit(1)
            .select(col("text").as("__dup_text"))
          df.crossJoin(broadcast(one))
            .withColumn("text", col("__dup_text"))
            .withColumn("n_chars", length(col("text")).cast("long"))
            .select(df.columns.map(col): _*)
        case "embeddings" =>
          val one = df.orderBy("vec_id").limit(1)
            .select(col("embedding").as("__dup_vec"))
          df.crossJoin(broadcast(one))
            .withColumn("embedding", col("__dup_vec"))
            .select(df.columns.map(col): _*)
        case _ => df
      }
      case "nulls_a" => nullCells(df, table, 101)
      case "nulls_b" => nullCells(df, table, 202)
      case "unicode" =>
        if (table != "documents") df
        else {
          val m = pmod(col("doc_id"), lit(7))
          // invisible / combining codepoints spelled as \\u escapes --
          // literal zero-width or bidi-override chars in source are
          // unreviewable and trip editors
          val mixedScripts =
            " caf\u00e9 e\u0301 \u6f22\u5b57\u3067\u3059 " +
            "\u0645\u0631\u062d\u0628\u0627 \ud83c\udf0d\ud83d\ude80"
          val nfdDecomposed =
            "cafe\u0301 nai\u0308ve A\u030arhus "
          val zeroWidthRtl =
            "a\u200bb\u200dc \u202e12345\u202c "
          val longRow =
            "h\u00e9llo w\u00f6rld \u4f60\u597d \ud83d\ude80 "
          val stressed =
            when(m === 0, concat(col("text"), lit(mixedScripts)))
            // max-length row: ~7.2 KB of repeated multi-script text
            .when(m === 1, concat_ws("", array_repeat(lit(longRow), 400)))
            // decomposed (NFD-style) combining sequences ahead of the body
            .when(m === 2, concat(lit(nfdDecomposed), col("text")))
            // zero-width chars + an RTL override span
            .when(m === 3, concat(lit(zeroWidthRtl), col("text")))
            .otherwise(col("text"))
          df.withColumn("text", stressed)
            .withColumn("n_chars", length(col("text")).cast("long"))
            .select(df.columns.map(col): _*)
        }
      case "extremes" =>
        // numeric-extremes stress on the FACT columns: huge magnitudes
        // (x1e6), negated amounts, zero quantities, and an out-of-range
        // rate — the inputs that expose overflow, abs/sign and
        // division-by-zero assumptions. Deterministic per-pk modulus.
        def mod(c: String, m: Int) = pmod(col(c), lit(m))
        table match {
          case "orders" => df
            .withColumn("o_totalprice",
              when(mod("o_orderkey", 5) === 0, col("o_totalprice") * 1e6)
                .when(mod("o_orderkey", 5) === 1, -col("o_totalprice"))
                .otherwise(col("o_totalprice")))
          case "lineitem" => df
            .withColumn("l_quantity",
              when(mod("l_orderkey", 7) === 0, lit(0.0))
                .otherwise(col("l_quantity")))
            .withColumn("l_extendedprice",
              when(mod("l_orderkey", 11) === 0, -col("l_extendedprice"))
                .otherwise(col("l_extendedprice")))
            .withColumn("l_discount",
              when(mod("l_orderkey", 13) === 0, lit(1.5))
                .otherwise(col("l_discount")))
          case "events" => df
            .withColumn("value",
              when(mod("event_id", 9) === 0, col("value") * 1e9)
                .when(mod("event_id", 9) === 1, -col("value"))
                .otherwise(col("value")))
          case "customer" => df
            .withColumn("c_acctbal",
              when(mod("c_custkey", 3) === 0, -col("c_acctbal"))
                .otherwise(col("c_acctbal")))
          case "part" => df
            .withColumn("p_size",
              when(mod("p_partkey", 17) === 0, lit(0))
                .otherwise(col("p_size")))
            .withColumn("p_retailprice",
              when(mod("p_partkey", 19) === 0, col("p_retailprice") * 1e7)
                .otherwise(col("p_retailprice")))
          case _ => df
        }
      case other => sys.error(s"unknown variant: $other")
    }

  /** Write as a SINGLE parquet FILE at `$dst/$table.parquet`, matching the
    * testdata layout — `check_oracle.py` builds its DuckDB views from that
    * exact path shape (no glob), so a Spark part-file directory would
    * break the oracle side of the differential. */
  private[tools] def writeSingle(df: DataFrame, dst: String, table: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = s"$dst/.stage_$table"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written for $table under $tmp"))
    Files.move(part.toPath, Paths.get(s"$dst/$table.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(new java.io.File(tmp))
  }

  def stage(spark: SparkSession, src: String, dst: String,
            variant: String): Unit = {
    new java.io.File(dst).mkdirs()
    TableNames.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      writeSingle(transform(df, t, variant), dst, t)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft-fuzz"
    val rest = if (args.length > 2) args.drop(2).toSeq else Variants
    val stageOnly = rest.contains("--stage-only")
    val which = rest.filterNot(_ == "--stage-only") match {
      case Seq() => Variants
      case vs => vs
    }
    which.foreach(v => require(Variants.contains(v), s"unknown variant: $v"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus.toInt)
    which.foreach { v =>
      val dataDir = s"$outRoot/$v/data"
      val outDir = s"$outRoot/$v/out"
      println(s"== [$v] staging -> $dataDir")
      stage(spark, src, dataDir, v)
      if (stageOnly) {
        println(s"== [$v] staged (--stage-only)")
      } else {
        println(s"== [$v] dumping 180 queries -> $outDir")
        val errs = graft.Verify.dump(spark, dataDir, outDir)
        // per-variant Spark-side failure messages for the python gate's
        // declared-contract cross-reference (truncated: a require message
        // names its repair in the first lines)
        val json = errs.toSeq.sortBy(_._1)
          .map { case (k, m) =>
            s"${graft.Verify.q(k)}: ${graft.Verify.q(m.take(400))}" }
          .mkString("{", ",", "}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/errors.json"), json)
        println(s"== [$v] done: ${errs.size} spark-side failures")
      }
      // drop inter-variant leftovers (cached plans, checkpoint blocks) so
      // variant N+1 doesn't run under variant N's storage pressure
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.Verify.deleteRecursively(f)
}
