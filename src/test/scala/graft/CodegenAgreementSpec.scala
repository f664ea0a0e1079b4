package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Interpreted-vs-codegen agreement battery over every custom expression.
  *
  * Each expression hand-writes its result twice — `nullSafeEval` (the
  * interpreted path Spark takes under constant folding, NO_CODEGEN, and
  * codegen compile-failure fallback) and `doGenCode` (the whole-stage
  * path every production plan takes). A divergence between them is silent
  * corruption in whichever path a given plan happens to pick — exactly the
  * class of the r9 graft_dot dimension-mismatch finding (codegen truncated
  * where eval nulled). This spec forces BOTH paths over one edge-input
  * battery per function — empty / whitespace-only / single-token /
  * repeated / unicode / tab-newline text, null rows, empty / zero /
  * mismatched-dimension vectors — and asserts byte-identical results, so
  * the next hand-written pair cannot drift unnoticed. */
class CodegenAgreementSpec extends SparkSpec {

  graft.functions.TextFunctions.register(spark)
  graft.functions.VectorFunctions.register(spark)

  private def bothModes(view: String, exprSql: String): Unit = {
    // review r11: (a) the gen leg pins spark.sql.codegen.fallback=false —
    // the default-true fallback silently re-ran a compile-failing
    // expression on the interpreted path in BOTH legs, making agreement
    // vacuous for exactly the divergence class this suite exists to
    // catch; (b) the finally restores the CAPTURED prior conf values, not
    // hard-coded defaults, so a session that pins its own codegen confs
    // is not silently reset for every later suite in the shared JVM.
    def run(factory: String, wholeStage: String,
            fallback: String): Seq[String] = {
      val prior = Seq("spark.sql.codegen.factoryMode",
        "spark.sql.codegen.wholeStage", "spark.sql.codegen.fallback")
        .map(k => k -> spark.conf.getOption(k))
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      spark.conf.set("spark.sql.codegen.fallback", fallback)
      try spark.sql(s"SELECT $exprSql FROM $view ORDER BY id")
        .collect().map(r => String.valueOf(r.get(0))).toSeq
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val interp = run("NO_CODEGEN", "false", "true")
    val gen = run("CODEGEN_ONLY", "true", "false")
    assert(interp === gen,
      s"$exprSql: interpreted != codegen\n  interp: $interp\n  gen:    $gen")
  }

  private val textRows = Seq(
    "", " ", "   ", "a", "a b", "a a a a a",
    "the quick brown fox jumps over the lazy dog",
    "café ñoño 中文 中文 café",
    "tab\tsep and\nnewline mixed  double  space",
    null)

  {
    val rows = new java.util.ArrayList[Row]()
    textRows.zipWithIndex.foreach { case (s, i) => rows.add(Row(i, s)) }
    spark.createDataFrame(rows, StructType.fromDDL("id INT, s STRING"))
      .createOrReplaceTempView("cg_text")
  }

  {
    val rows = new java.util.ArrayList[Row]()
    val vecs: Seq[(Seq[Double], Seq[Double])] = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(0.0, 0.0)),          // zero vectors
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),     // mismatched dims
      (Seq.empty, Seq.empty),                  // empty
      (Seq(-1.5, 2.25, -3.125), Seq(7.0, -8.0, 9.5)),
      (null, Seq(1.0)))                        // null side
    vecs.zipWithIndex.foreach { case ((a, b), i) => rows.add(Row(i, a, b)) }
    // null ELEMENT rows (review r11: ArrayData reads a null slot as 0.0 —
    // both paths must yield NULL, never a plausible-but-wrong similarity)
    rows.add(Row(vecs.size, Seq[Any](1.0, null, 3.0), Seq[Any](4.0, 5.0, 6.0)))
    rows.add(Row(vecs.size + 1, Seq[Any](1.0, 2.0, 3.0), Seq[Any](4.0, null, 6.0)))
    spark.createDataFrame(rows,
      StructType.fromDDL("id INT, v ARRAY<DOUBLE>, w ARRAY<DOUBLE>"))
      .createOrReplaceTempView("cg_vec")
  }

  private val textExprs = Seq(
    "graft_nfc(s)",
    "graft_shingles(s, 3)",
    "graft_shingle_hashes(s, 3)",
    "graft_chargram_hashes(s, 4)",
    "graft_shingle_md5_hashes(s, 5)",
    "graft_chargram_md5_hashes(s, 4)",
    "graft_gram_pos_hashes(s, 3)",
    "graft_word_blocks(s, 2)",
    "graft_simhash64(graft_shingle_hashes(s, 2))",
    "graft_minhash_sig(graft_shingle_hashes(s, 2), 16)",
    "graft_sliding_min_distinct(graft_gram_pos_hashes(s, 2), 4)",
    "graft_overlap_count(graft_shingle_hashes(s, 2), graft_chargram_hashes(s, 4))")

  for (e <- textExprs)
    test(s"text battery: $e agrees interpreted vs codegen")(
      bothModes("cg_text", e))

  private val vecExprs = Seq(
    "graft_dot(v, w)",
    "graft_norm(v)",
    // literal ±1 hyperplane matrix; rows whose v has fewer dims than the
    // planes exercise the truncated-iteration edge in both paths
    "graft_srp_code_signs(v, array(array(true, false, true), " +
      "array(false, true, true), array(true, true, false)))")

  for (e <- vecExprs)
    test(s"vector battery: $e agrees interpreted vs codegen")(
      bothModes("cg_vec", e))
}
