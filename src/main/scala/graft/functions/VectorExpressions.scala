package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (similarity search /
  * embedding dedup). The higher-order-function formulation
  * (`aggregate(zip_with(a, b, ...))`) is interpreted per element; these
  * generate a tight Java loop inside whole-stage codegen instead, with
  * IDENTICAL semantics (sequential left-to-right double accumulation), so
  * results stay bit-for-bit equal to the DuckDB oracle's fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null on dimension mismatch (below), not only on null inputs
  override def nullable: Boolean = true

  // Dimension mismatch => NULL, matching the aggregate(zip_with(...))
  // formulation this expression claims bit-parity with (zip_with pads the
  // shorter side with nulls, so the fold yields null): a mixed-dimension
  // corpus row must surface as a detectable null, never as a
  // plausible-but-truncated similarity (r9 review).
  // A NULL element => NULL result (review r11): the claimed-bit-identical
  // aggregate(zip_with(...)) yields null there, while ArrayData.getDouble
  // reads a null slot as 0.0 — a plausible-but-wrong similarity, the exact
  // class the r9 dimension-mismatch rule exists to surface. Inputs built
  // by transform(embedding, x -> cast(x as double)) are containsNull=true,
  // so this path is reachable from every IVF/dedup caller.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm via the same sequential accumulation. */
case class VecNorm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"
  // null on a null ELEMENT (the DotProduct rule — review r11)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); s += v * v; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Sign-random-projection LSH code over the micro-unit lattice: bit p of
  * the result is the sign of `<h_p, q(v)>` where `q(v)_i =
  * floor(v_i * 1e6)` (exact integer accumulation — no float summation-order
  * hazard can flip a near-zero sign between engines) and hyperplane `h_p`
  * is a ±1 vector supplied as a boolean row of `signs` (true = +1). The
  * caller derives the sign matrix from md5 ([[Md5Hash60]], the same
  * oracle-replicable generator that promoted the simhash family), so a
  * DuckDB oracle rebuilds the identical matrix with
  * `CAST('0x' || substr(md5(key), 1, 15) AS BIGINT) % 2`. One
  * O(bits * dim) codegen'd loop per row — the `aggregate(zip_with(...))`
  * HOF formulation it replaces paid interpreted-lambda overhead per
  * (plane, component). */
case class SrpCodeSigns(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(BooleanType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<array<boolean>>), " +
            s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_code_signs"
  // null on a vector/plane dimension mismatch or a null element — NOT a
  // silent prefix truncation (review r11): a code computed from a prefix
  // is a plausible-but-wrong LSH bucket that silently loses near-dup
  // candidates; the DotProduct rule applies here identically.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val planes = b.asInstanceOf[ArrayData]
    val bits = math.min(planes.numElements(), 64)
    var code = 0L
    var p = 0
    while (p < bits) {
      if (planes.isNullAt(p)) return null
      val row = planes.getArray(p)
      val n = v.numElements()
      if (row.numElements() != n) return null
      var s = 0L
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        val q = math.floor(v.getDouble(i) * 1e6).toLong
        s += (if (row.getBoolean(i)) q else -q)
        i += 1
      }
      if (s > 0L) code |= (1L << p)
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val bits = ctx.freshName("bits"); val p = ctx.freshName("p")
      val row = ctx.freshName("row"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val q = ctx.freshName("q"); val code = ctx.freshName("code")
      s"""
         |int $bits = java.lang.Math.min($b.numElements(), 64);
         |long $code = 0L;
         |for (int $p = 0; $p < $bits && !${ev.isNull}; $p++) {
         |  if ($b.isNullAt($p)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($p);
         |  int $n = $a.numElements();
         |  if ($row.numElements() != $n) { ${ev.isNull} = true; break; }
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $q = (long) java.lang.Math.floor($a.getDouble($i) * 1e6);
         |    $s += $row.getBoolean($i) ? $q : -$q;
         |  }
         |  if (!${ev.isNull} && $s > 0L) $code |= (1L << $p);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $code; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpCodeSigns =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register `graft_dot` / `graft_norm` / `graft_srp_code_signs`.
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg1 = Registration.registerIfAbsent(spark) _
    reg1("graft_dot", exprs => DotProduct(exprs(0), exprs(1)))
    reg1("graft_norm", exprs => VecNorm(exprs.head))
    reg1("graft_srp_code_signs", exprs => SrpCodeSigns(exprs(0), exprs(1)))
  }

  /** md5-derived ±1 hyperplane matrix for [[SrpCodeSigns]]: sign(p, i) is
    * bit 0 of Md5Hash60("srp:p:i") — true = +1. The DuckDB oracle rebuilds
    * it as `CAST('0x' || substr(md5('srp:' || p || ':' || i), 1, 15) AS
    * BIGINT) % 2 = 0`. */
  def srpSigns(bits: Int, dim: Int): Seq[Seq[Boolean]] =
    (0 until bits).map { p =>
      (0 until dim).map { i =>
        val b = s"srp:$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (Md5Hash60.hash(b, 0, b.length) & 1L) == 0L
      }
    }
}
