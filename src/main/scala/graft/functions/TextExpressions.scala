package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** SimHash fold: 64-bit fingerprint from an array of 64-bit feature hashes.
  * Bit j of the result is set iff more features have bit j set than unset.
  *
  * A tight O(n*64) codegen'd loop per row — no shuffle at all, versus the
  * explode + 64-sum groupBy formulation (whose shuffle is pure overhead when
  * the features of one document already sit in one row). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct sliding-window minima (the winnowing selection step): for an
  * array of n hashes and window size w, returns the distinct values of
  * `min(h[j..j+w-1])` for every full window, in first-selection order.
  *
  * Monotonic-deque algorithm — O(n) per row, codegen'd — versus exploding
  * every (gram, window) pair into an O(n*w)-row shuffle. */
case class SlidingMinDistinct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sliding_min_distinct"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[Int]
    val n = xs.numElements()
    if (w <= 0 || n < w) return new GenericArrayData(Array.empty[Long])
    val deque = new Array[Int](n) // indices, increasing values
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < n) {
      val v = xs.getLong(i)
      while (tail > head && xs.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = xs.getLong(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // deque bookkeeping doesn't gain from codegen the way flat folds do;
  // keep interpreted eval (CodegenFallback) for this one.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("slidingMin", this, classOf[SlidingMinDistinct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlidingMinDistinct =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature: for each of k seeded hash functions, the min over the
  * input feature hashes. The per-seed hash is a splitmix64-style finalizer
  * of (feature xor seeded golden-ratio step) — a tight O(n*k) codegen'd
  * loop, replacing k interpreted `transform(...)` passes. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @inline private def mix(h: Long, seed: Long): Long = {
    var z = h ^ (seed * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Int]
    // k < 1 threw an opaque NegativeArraySizeException in the executor
    // (review r11; the WordBlocks require discipline)
    require(k >= 1, s"$prettyName: signature length must be >= 1, got $k")
    val n = xs.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var s = 0
      while (s < k) {
        val m = mix(h, s + 1L)
        if (m < out(s)) out(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val z = ctx.freshName("z"); val out = ctx.freshName("out")
      s"""
         |if ($b < 1) throw new IllegalArgumentException(
         |  "graft_minhash_sig: signature length must be >= 1, got " + $b);
         |int $n = $a.numElements();
         |long[] $out = new long[$b];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $s = 0; $s < $b; $s++) {
         |    long $z = $h ^ (($s + 1L) * 0x9E3779B97F4A7C15L);
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $out[$s]) $out[$s] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles of a single-space-tokenized text, in
  * first-occurrence order — semantically identical to
  * `array_distinct(transform(sequence(1, size(t)-n+1), i -> concat_ws(' ',
  * element_at(t,i)...)))` over `t = split(text, ' ')`, but ONE tight per-row
  * loop instead of an interpreted higher-order-function tree. The HOF form
  * is poison in two ways at scale: every `element_at(t, …)` reference gets
  * `split(text)` re-inlined by collapsed projections when the expression is
  * copied into a pushed-down predicate (InferFiltersFromGenerate /
  * PushDownPredicates), and the whole tree is evaluated interpreted. Texts
  * with fewer than n tokens yield an EMPTY array (DuckDB
  * generate_series(1, len-2) parity). */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(t: Any, nAny: Any): Any = {
    val grams = WordShingles.distinctGrams(t, nAny.asInstanceOf[Int])
    val out = new Array[Any](grams.size)
    val it = grams.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  /** Shared tokenize + n-gram + dedupe loop (first-occurrence order, matching
    * `array_distinct`). Tokenization matches `split(text, ' ', -1)`: single
    * spaces, empty tokens preserved. */
  private[functions] def distinctGrams(t: Any, n: Int): java.util.LinkedHashSet[String] = {
    // n < 1 would overrun the token array with an opaque executor AIOOBE
    // (review r11; the WordBlocks require discipline)
    require(n >= 1, s"graft shingling: gram size must be >= 1, got $n")
    val toks = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }
}

/** xxhash64 (seed 42 — identical to Spark's `xxhash64` function) of each
  * distinct word n-gram shingle: one fused pass replacing
  * `transform(graft_shingles(text, n), s -> xxhash64(s))`, skipping the
  * intermediate string array entirely for the MinHash/SimHash paths. */
case class WordShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(t: Any, nAny: Any): Any = {
    val grams = WordShingles.distinctGrams(t, nAny.asInstanceOf[Int])
    val out = new Array[Long](grams.size)
    val it = grams.iterator()
    var k = 0
    while (it.hasNext) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      out(k) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this, classOf[WordShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** Positional xxhash64 (seed 42) of every k-char gram of a text — the
  * winnowing front end. Equivalent to `transform(sequence(1,
  * greatest(length(text)-k+1, 1)), i -> xxhash64(substring(text, i, k)))`
  * (texts shorter than k yield ONE truncated gram, like `substring`), but a
  * single codegen'd pass instead of an interpreted lambda per position. */
case class CharGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargram_hashes"

  override def nullSafeEval(t: Any, kAny: Any): Any = {
    val u = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val k = kAny.asInstanceOf[Int]
    // One UTF-8 walk collecting per-char byte offsets, then hash byte
    // slices in place — substringSQL per position re-walks from the start
    // (O(chars^2) per doc, measured 30x slower at 300-char docs).
    val nBytes = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val charStart = new Array[Int](u.numChars() + 1)
    var b = 0
    var c = 0
    while (b < nBytes) {
      charStart(c) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      c += 1
    }
    charStart(c) = nBytes
    val nChars = c
    val m = math.max(nChars - k + 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = charStart(i)
      val e = charStart(math.min(i + k, nChars))
      out(i) = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("chargrams", this, classOf[CharGramHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramHashes =
    copy(left = newLeft, right = newRight)
}

/** Top 60 bits of an md5 digest as a non-negative BIGINT — the largest md5
  * prefix that fits a signed 64-bit int, chosen so the ORACLE ENGINE can
  * replicate the hash exactly: DuckDB computes the identical value as
  * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`. xxhash64 (the default
  * hash everywhere else in this package) is Spark-only, which is the sole
  * reason the simhash/winnow queries were rows-only-checked; hashing the
  * same features with an md5 prefix instead makes them hard-gate-checkable
  * with no change to the operator shape. */
private[functions] object Md5Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def hash(bytes: Array[Byte], from: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, from, len)
    val dig = d.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

/** [[WordShingleHashes]] with the oracle-replicable [[Md5Hash60]] hash in
  * place of xxhash64 — the SimHash feature front end (a 60-bit feature
  * domain leaves fingerprint bits 60-63 constant-zero, which costs the
  * banded pair join 4 of block 3's 16 bits and nothing else). */
case class WordShingleMd5Hashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_md5_hashes"

  override def nullSafeEval(t: Any, nAny: Any): Any = {
    val grams = WordShingles.distinctGrams(t, nAny.asInstanceOf[Int])
    val out = new Array[Long](grams.size)
    val it = grams.iterator()
    var k = 0
    while (it.hasNext) {
      val bytes = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(k) = Md5Hash60.hash(bytes, 0, bytes.length)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleMd5", this, classOf[WordShingleMd5Hashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingleMd5Hashes =
    copy(left = newLeft, right = newRight)
}

/** [[CharGramHashes]] with the oracle-replicable [[Md5Hash60]] hash in
  * place of xxhash64 — the winnowing front end. Same positional and
  * short-text semantics (texts shorter than k yield ONE truncated gram). */
case class CharGramMd5Hashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargram_md5_hashes"

  override def nullSafeEval(t: Any, kAny: Any): Any = {
    val u = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val k = kAny.asInstanceOf[Int]
    // same one-walk char-offset scheme as CharGramHashes, over a byte copy
    // (MessageDigest needs a byte[]; one copy per row, not per gram)
    val bytes = u.getBytes
    val nBytes = bytes.length
    val charStart = new Array[Int](u.numChars() + 1)
    var b = 0
    var c = 0
    while (b < nBytes) {
      charStart(c) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    charStart(c) = nBytes
    val nChars = c
    val m = math.max(nChars - k + 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = charStart(i)
      val e = charStart(math.min(i + k, nChars))
      out(i) = Md5Hash60.hash(bytes, s, e - s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("chargramMd5", this, classOf[CharGramMd5Hashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramMd5Hashes =
    copy(left = newLeft, right = newRight)
}

/** Overlap count of two SORTED (ascending) distinct long arrays — the exact
  * set-intersection size, as one codegen'd merge loop. Replaces
  * `size(array_intersect(a, b))`, which builds a hash set per call; on the
  * dedup verification path (hundreds of thousands of candidate pairs, each
  * intersecting ~100-element shingle-hash sets) the merge is both branch-
  * predictable and allocation-free. */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_overlap_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements(); val m = ys.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

/** POSITIONAL xxhash64 (seed 42) of every word n-gram: element i is the
  * hash of the gram starting at token i, duplicates preserved, order =
  * position — the front end for duplicate-SPAN detection, where
  * [[WordShingleHashes]]' set semantics lose exactly the information
  * (which positions, how contiguous) the operator needs. One fused
  * codegen'd pass; texts with fewer than n tokens yield an empty array. */
case class WordGramPosHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_pos_hashes"

  override def nullSafeEval(t: Any, nAny: Any): Any = {
    val toks = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val n = nAny.asInstanceOf[Int]
    // n < 1 made count = len+1 and overran toks with an opaque AIOOBE
    // (review r11; the WordBlocks require discipline)
    require(n >= 1, s"$prettyName: gram size must be >= 1, got $n")
    val count = math.max(toks.length - n + 1, 0)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      out(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramPosHashes", this, classOf[WordGramPosHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGramPosHashes =
    copy(left = newLeft, right = newRight)
}

/** Non-overlapping `k`-token blocks of `text`, joined with single spaces —
  * one tokenize pass per row, replacing the `transform(sequence, i ->
  * array_join(slice(split(text), ...)))` formulation whose lambda
  * re-evaluates `split(text)` once per block (Catalyst inlines
  * array-building expressions into every lambda reference — the SCALE.md
  * lesson — making segmentation O(blocks × doc length)). Tokenization
  * matches `split(text, ' ', -1)`. */
case class WordBlocks(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_blocks"

  override def nullSafeEval(t: Any, kAny: Any): Any = {
    val k = kAny.asInstanceOf[Int]
    require(k >= 1, s"$prettyName: block size must be >= 1, got $k")
    val toks = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val nBlocks = (toks.length + k - 1) / k
    val out = new Array[Any](nBlocks)
    var i = 0
    while (i < nBlocks) {
      val from = i * k
      val until = math.min(from + k, toks.length)
      val sb = new java.lang.StringBuilder(toks(from))
      var j = from + 1
      while (j < until) { sb.append(' ').append(toks(j)); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("blocks", this, classOf[WordBlocks].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordBlocks =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization — the canonical-composition pass every text
  * curation pipeline runs before hashing or deduplicating (the same logical
  * content arrives from different extractors as composed é vs e+combining
  * accent; digests treat them as distinct documents unless normalized
  * first). Codegen'd per-row JDK `java.text.Normalizer` call with an
  * allocation-free fast path for already-normalized text (the overwhelming
  * majority of real corpora), so the hot loop costs one `isNormalized`
  * scan per row. DuckDB's `nfc_normalize` computes the identical form,
  * which is what makes the operator oracle-checkable. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(a: Any): Any = {
    val u = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $a.toString();
         |if (java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $a;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextFunctions {
  /** Register `graft_simhash64` / `graft_sliding_min_distinct` / shingling. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg1 = Registration.registerIfAbsent(spark) _
    reg1("graft_simhash64", exprs => SimHash64(exprs.head))
    reg1("graft_sliding_min_distinct",
      exprs => SlidingMinDistinct(exprs(0), exprs(1)))
    reg1("graft_minhash_sig", exprs => MinHashSig(exprs(0), exprs(1)))
    reg1("graft_shingles", exprs => WordShingles(exprs(0), exprs(1)))
    reg1("graft_shingle_hashes", exprs => WordShingleHashes(exprs(0), exprs(1)))
    reg1("graft_chargram_hashes", exprs => CharGramHashes(exprs(0), exprs(1)))
    reg1("graft_shingle_md5_hashes", exprs => WordShingleMd5Hashes(exprs(0), exprs(1)))
    reg1("graft_chargram_md5_hashes", exprs => CharGramMd5Hashes(exprs(0), exprs(1)))
    reg1("graft_overlap_count", exprs => SortedOverlapCount(exprs(0), exprs(1)))
    reg1("graft_gram_pos_hashes", exprs => WordGramPosHashes(exprs(0), exprs(1)))
    reg1("graft_word_blocks", exprs => WordBlocks(exprs(0), exprs(1)))
    reg1("graft_nfc", exprs => NfcNormalize(exprs.head))
    // Spark's own codegen'd bloom probe (the expression behind
    // InjectRuntimeFilter's semi-join blooms), surfaced under a graft name
    // so operators can prefilter with a serialized sketch without a scala
    // UDF: args are (serialized bloom BINARY literal, BIGINT value)
    reg1("graft_might_contain", exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)))
  }
}
