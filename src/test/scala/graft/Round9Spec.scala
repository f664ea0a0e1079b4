package graft

import graft.ops.{Dedup, Graph, Tables}
import org.apache.spark.sql.functions._

/** Round-9 contracts for the production cells-scaled graph blocking
  * (r8 verdict #1): the two-level product-quantizer edge build
  * ([[Dedup.embedDupCells]]) degenerates to the exact eps graph at
  * nCells = 1, emits EXACTLY the within-cell answer at any nCells
  * (re-derived independently), and the graph ops ride it end-to-end
  * with their invariants intact. */
class Round9Spec extends SparkSpec {

  private val dir0 = "/root/testdata/sf0.001"

  /** The exact all-pairs eps graph, computed the brute way (500 vectors
    * at sf0.001 — fine for a spec, never a production plan). */
  private def brutePairs(threshold: Double) = {
    graft.functions.VectorFunctions.register(spark)
    val e = Tables(spark, dir0, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr("graft_norm(v)"))
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", round(
        expr("graft_dot(a.v, b.v)") / (col("a.norm") * col("b.norm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("cosine"))
  }

  test("embedDupCells at nCells = 1 equals the exact all-pairs eps graph " +
    "(the probe-cut is the ONLY approximation)") {
    val cells = Dedup.embedDupCells(spark, dir0, 0.15, nCells = 1)
    val brute = brutePairs(0.15)
    assert(cells.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(cells).count() === 0L)
    assert(brute.count() > 0L, "vacuity guard: the fixture must have eps pairs")
  }

  test("embedDupCells emits EXACTLY the within-cell answer: the pair set " +
    "equals {brute pairs whose endpoints co-assign}, with the assignment " +
    "re-derived independently driver-side") {
    val nCells = 9
    val k = math.ceil(math.sqrt(nCells.toDouble)).toInt
    // independent re-derivation: collect the fixture (500 rows — bounded
    // spec-side only) and recompute the two-level argmax in plain Scala
    val vecs = Tables(spark, dir0, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def half(v: Array[Double], first: Boolean) = {
      val h = v.length / 2
      if (first) v.take(h) else v.drop(h)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) -1.5 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val seeds = (0L until k.toLong).map(i => i -> vecs(i)).toMap
    def assign(v: Array[Double], first: Boolean): Long =
      seeds.toSeq.sortBy(_._1).foldLeft((-2.0, -1L)) { case ((best, cell), (sid, sv)) =>
        val c = cos(half(v, first), half(sv, first))
        if (c > best) (c, sid) else (best, cell)
      }._2
    val cellOf = vecs.map { case (id, v) =>
      id -> (assign(v, first = true) * k + assign(v, first = false))
    }
    val brute = brutePairs(0.15).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brute.filter { case (a, b) => cellOf(a) == cellOf(b) }
    val got = Dedup.embedDupCells(spark, dir0, 0.15, nCells)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"cells pair set != independently derived within-cell answer " +
        s"(got ${got.size}, expected ${expected.size})")
    assert(expected.size < brute.size,
      "vacuity guard: blocking must actually cut pairs on this fixture")
    assert(expected.nonEmpty,
      "vacuity guard: some pairs must survive co-assignment")
  }

  test("graph family runs end-to-end on the cells blocking with invariants " +
    "intact (labelProp component consistency, dbscan role geometry, " +
    "kCore degree floor)") {
    val nCells = 9
    val lp = Graph.labelProp(spark, dir0, blocking = "cells", nCells = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lp.nonEmpty)
    // component consistency against the SAME cells graph
    val pairs = Dedup.embedDupCells(spark, dir0, 0.15, nCells)
      .select(col("vec_b").as("u"), col("vec_a").as("v"))
    val comp = Dedup.bigStarComponents(pairs, 20, "r9 spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    lp.foreach { case (n, c) =>
      assert(comp(n) === comp(c), s"node $n community $c crosses components")
    }
    val db = Graph.dbscan(spark, dir0, blocking = "cells", nCells = nCells)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(db.map(_._2).toSet.subsetOf(Set("core", "border", "noise")))
    assert(db.filter(_._2 == "noise").forall(_._3 == -1L))
    val kc = Graph.kCore(spark, dir0, blocking = "cells", nCells = nCells)
      .collect().map(r => r.getLong(1))
    assert(kc.forall(_ >= 2L), "every surviving node keeps >= k neighbors")
  }

  test("knnGraph on the cells blocking: TopKAgg and window formulations " +
    "stay byte-identical, <= k neighbors per source, hubness edges conserve") {
    import graft.ops.Similarity
    val nCells = 9
    val agg = Similarity.knnGraph(spark, dir0, k = 3,
      blocking = "cells", nCells = nCells)
    val win = Similarity.knnGraphWindow(spark, dir0, k = 3,
      blocking = "cells", nCells = nCells)
    assert(agg.exceptAll(win).count() === 0L)
    assert(win.exceptAll(agg).count() === 0L)
    val perSrc = agg.groupBy(col("src_id")).count().collect().map(_.getLong(1))
    assert(perSrc.nonEmpty && perSrc.forall(_ <= 3L))
    val edges = agg.count()
    val occSum = Similarity.hubness(spark, dir0, k = 3,
        blocking = "cells", nCells = nCells)
      .agg(sum(col("k_occ"))).head().getLong(0)
    assert(occSum === edges, "k-occurrence totals must conserve the edge count")
  }

  test("cells-tier auto-sizing (r9 verdict #7): the DEFAULT nCells derives " +
    "from the corpus count at the ~240-row operating point, pinning the " +
    "per-cell population band at two scales; an explicit nCells still wins") {
    // the formula: ceil(N / target), floor 1, at the two graded scales
    assert(Dedup.autoCells(500L) === 3)     // sf0.001/0.01 embeddings
    assert(Dedup.autoCells(2000L) === 9)    // sf0.1 embeddings
    assert(Dedup.autoCells(0L) === 1 && Dedup.autoCells(1L) === 1)
    assert(Dedup.autoCells(240L) === 1 && Dedup.autoCells(241L) === 2)
    // 100 TB arithmetic: 1e12 rows derive ~4.2e9 cells, above Int range —
    // clamped to Int.MaxValue, never overflow-negative
    assert(Dedup.autoCells(1000000000000L) === Int.MaxValue)
    assert(Dedup.autoCells(Long.MaxValue) === Int.MaxValue)
    // end-to-end: the default (AutoCells) resolves against the real corpus
    // and the realized mean population of NONEMPTY cells stays inside a
    // [target/8, target*8] band at both scales — the demo quantizer skews,
    // but not past the band; a frozen default could drift arbitrarily far
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val n = Tables(spark, d, "embeddings").count()
      val auto = Dedup.autoCells(n)
      val assign = Dedup.productCellAssign(spark, d,
        Dedup.resolveCells(spark, d, Dedup.AutoCells))
      val nonempty = assign.select("cell").distinct().count()
      // resolveCells(AutoCells) == autoCells(corpus) by construction; the
      // quantizer can realize at most k*k = ceil(sqrt(auto))^2 cells
      val k = math.ceil(math.sqrt(auto.toDouble)).toLong
      assert(nonempty >= 1L && nonempty <= k * k,
        s"$d: realized cells $nonempty outside [1, ${k * k}]")
      val mean = n.toDouble / nonempty
      assert(mean >= Dedup.TargetCellPopulation / 8.0 &&
        mean <= Dedup.TargetCellPopulation * 8.0,
        s"$d: mean nonempty-cell population $mean outside the band " +
          s"around ${Dedup.TargetCellPopulation}")
      // an explicit nCells is untouched by auto-sizing
      assert(Dedup.resolveCells(spark, d, 4) === 4)
    }
  }
}
