package graft

import scala.collection.mutable

import graft.ops.{Graph, Sampling, Similarity, Tables}

/** Sixth round-6 batch: triangle counting / clustering coefficients,
  * deterministic epoch-shuffle order, and margin-based bitext mining.
  * Driver-side closed forms plus the structural contracts (triangle
  * 3x-counting, shard-permutation totality, hub suppression). */
class BatchSixOpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def embeddings(): Array[(Long, Int, Array[Double])] =
    Tables(spark, sf, "embeddings").collect().map { r =>
      (r.getLong(0), r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray)
    }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cell(v: Array[Double]): Int =
    (if (v(0) > 0) 8 else 0) + (if (v(1) > 0) 4 else 0) +
      (if (v(2) > 0) 2 else 0) + (if (v(3) > 0) 1 else 0)

  private def epsEdges(threshold: Double): Array[(Long, Long)] = {
    val emb = embeddings()
    for {
      a <- emb; b <- emb
      if a._1 < b._1 && a._2 == b._2 && cell(a._3) == cell(b._3)
      if round4(cos(a._3, b._3)) >= threshold
    } yield (a._1, b._1)
  }

  // ------------------------------------------------------------ triangles

  test("triangles: per-node counts equal the brute-force adjacency-set " +
    "closed form; totals are a multiple of 3; coefficients in [0,1]") {
    val edges = epsEdges(0.15)
    val adj = mutable.HashMap.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val triPerNode = mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a) if c > b && adj(b).contains(c)
    } {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val got = Graph.triangles(spark, sf).collect()
    assert(got.length === adj.size && adj.nonEmpty)
    got.foreach { r =>
      val (id, deg, nTri, cc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg === adj(id).size.toLong)
      assert(nTri === triPerNode(id), s"triangle count at node $id")
      val expectCc = if (deg > 1) round4(2.0 * nTri / (deg * (deg - 1))) else 0.0
      assert(cc === expectCc)
      assert(cc >= 0.0 && cc <= 1.0)
    }
    assert(got.map(_.getLong(2)).sum % 3 === 0,
      "every triangle is counted at exactly its three corners")
    assert(got.exists(_.getLong(2) > 0), "fixture graph must close triangles")
  }

  // ---------------------------------------------------------- epoch order

  test("epoch order: total permutation — every doc exactly once, shard " +
    "positions contiguous, gpos injective, and the md5 closed form") {
    val docs = Tables(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0))
    val got = Sampling.epochOrder(spark, sf).collect()
    assert(got.length === docs.length)
    assert(got.map(_.getLong(0)).toSet === docs.toSet, "no doc lost or added")
    val expect = docs.map { id =>
      val h = md5hex(s"graft_epoch:1:$id")
      (id, (java.lang.Long.parseLong(h.take(8), 16) % 8).toInt, h)
    }.groupBy(_._2).iterator.flatMap { case (shard, rows) =>
      rows.sortBy { case (id, _, h) => (h, id) }.zipWithIndex.map {
        case ((id, _, _), i) => id -> ((shard, i + 1))
      }
    }.toMap
    got.foreach { r =>
      val (id, shard, pos, gpos) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
      assert((shard, pos) === expect(id), s"placement of doc $id")
      assert(gpos === (pos - 1).toLong * 8 + shard)
    }
    val gposes = got.map(_.getLong(3))
    assert(gposes.distinct.length === gposes.length,
      "interleaved positions are injective")
    got.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length),
        "in-shard positions are contiguous from 1")
    }
  }

  test("epoch order: different epochs give genuinely different orders, " +
    "same epoch is stable") {
    val e1a = Sampling.epochOrder(spark, sf, epoch = 1).collect().map(_.toSeq)
    val e1b = Sampling.epochOrder(spark, sf, epoch = 1).collect().map(_.toSeq)
    val e2 = Sampling.epochOrder(spark, sf, epoch = 2).collect().map(_.toSeq)
    assert(e1a.toSeq === e1b.toSeq, "same epoch replays identically")
    // re-keying the hash must move most docs (equal placement would need
    // md5 collisions across the epoch salt)
    val placed1 = e1a.map(r => r.head -> (r(1), r(2))).toMap
    val moved = e2.count(r => placed1(r.head) != ((r(1), r(2))))
    assert(moved > e2.length / 2, s"only $moved/${e2.length} docs moved")
  }

  // ---------------------------------------------------------- bitext mine

  test("bitext mine: equals the driver-side integer-margin closed form " +
    "and every mined pair is its source's margin argmax above 1.0") {
    val emb = embeddings()
    val xs = emb.filter(_._2 == 0)
    val ys = emb.filter(_._2 == 1)
    val cm = mutable.HashMap.empty[(Long, Long), Long]
    for (x <- xs; y <- ys)
      cm((x._1, y._1)) = math.round(round4(cos(x._3, y._3)) * 10000)
    def topkSum(rows: Array[(Long, Long)]): Long = // (otherId, cm) pairs
      rows.sortBy { case (id, c) => (-c, id) }.take(4).map(_._2).sum
    val sx = xs.map(x => x._1 ->
      topkSum(ys.map(y => (y._1, cm((x._1, y._1)))))).toMap
    val sy = ys.map(y => y._1 ->
      topkSum(xs.map(x => (x._1, cm((x._1, y._1)))))).toMap
    val expect = xs.flatMap { x =>
      val cands = ys.flatMap { y =>
        val c = cm((x._1, y._1))
        val denom = sx(x._1) + sy(y._1)
        if (c > 0 && denom > 0) Some((y._1, c, c * 80000L / denom)) else None
      }
      if (cands.isEmpty) None
      else {
        val (tid, c, mm) = cands.minBy { case (id, _, m) => (-m, id) }
        if (mm >= 10000L) Some((x._1, tid, c, mm)) else None
      }
    }.sortBy(_._1)
    val got = Similarity.bitextMine(spark, sf).collect()
    assert(got.length === expect.length && got.nonEmpty)
    got.zip(expect).foreach { case (g, (src, tgt, c, mm)) =>
      assert(g.getLong(0) === src && g.getLong(1) === tgt)
      assert(g.getDouble(2) === round4(c / 10000.0))
      assert(g.getDouble(3) === round4(mm / 10000.0))
      assert(g.getDouble(3) >= 1.0)
    }
  }

  test("bitext mine: the margin demotes hub candidates a raw-cosine " +
    "argmax would pick") {
    // structural check on the fixture: for at least one source, the
    // margin argmax differs from the raw-cosine argmax — the entire point
    // of the denominator. (If the fixture ever makes these identical
    // everywhere, the margin is inert and the op needs a better fixture.)
    val emb = embeddings()
    val xs = emb.filter(_._2 == 0)
    val ys = emb.filter(_._2 == 1)
    val rawArgmax = xs.map { x =>
      x._1 -> ys.map(y => (y._1, round4(cos(x._3, y._3))))
        .minBy { case (id, c) => (-c, id) }._1
    }.toMap
    val mined = Similarity.bitextMine(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diverges = mined.count { case (src, tgt) => rawArgmax(src) != tgt }
    assert(diverges > 0,
      "margin selection must diverge from raw cosine somewhere")
  }
}
