package graft.tools

/** Stage a FULL sf1-shaped fixture (r12 verdict #4): every table of the
  * sf0.1 fixture replicated 10x with shifted keys — the relational star
  * included, so the headline tier's joins/aggregates run at ~6M lineitem —
  * written as SINGLE parquet files per table (the exact layout
  * `check_oracle.py` builds its DuckDB views from), ready for the
  * per-query-subprocess three-way screen:
  *
  *   runMain graft.tools.StageSf1 [srcDir] [dstDir] [fac]
  *   runMain graft.tools.VerifySome <dstDir> <outDir> <headline queries...>
  *   python3 scripts/sf_screen.py <dstDir> <outDir> CORRECTNESS_sf1_rN.json
  *
  * Replication keeps referential structure: each fact table shifts its FK
  * columns together with the referenced dimension's pk (same per-replica
  * offset), so joins find exactly the rows they would in a real 10x
  * dataset; nation/region stay verbatim (FKs into them unshifted).
  * Documents get per-replica-rewritten text and embeddings sign-reflected
  * (the shared [[Replica]] convention: replicas must be DISTINCT content,
  * or the dedup tiers would measure the duplicate pathology instead of
  * scan scaling). Dev tool, not part of the engine surface. */
object StageSf1 {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft-sf1-full"
    val fac = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    val keyCols: Map[String, Set[String]] = Map(
      "customer" -> Set("c_custkey"),
      "supplier" -> Set("s_suppkey"),
      "part" -> Set("p_partkey"),
      "orders" -> Set("o_orderkey", "o_custkey"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Set("event_id", "user_id"),
      "documents" -> Set("doc_id"),
      "embeddings" -> Set("vec_id"))

    FuzzGate.TableNames.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = keyCols.get(t) match {
        case Some(keys) =>
          // replicas occupy disjoint key ranges ONLY while every source
          // key is under Replica.Shift — restaging an already-staged
          // output would silently mint duplicate pks and broken FK joins
          // (review r13); one bounded max() per key column fails loud
          import org.apache.spark.sql.functions.{col, max}
          val row = df.agg(max(keys.head), keys.tail.toSeq.map(max(_)): _*).head()
          keys.toSeq.zipWithIndex.foreach { case (k, i) =>
            if (!row.isNullAt(i)) {
              val m = row.get(i).toString.toLong
              require(m < Replica.Shift,
                s"$t.$k max $m >= Replica.Shift ${Replica.Shift}: replica " +
                  "key ranges would overlap — stage from an ORIGINAL " +
                  "fixture, never from replicated output")
            }
          }
          Replica(spark, df, keys, fac,
            perturbText = t == "documents",
            perturbEmbedding = t == "embeddings")
        case None => df // nation/region: small dims, FKs into them unshifted
      }
      FuzzGate.writeSingle(out, dst, t)
      println(s"STAGED $t x${keyCols.get(t).fold(1)(_ => fac)}")
    }
    spark.stop()
  }
}
