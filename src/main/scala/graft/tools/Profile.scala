package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev-only stage profiler: times named sub-plans of the slow bench queries
  * (count() each, like Bench) so optimization targets the measured stage,
  * not a guess. Not part of the engine surface.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <which>
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "prefix"
    val spark = graft.GraftSession.get()
    import org.apache.spark.sql.functions._
    graft.functions.TextFunctions.register(spark)
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    docs.count() // warm footer/JIT

    // whole-query steady-state mode: `<sfDir> queries <reps> <q1,q2,...>` —
    // per-rep seconds expose the cold-vs-warm JIT gap the Bench warmup tier
    // has to cover (single-shot driver measurements hide it).
    if (which == "queries") {
      val reps = args(2).toInt
      args(3).split(",").foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROFILE $q%-24s ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
      spark.stop()
      return
    }

    // interleaved config A/B: `<sfDir> confab <reps> <q1,q2,...> <k=v[;k=v]>`
    // — per query, alternate BASE / OVERRIDE reps in one JVM (steal waves
    // on a noisy host hit both arms alike); prints both arms' seconds.
    // Runtime-settable SQL confs only (join strategy, broadcast threshold,
    // AQE knobs). Rep 1 of each arm runs once untimed per query first so
    // codegen/JIT for BOTH plan shapes is paid before timing.
    if (which == "confab") {
      val reps = args(2).toInt
      val overrides = args(4).split(";").map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
      // keys prefixed `hadoop:` set the shared sparkContext
      // hadoopConfiguration (output committer etc.); the rest are runtime
      // SQL confs
      val hconf = spark.sparkContext.hadoopConfiguration
      def withConf[T](on: Boolean)(body: => T): T = {
        val (hOver, sOver) = overrides.partition(_._1.startsWith("hadoop:"))
        val prevS = sOver.map { case (k, _) => k -> spark.conf.getOption(k) }
        val prevH = hOver.map { case (k, _) =>
          val hk = k.stripPrefix("hadoop:"); hk -> Option(hconf.get(hk)) }
        if (on) {
          sOver.foreach { case (k, v) => spark.conf.set(k, v) }
          hOver.foreach { case (k, v) => hconf.set(k.stripPrefix("hadoop:"), v) }
        }
        try body
        finally {
          prevS.foreach {
            case (k, Some(v)) => spark.conf.set(k, v)
            case (k, None) => spark.conf.unset(k)
          }
          prevH.foreach {
            case (k, Some(v)) => hconf.set(k, v)
            case (k, None) => hconf.unset(k)
          }
        }
      }
      args(3).split(",").foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        withConf(on = false) { fn(spark, sfDir).count() } // warm base shape
        withConf(on = true) { fn(spark, sfDir).count() }  // warm override shape
        val (baseTs, overTs) = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          withConf(on = false) { fn(spark, sfDir).count() }
          val tBase = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          withConf(on = true) { fn(spark, sfDir).count() }
          val tOver = (System.nanoTime() - t1) / 1e9
          (tBase, tOver)
        }.unzip
        println(f"PROFILE $q%-24s base ${baseTs.map(t => f"$t%.2f").mkString(" ")}" +
          f"  min=${baseTs.min}%.2f")
        println(f"PROFILE $q%-24s over ${overTs.map(t => f"$t%.2f").mkString(" ")}" +
          f"  min=${overTs.min}%.2f")
      }
      spark.stop()
      return
    }

    which match {
      case "prefix" =>
        val s = docs.select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
          .withColumn("n_sh", size(col("hs")))
        time("shingle-only")(s.count())
        val posts = s.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("shingle"))
        time("posts")(posts.count())
        val dfs = posts.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, 128))
        time("dfs")(dfs.count())
        val eff = posts.join(dfs, "shingle")
        time("eff-join")(eff.count())
        val perDoc = eff.groupBy(col("doc_id"), col("n_sh"))
          .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("eord"))
          .withColumn("m", size(col("eord")))
          .withColumn("plen", col("m") - ceil(col("n_sh") * lit(0.5)).cast("int") + lit(1))
        time("perDoc")(perDoc.count())
        val prefixes = perDoc.filter(col("plen") >= 1)
          .select(col("doc_id"), col("n_sh"), col("m"),
            posexplode(expr("slice(eord, 1, plen)")).as(Seq("pos", "p")))
          .select(col("doc_id"), col("n_sh"), col("m"), col("pos"),
            col("p.shingle").as("shingle"))
        time("prefixes")(prefixes.count())
        val a = prefixes.alias("a"); val b = prefixes.alias("b")
        // mirror the query's PPJoin length+positional prunings (t = 0.5)
        val cand = a.join(b,
            col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
              col("b.n_sh") >= ceil(col("a.n_sh") * lit(0.5)) &&
              col("a.n_sh") >= ceil(col("b.n_sh") * lit(0.5)) &&
              (lit(1) + least(col("a.m") - col("a.pos") - 1, col("b.m") - col("b.pos") - 1)) >=
                ceil(lit(0.5) / 1.5 * (col("a.n_sh") + col("b.n_sh"))))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        time("cand-raw")(cand.count())
        val candD = cand.dropDuplicates("doc_a", "doc_b")
        time("cand-dedup")(candD.count())
        time("full-query")(graft.ops.Dedup.ngramJaccardPrefix(spark, sfDir).count())
      case "ngram" =>
        val s = docs.select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
          .withColumn("n_sh", size(col("hs")))
        val posts = s.select(col("doc_id"), col("n_sh"), explode(col("hs")).as("shingle"))
        time("posts")(posts.count())
        val grouped = posts.groupBy(col("shingle"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
          .filter(size(col("ds")).between(2, 128))
        time("grouped")(grouped.count())
        val pairs = grouped.select(explode(expr(
          """flatten(transform(ds, (a, i) ->
            |  transform(slice(ds, i + 2, size(ds)),
            |    b -> struct(a.doc_id AS doc_a, a.n_sh AS na,
            |                b.doc_id AS doc_b, b.n_sh AS nb))))""".stripMargin)).as("p"))
        time("pair-expand")(pairs.count())
        val agg = pairs.filter(col("p.doc_a") =!= col("p.doc_b"))
          .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
            col("p.na").as("na"), col("p.nb").as("nb"))
          .agg(count(lit(1)).as("c"))
        time("pair-agg")(agg.count())
        time("full-ngram")(graft.ops.Dedup.ngramJaccard(spark, sfDir).count())
        time("full-ngram-2")(graft.ops.Dedup.ngramJaccard(spark, sfDir).count())
      case "cluster" =>
        time("pairs-only")(graft.ops.Dedup.ngramJaccard(spark, sfDir).count())
        time("full-cluster")(graft.ops.Dedup.nearDupClusters(spark, sfDir).count())
      case "tfidf" =>
        val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        time("toks")(toks.count())
        val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        time("tf")(tf.count())
        val dfreq = toks.groupBy(col("token")).agg(count_distinct(col("doc_id")).as("df"))
        time("dfreq")(dfreq.count())
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
        time("scored")(scored.count())
        time("tfidf-1")(graft.SparkEntry.queries("q_tfidf")(spark, sfDir).count())
        time("tfidf-2")(graft.SparkEntry.queries("q_tfidf")(spark, sfDir).count())
      case "inclsh" =>
        // stage breakdown of IncrementalDedup.updateLsh's index build
        val src = spark.read.parquet(s"$sfDir/documents.parquet")
        val numHashes = 16; val bands = 8; val r = numHashes / bands
        val newSets = src
          .select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
          .withColumn("n_sh", size(col("hs")))
          .filter(col("n_sh") > 0)
          .select(col("doc_id"), array_sort(col("hs")).as("hs"), col("n_sh"))
        time("newSets")(newSets.count())
        val newBands = newSets
          .withColumn("sig", expr(s"graft_minhash_sig(hs, $numHashes)"))
          .withColumn("band", explode(expr(
            s"transform(sequence(0, ${bands - 1}), " +
              s"b -> named_struct('id', b, 'h', xxhash64(slice(sig, b * $r + 1, $r))))")))
          .select(col("doc_id"), col("band.id").as("band_id"), col("band.h").as("band_h"))
        time("newBands")(newBands.count())
        val cand = newBands.alias("a").join(newBands.alias("b"),
            col("a.band_id") === col("b.band_id") && col("a.band_h") === col("b.band_h") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        time("cand-raw")(cand.count())
        val candD = cand.dropDuplicates("doc_a", "doc_b")
        time("cand-dedup")(candD.count())
        val verified = candD
          .join(newSets.select(col("doc_id").as("doc_a"), col("hs").as("sha"),
            col("n_sh").as("na")), Seq("doc_a"))
          .join(newSets.select(col("doc_id").as("doc_b"), col("hs").as("shb"),
            col("n_sh").as("nb")), Seq("doc_b"))
          .withColumn("c", expr("graft_overlap_count(sha, shb)"))
          .withColumn("jaccard",
            round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4))
          .filter(col("jaccard") >= 0.5)
        time("verified")(verified.count())
        val st = s"/tmp/inclsh-profile-state"
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(st), true)
        time("writes")({
          newBands.write.mode("append").parquet(s"$st/bands")
          newSets.write.mode("append").parquet(s"$st/sets"); 0L
        })
        time("full-updateLsh")({
          org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(st), true)
          graft.ops.IncrementalDedup.updateLsh(spark, st, src).count()
        })
        time("oneshot-lsh")({
          graft.ops.Dedup.minhashLsh(spark,
            new java.io.File(s"$sfDir/documents.parquet").getParent).count()
        })
      case "incbatch" =>
        // batch-path breakdown: index 90%, then stage-time the 10% batch
        val src = spark.read.parquet(s"$sfDir/documents.parquet")
        val old = src.filter(col("doc_id") % 10 =!= 0)
        val batch = src.filter(col("doc_id") % 10 === 0)
        val st = "/tmp/incbatch-profile-state"
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(st), true)
        graft.ops.Dedup.minhashLsh(spark,
          new java.io.File(s"$sfDir/documents.parquet").getParent).count() // warm
        time("index-90pct")(graft.ops.IncrementalDedup.updateLsh(spark, st, old).count())
        val numHashes = 16; val bands = 8; val r = numHashes / bands
        val newSets = batch
          .select(col("doc_id"), expr("graft_shingle_hashes(text, 3)").as("hs"))
          .withColumn("n_sh", size(col("hs")))
          .filter(col("n_sh") > 0)
          .select(col("doc_id"), array_sort(col("hs")).as("hs"), col("n_sh"))
        val newBands = newSets
          .withColumn("sig", expr(s"graft_minhash_sig(hs, $numHashes)"))
          .withColumn("band", explode(expr(
            s"transform(sequence(0, ${bands - 1}), " +
              s"b -> named_struct('id', b, 'h', xxhash64(slice(sig, b * $r + 1, $r))))")))
          .select(col("doc_id"), col("band.id").as("band_id"), col("band.h").as("band_h"))
        val oldBands = spark.read.schema(
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, band_id INT, band_h BIGINT")).parquet(s"$st/bands")
        val oldSets = spark.read.schema(
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, hs ARRAY<BIGINT>, n_sh INT")).parquet(s"$st/sets")
        time("read-oldBands")(oldBands.count())
        time("read-oldSets")(oldSets.count())
        val allBands = oldBands.unionByName(newBands)
        val allSets = oldSets.unionByName(newSets)
        val cand = newBands.alias("a").join(allBands.alias("b"),
            col("a.band_id") === col("b.band_id") && col("a.band_h") === col("b.band_h") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        time("cand")(cand.count())
        val verified = cand
          .join(allSets.select(col("doc_id").as("doc_a"), col("hs").as("sha"),
            col("n_sh").as("na")), Seq("doc_a"))
          .join(allSets.select(col("doc_id").as("doc_b"), col("hs").as("shb"),
            col("n_sh").as("nb")), Seq("doc_b"))
          .withColumn("c", expr("graft_overlap_count(sha, shb)"))
          .withColumn("jaccard",
            round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4))
          .filter(col("jaccard") >= 0.5)
        time("verified")(verified.count())
        time("full-batch")(graft.ops.IncrementalDedup.updateLsh(spark, st, batch).count())
      case "incbucket" =>
        // bucketed vs flat sets layout on the operational shape: index all
        // but a small crawl batch, then time the batch whose verify read
        // should be pruned to its candidates' buckets. Pruning can only pay
        // when the batch (hence its candidate set) is small relative to the
        // corpus — the daily-crawl-vs-100TB shape — so measure a 10% batch
        // (pruning CANNOT win: candidates touch every bucket) and a 0.1%
        // batch (the realistic tier) side by side.
        val src = spark.read.parquet(s"$sfDir/documents.parquet")
        for ((frac, mod) <- Seq(("10pct", 10L), ("0.1pct", 1000L));
             (tag, buckets) <- Seq(("flat", 0), ("bucketed", 256))) {
          val old = src.filter(col("doc_id") % mod =!= 0)
          val batch = src.filter(col("doc_id") % mod === 0)
          val st = s"/tmp/incbucket-profile-$frac-$tag"
          org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(st), true)
          time(s"index-$frac-$tag")(graft.ops.IncrementalDedup.updateLsh(
            spark, st, old, batchId = Some(0L), buckets = buckets).count())
          time(s"batch-$frac-$tag")(graft.ops.IncrementalDedup.updateLsh(
            spark, st, batch, batchId = Some(1L), buckets = buckets).count())
        }
      case "cdcevolve" =>
        // per-lifecycle-stage breakdown of the r13 evolution query; run
        // twice so the cold-JVM share is visible per stage
        (1 to 2).foreach { rep =>
          val out = graft.ops.IngestFormats.cdcEvolveStaged(spark, sfDir,
            (name, f) => time(s"evolve-$rep-$name") { f(); 0L })
          time(s"evolve-$rep-final-read")(out.count())
        }
      case "cdcevolvejobs" =>
        // job-level anatomy of one warm evolution run (r15): per-Spark-job
        // wall + gaps, so lifecycle fixed costs (driver-side planning,
        // stream start/stop, fs protocol) separate from task time
        val listener = new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          @volatile private var lastEnd = 0L
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(js.jobId, js.time)
            val gap = if (lastEnd == 0) 0 else js.time - lastEnd
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(Option(js.properties)
                .flatMap(p => Option(p.getProperty("callSite.short"))))
              .getOrElse("?")
            println(f"JOBSTART ${js.jobId}%5d gap=${gap}%6d ms  $desc")
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val dur = je.time - starts.getOrDefault(je.jobId, je.time)
            lastEnd = je.time
            println(f"JOBEND   ${je.jobId}%5d dur=${dur}%6d ms")
          }
        }
        // one untimed warm pass first so codegen/JIT is out of the anatomy
        graft.ops.IngestFormats.cdcEvolveStaged(spark, sfDir,
          (_, f) => f()).count()
        spark.sparkContext.addSparkListener(listener)
        val out = graft.ops.IngestFormats.cdcEvolveStaged(spark, sfDir,
          (name, f) => time(s"evolvej-$name") { f(); 0L })
        time("evolvej-final-read")(out.count())
        spark.sparkContext.removeSparkListener(listener)
      case "prefixab" =>
        // same-JVM interleaved A/B of the perDoc materialization in the
        // PPJoin prefix tier (r15)
        Seq(("warm", true), ("off", false), ("on", true), ("off2", false),
          ("on2", true), ("off3", false), ("on3", true)).foreach {
          case (tag, on) =>
            time(s"prefix-$tag")(graft.ops.Dedup
              .ngramJaccardPrefix(spark, sfDir, materializePerDoc = on).count())
        }
      case "trainab" =>
        // same-JVM interleaved A/B of the r14 survivor materialization
        Seq(("warm", true), ("off", false), ("on", true), ("off2", false),
          ("on2", true), ("off3", false), ("on3", true)).foreach {
          case (tag, on) =>
            time(s"train-$tag")(graft.ops.TrainingPipeline
              .trainManifest(spark, sfDir, materializeSurvivors = on).count())
        }
      case "lpab" =>
        // same-JVM interleaved A/B of the labelProp aligned checkpoint
        Seq(("warm", true), ("off", false), ("on", true), ("off2", false),
          ("on2", true), ("off3", false), ("on3", true)).foreach {
          case (tag, on) =>
            time(s"lp-$tag")(graft.ops.Graph
              .labelProp(spark, sfDir, alignEdges = on).count())
        }
      case "prab" =>
        // same-JVM interleaved A/B of the pageRank aligned checkpoint
        Seq(("warm", true), ("off", false), ("on", true), ("off2", false),
          ("on2", true), ("off3", false), ("on3", true)).foreach {
          case (tag, on) =>
            time(s"pr-$tag")(graft.ops.Graph
              .pageRank(spark, sfDir, alignEdges = on).count())
        }
      case "pipeline" =>
        time("pipeline")(graft.SparkEntry.queries("q_dedup_pipeline")(spark, sfDir).count())
      case "streamlat" =>
        // per-batch wall + rows/s for the two continuous paths (judge r5
        // item 5); run with sfDir = sf0.01 for the x10 figure. Mirrors the
        // reference's insert->queryable latency probe (test_mysql.py:28).
        import graft.streaming.{DedupStream, StreamLatency}
        val root = "/tmp/streamlat-profile"
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(root), true)
        // streaming dedup: 8 crawl batches over the full documents table
        val d = docs.select(col("doc_id"), col("text"))
        val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
        val parts = (0 until 8).map { i =>
          val lo = maxId * i / 8; val hi = maxId * (i + 1) / 8
          d.filter(col("doc_id") >= lo &&
            (if (i == 7) lit(true) else col("doc_id") < hi))
        }
        DedupStream.stageBatches(s"$root/feed", parts, filesPerPart = 4)
        val dq = DedupStream.start(spark, s"$root/feed", s"$root/state",
          s"$root/pairs", s"$root/ckpt", maxFilesPerTrigger = Some(4))
        try dq.processAllAvailable() finally dq.stop()
        StreamLatency.stats(dq).foreach(s => println(
          f"PROFILE dedup-batch-${s.batchId}%-12d ${s.seconds}%8.3f s  " +
            f"rows=${s.inputRows}  ${s.rowsPerSec}%10.0f rows/s"))
        // CDC upsert: FeedGen demo feed scaled ~10x (2k users, 8 batches
        // of 400 events), drained through the full Pipeline
        import graft.cdc.{ParquetCdcSource, Pipeline}
        import graft.model.{PipelineConfig, SyncConfig}
        val lay = FeedGen.generate(spark, s"$root/cdc", nUsers = 2000,
          nBatches = 8, eventsPerBatch = 400)
        val sync = SyncConfig("users", pk = "id", full = true,
          schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
            "id INT, name STRING, score DOUBLE, updated TIMESTAMP")))
        val pipe = new Pipeline(spark, PipelineConfig(Seq(sync)),
          new ParquetCdcSource(spark, lay.feedDir, lay.tableDir), lay.sinkRoot)
        val cq = pipe.start(lay.ckptDir)
        try cq.processAllAvailable() finally cq.stop()
        StreamLatency.stats(cq).foreach(s => println(
          f"PROFILE cdc-batch-${s.batchId}%-14d ${s.seconds}%8.3f s  " +
            f"rows=${s.inputRows}  ${s.rowsPerSec}%10.0f rows/s"))
        // layered overhead: the bucketed layout, then incremental zone-map
        // maintenance on top — each the same feed, so per-batch deltas read
        // directly as the layer's cost
        Seq(
          ("bkt", PipelineConfig(Seq(sync), stateBuckets = Some(16))),
          ("bktzm", PipelineConfig(Seq(sync), stateBuckets = Some(16),
            zoneMapCols = Seq("score")))
        ).foreach { case (tag, cfg) =>
          val l2 = FeedGen.generate(spark, s"$root/cdc-$tag", nUsers = 2000,
            nBatches = 8, eventsPerBatch = 400)
          val p2 = new Pipeline(spark, cfg,
            new ParquetCdcSource(spark, l2.feedDir, l2.tableDir), l2.sinkRoot)
          val q2 = p2.start(l2.ckptDir)
          try q2.processAllAvailable() finally q2.stop()
          StreamLatency.stats(q2).foreach(s => println(
            f"PROFILE cdc-$tag-${s.batchId}%-10d ${s.seconds}%8.3f s  " +
              f"rows=${s.inputRows}  ${s.rowsPerSec}%10.0f rows/s"))
        }
      case q =>
        time(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
