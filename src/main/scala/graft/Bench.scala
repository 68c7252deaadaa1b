package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 runs first (unmeasured) so JIT/codegen/classload
  * cost lands there instead of inflating whichever measured query happens to
  * run first. Each query then runs `reps` times (default 3) and reports the
  * MINIMUM — on a shared box a single rep can catch a 10x contention spike
  * and record it as the official number (r1's q02 did exactly that). A query
  * that throws reports the string "err" instead of a bogus ~0s time. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dev-loop filter (regex on query name); the driver leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.findFirstIn(n).isDefined))
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory) {
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, warmupDir).count()
        catch { case _: Throwable => () }
      }
    }

    // name -> Right(min seconds over reps) | Left(error class)
    val results: Seq[(String, Either[String, Double])] = names.map { name =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => System.err.println(
          s"BENCH ERR $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
        }
      }
      // free dead localCheckpoint blocks before the next query: the
      // ContextCleaner only drops a checkpointed RDD's blocks after the
      // JVM GCs its reference, so without a nudge the blocks of 150+
      // earlier queries pile up in the block manager and the heavy
      // tail queries (q159) measure GC pressure, not their own plan
      // (observed 2x inflation in full-catalog runs vs solo).
      System.gc()
      name -> (if (times.isEmpty) Left("err") else Right(times.min))
    }
    // End-to-end medallion pipeline (ingest → silver → gold →
    // maintenance) — the reference's actual daily job
    // (reference: terraform/stepfunctions.tf:72-179), timed so pipeline
    // regressions hit the gate, not only ScalaTest. A fresh warehouse per
    // rep keeps every rep a cold full run. Reported as its own field, not
    // in `total`, so query totals stay comparable across rounds.
    def runPipeline(src: String): Double = {
      val root = java.nio.file.Files.createTempDirectory("graft_bench_wh_")
      val t0 = System.nanoTime()
      try {
        graft.pipeline.LakehousePipeline.run(spark, s"$src/events.parquet",
          graft.pipeline.Warehouse(root.toString))
        (System.nanoTime() - t0) / 1e9
      } finally {
        // fresh warehouse per rep; don't let 20 rounds of bench runs
        // accumulate dead warehouses in the temp dir
        graft.util.Fs.deleteRecursively(root.toFile)
      }
    }
    if (new java.io.File(warmupDir).isDirectory) {
      try runPipeline(warmupDir) catch { case _: Throwable => () }
    }
    val pipeTimes = (1 to reps).flatMap { _ =>
      try Some(runPipeline(sfDir))
      catch { case e: Throwable => System.err.println(
        s"BENCH ERR pipeline_e2e: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
      }
    }
    val pipeJson =
      if (pipeTimes.isEmpty) "\"err\"" else pipeTimes.min.toString

    // End-to-end training-corpus prep (lang/quality filter → exact dedup →
    // near-dup dedup → context chunking → 512-token packing → parquet) —
    // the composed LLM-data path, timed cold per rep like pipeline_e2e so
    // the extension surface's throughput regressions also hit the gate.
    def runCorpus(src: String): Double = {
      import org.apache.spark.sql.functions._
      val out = java.nio.file.Files.createTempDirectory("graft_bench_corpus_")
      val t0 = System.nanoTime()
      try {
        val docs = Tables.load(spark, src, "documents")
        val cleaned = graft.operators.DocPipeline
          .clean(docs, "doc_id", "text", collectStats = false).cleaned
        val chunks = cleaned.select(col("doc_id"),
          posexplode(graft.expressions.GraftFunctions.tokenChunks(
            graft.functions.TextFunctions.tokens(col("text")), 50, 40))
            .as(Seq("chunk_id", "chunk")))
          .select(
            (col("doc_id") * 1000 + col("chunk_id")).as("cid"),
            (col("doc_id") % 8).cast("int").as("shard"),
            col("chunk"),
            size(split(col("chunk"), "\\s+")).as("n_tokens"))
        graft.operators.Packing
          .packBins(chunks, "cid", "n_tokens", Seq("shard"), 512)
          .write.mode("overwrite").parquet(out.toString + "/packed")
        (System.nanoTime() - t0) / 1e9
      } finally graft.util.Fs.deleteRecursively(out.toFile)
    }
    if (new java.io.File(warmupDir).isDirectory) {
      try runCorpus(warmupDir) catch { case _: Throwable => () }
    }
    val corpusTimes = (1 to reps).flatMap { _ =>
      try Some(runCorpus(sfDir))
      catch { case e: Throwable => System.err.println(
        s"BENCH ERR corpus_e2e: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
      }
    }
    val corpusJson =
      if (corpusTimes.isEmpty) "\"err\"" else corpusTimes.min.toString

    // The keeper-policy pipeline (keepBestQuality = true: score once,
    // keep the best copy per near-dup cluster — the C4/RefinedWeb
    // policy) as its own gate, so the keeper path has a perf budget
    // separate from corpus_e2e's min-id policy and regressions in the
    // scoring/cluster-max machinery surface here.
    def runCorpusBest(src: String): Double = {
      val out = java.nio.file.Files
        .createTempDirectory("graft_bench_corpus_best_")
      val t0 = System.nanoTime()
      try {
        val docs = Tables.load(spark, src, "documents")
        graft.operators.DocPipeline
          .clean(docs, "doc_id", "text",
            graft.operators.DocPipeline.Config(keepBestQuality = true),
            collectStats = false)
          .cleaned
          .write.mode("overwrite").parquet(out.toString + "/cleaned")
        (System.nanoTime() - t0) / 1e9
      } finally graft.util.Fs.deleteRecursively(out.toFile)
    }
    if (new java.io.File(warmupDir).isDirectory) {
      try runCorpusBest(warmupDir) catch { case _: Throwable => () }
    }
    val corpusBestTimes = (1 to reps).flatMap { _ =>
      try Some(runCorpusBest(sfDir))
      catch { case e: Throwable => System.err.println(
        s"BENCH ERR corpus_best_e2e: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
      }
    }
    val corpusBestJson =
      if (corpusBestTimes.isEmpty) "\"err\"" else corpusBestTimes.min.toString

    // Image corpus e2e: synthesize one REAL PNG per document row (cell
    // patterns, ~10 copies per pattern), then run the real decode →
    // perceptual hash → guarded Hamming join → cluster dedup path. The
    // whole image family under one timed gate, at sf-proportional scale.
    def runImage(src: String): Double = {
      import spark.implicits._
      val t0 = System.nanoTime()
      val docs = Tables.load(spark, src, "documents").select("doc_id")
      val imgs = docs.as[Long].map { id =>
        val (w, h) = ((id % 3).toInt: @unchecked) match {
          case 0 => (36, 32)
          case 1 => (72, 64)
          case _ => (45, 40)
        }
        (id, graft.multimodal.Images.cellPatternPng(id % 500, w, h))
      }.toDF("image_id", "content")
      val hashes = graft.multimodal.Images
        .hashImages(imgs, "image_id", "content").localCheckpoint()
      graft.multimodal.Images.dedupByContent(hashes).count()
      (System.nanoTime() - t0) / 1e9
    }
    if (new java.io.File(warmupDir).isDirectory) {
      try runImage(warmupDir) catch { case _: Throwable => () }
    }
    val imageTimes = (1 to reps).flatMap { _ =>
      try Some(runImage(sfDir))
      catch { case e: Throwable => System.err.println(
        s"BENCH ERR image_e2e: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
      }
    }
    val imageJson =
      if (imageTimes.isEmpty) "\"err\"" else imageTimes.min.toString

    // ANN serving e2e: fit coarse IVF + PQ codebooks, materialize the
    // cluster-partitioned IVF-PQ codes index, then run a batch of
    // pruned-ADC + exact-refine probes — the full build+serve path of
    // the billion-scale layout under one timed gate.
    def runAnn(src: String): Double = {
      import org.apache.spark.sql.functions._
      val out = java.nio.file.Files.createTempDirectory("graft_bench_ann_")
      val t0 = System.nanoTime()
      try {
        val emb = Tables.load(spark, src, "embeddings")
        val coarse = graft.operators.Ivf.fit(emb, "vec_id", "embedding",
          k = 8, iters = 3)
        val pq = graft.operators.Pq.fit(emb, "vec_id", "embedding",
          m = 8, k = 16, iters = 3)
        val idx = out.toString + "/ivfpq"
        graft.operators.Pq.writeIvfPqIndex(emb, "vec_id", "embedding",
          coarse, pq, idx)
        val probes = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
        probes.foreach { case (qid, q) =>
          graft.operators.Pq.topKRefinedIndexed(spark, idx, emb, "vec_id",
            "embedding", pq, coarse, q, qid, k = 10, candidates = 100,
            nProbe = 2).count()
        }
        (System.nanoTime() - t0) / 1e9
      } finally graft.util.Fs.deleteRecursively(out.toFile)
    }
    if (new java.io.File(warmupDir).isDirectory) {
      try runAnn(warmupDir) catch { case _: Throwable => () }
    }
    val annTimes = (1 to reps).flatMap { _ =>
      try Some(runAnn(sfDir))
      catch { case e: Throwable => System.err.println(
        s"BENCH ERR ann_e2e: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
      }
    }
    val annJson =
      if (annTimes.isEmpty) "\"err\"" else annTimes.min.toString

    // End-to-end incremental gold maintenance: versioned gold commit,
    // a day's increment merged in O(day) (exact sums + HLL distinct +
    // KLL quantile sketches), rollback safety net exercised — the daily
    // maintenance story as one timed gate.
    def runGold(src: String): Double = {
      import org.apache.spark.sql.functions._
      val out = java.nio.file.Files.createTempDirectory("graft_bench_gold_")
      val t0 = System.nanoTime()
      try {
        val ev = Tables.load(spark, src, "events")
          .select(to_date(col("ts")).as("event_date"), col("user_id"),
            col("value"))
        val cut = ev.select(max(col("event_date"))).head.getDate(0)
        val cutoff = java.time.LocalDate.parse(cut.toString).minusDays(2)
        def aggOf(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("event_date"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).as("v"),
            hll_sketch_agg(col("user_id")).as("users"),
            org.apache.spark.sql.graft.KllFunctions
              .kllAgg(col("value").cast("double"), 200).as("vq"))
        val table = out.toString + "/gold"
        val hist = ev.filter(col("event_date") < lit(cutoff.toString))
        val inc = ev.filter(col("event_date") >= lit(cutoff.toString))
        graft.pipeline.VersionedTable.write(aggOf(hist), table)
        val merged = graft.pipeline.IncrementalAgg.mergeWithSketches(
          graft.pipeline.VersionedTable.read(spark, table), aggOf(inc),
          keys = Seq("event_date"), sums = Seq("n", "v"),
          sketches = Seq("users"), kllSketches = Seq("vq"))
        graft.pipeline.VersionedTable.write(merged, table)
        graft.pipeline.VersionedTable.read(spark, table).count()
        (System.nanoTime() - t0) / 1e9
      } finally graft.util.Fs.deleteRecursively(out.toFile)
    }
    if (new java.io.File(warmupDir).isDirectory) {
      try runGold(warmupDir) catch { case _: Throwable => () }
    }
    val goldTimes = (1 to reps).flatMap { _ =>
      try Some(runGold(sfDir))
      catch { case e: Throwable => System.err.println(
        s"BENCH ERR gold_e2e: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
      }
    }
    val goldJson =
      if (goldTimes.isEmpty) "\"err\"" else goldTimes.min.toString

    val qs = results.map {
      case (k, Right(v)) => "\"" + k + "\":" + v
      case (k, Left(_))  => "\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val errs = (results.collect { case (k, Left(_)) => "\"" + k + "\"" } ++
      (if (pipeTimes.isEmpty) Seq("\"pipeline_e2e\"") else Nil) ++
      (if (corpusTimes.isEmpty) Seq("\"corpus_e2e\"") else Nil) ++
      (if (corpusBestTimes.isEmpty) Seq("\"corpus_best_e2e\"") else Nil) ++
      (if (imageTimes.isEmpty) Seq("\"image_e2e\"") else Nil) ++
      (if (annTimes.isEmpty) Seq("\"ann_e2e\"") else Nil) ++
      (if (goldTimes.isEmpty) Seq("\"gold_e2e\"") else Nil))
      .mkString("[", ",", "]")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"errors":$errs,"pipeline_e2e":$pipeJson,"corpus_e2e":$corpusJson,"corpus_best_e2e":$corpusBestJson,"image_e2e":$imageJson,"ann_e2e":$annJson,"gold_e2e":$goldJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    // An erroring query must fail the run: its 0-contribution would
    // otherwise make a regression-to-throw read as a faster total.
    val nErrs = results.count(_._2.isLeft) +
      Seq(pipeTimes, corpusTimes, corpusBestTimes, imageTimes, annTimes,
        goldTimes)
        .count(_.isEmpty)
    if (nErrs > 0) {
      System.err.println(s"BENCH FAILED: $nErrs entries errored")
      sys.exit(2)
    }
  }
}
