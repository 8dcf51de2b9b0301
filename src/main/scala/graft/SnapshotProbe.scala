package graft

import org.apache.spark.sql.SparkSession

/** Snapshot/restore PARALLELISM probe — the round-11 verdict's task-2
  * done criterion: show repository wall-clock scaling with
  * max-file/threads, not Σ-files. The old implementation streamed
  * every blob through ONE driver thread (and paid one `exists` RPC
  * per reused blob); at a 100 TB artifact tree that serializes days
  * of byte traffic through a single core. This main builds a
  * deterministic synthetic tree (`files` × `mb` MB, content seeded by
  * index so md5 verification is real work), snapshots + restores it
  * with threads = 1 (the old serial shape) and threads = CopyThreads,
  * and reports wall-clock per arm. Expect io-bound local disks to cap
  * the speedup below the thread count — the honest number is the
  * measured ratio, and on object stores (per-request latency) the
  * gap widens toward the thread count.
  *
  * Env: SPARK_GRAFT_SNAP_FILES (default 256), SPARK_GRAFT_SNAP_MB
  * (default 4), SPARK_GRAFT_SCALE_OUT (default bench_snapshot.json).
  */
object SnapshotProbe {

  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_SNAP_FILES", "256").toInt
    val mb = sys.env.getOrElse("SPARK_GRAFT_SNAP_MB", "4").toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = java.nio.file.Files.createTempDirectory("graft-snapprobe-src")
    val buf = new Array[Byte](1 << 20)
    (0 until nFiles).foreach { i =>
      val sub = src.resolve(f"part=${i % 8}")
      java.nio.file.Files.createDirectories(sub)
      val ch = java.nio.file.Files.newOutputStream(
        sub.resolve(f"f$i%04d.bin"))
      try {
        var m = 0
        while (m < mb) {
          var b = 0
          while (b < buf.length) { buf(b) = ((i * 31 + m * 7 + b) & 0xff).toByte; b += 1 }
          ch.write(buf)
          m += 1
        }
      } finally ch.close()
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(threads: Int): (Double, Double) = {
      val repo = java.nio.file.Files
        .createTempDirectory(s"graft-snapprobe-repo$threads").toString
      val dest = java.nio.file.Files
        .createTempDirectory(s"graft-snapprobe-dest$threads").toString
      val snap = timed {
        graft.sources.Sink.snapshotIncremental(spark, src.toString, repo,
          "1", threads = threads)
      }
      val rest = timed {
        graft.sources.Sink.restoreSnapshot(spark, repo, "1", dest,
          threads = threads)
      }
      (snap, rest)
    }
    // warm the page cache once so both arms read warm bytes
    run(graft.sources.Sink.CopyThreads)
    val (s1, r1) = run(1)
    val (sN, rN) = run(graft.sources.Sink.CopyThreads)
    val line =
      f"""{"metric":"snapshot_probe","files":$nFiles,"mb_per_file":$mb,""" +
        f""""threads":${graft.sources.Sink.CopyThreads},""" +
        f""""snapshot_serial_sec":$s1%.3f,"snapshot_parallel_sec":$sN%.3f,""" +
        f""""restore_serial_sec":$r1%.3f,"restore_parallel_sec":$rN%.3f,""" +
        f""""snapshot_speedup":${s1 / math.max(sN, 1e-9)}%.2f,""" +
        f""""restore_speedup":${r1 / math.max(rN, 1e-9)}%.2f}"""
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "bench_snapshot.json")),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
