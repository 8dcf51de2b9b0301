package graft

import java.nio.file.{Files, Paths}

/** BenchScale.replicate's `_READY` memo (the round-9 advisor flagged
  * it as never written — it IS written, last, after every table; this
  * spec locks the contract so the claim is checkable): a re-run at
  * the SAME scale is a no-op (no wipe, no rewrite — the ~13 s-at-10×
  * replication cost is paid once per corpus), while a DIFFERENT scale
  * invalidates and re-replicates. */
class BenchScaleSpec extends SparkSpec {

  test("replicate memo: same scale is a no-op, different scale re-replicates") {
    val base = "/root/testdata/sf0.001"
    assume(Files.exists(Paths.get(base)), s"$base not present")
    val out = Scratch.dir("benchscale_memo")

    BenchScale.replicate(spark, base, out, 2)
    val ready = Paths.get(out, "_READY")
    assert(Files.exists(ready), "_READY written after the last table")
    assert(new String(Files.readAllBytes(ready), "UTF-8").trim == "2")
    // the replicated corpus is real: 2x the base rows
    val baseDocs = spark.read.parquet(s"$base/documents.parquet").count()
    assert(spark.read.parquet(s"$out/documents.parquet").count()
      == 2 * baseDocs)

    // memo hit: nothing on disk is touched by a same-scale re-run
    val docsDir = Paths.get(out, "documents.parquet")
    val t0 = Files.getLastModifiedTime(docsDir)
    val r0 = Files.getLastModifiedTime(ready)
    BenchScale.replicate(spark, base, out, 2)
    assert(Files.getLastModifiedTime(docsDir) == t0,
      "same-scale re-run must not rewrite tables")
    assert(Files.getLastModifiedTime(ready) == r0,
      "same-scale re-run must not rewrite the marker")

    // a different scale misses the memo and re-replicates
    BenchScale.replicate(spark, base, out, 3)
    assert(new String(Files.readAllBytes(ready), "UTF-8").trim == "3")
    assert(spark.read.parquet(s"$out/documents.parquet").count()
      == 3 * baseDocs)
    graft.operators.ArtifactGen.wipe(Paths.get(out))
  }
}
