package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

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
    assert(new String(Files.readAllBytes(ready), "UTF-8").trim == "2 rev5")
    // the replicated corpus is real: 2x the base rows
    val baseDocs = spark.read.parquet(s"$base/documents.parquet").count()
    assert(spark.read.parquet(s"$out/documents.parquet").count()
      == 2 * baseDocs)

    // replica semantics (the union→crossJoin rewrite must preserve
    // them bit-for-bit): replica 0 is the base corpus verbatim;
    // replica 1 word-prefixes text (token streams disjoint), keeps
    // n_chars == length(text), Walsh-flips odd embedding elements
    // (popcount(i & 1)), and offsets FKs by the key stride
    val b = spark.read.parquet(s"$base/documents.parquet")
      .filter(col("doc_id") === 1L).select("text").head().getString(0)
    val r = spark.read.parquet(s"$out/documents.parquet")
    val dS = { var s = 10L
      val m = spark.read.parquet(s"$base/documents.parquet")
        .agg(max("doc_id")).head().getLong(0)
      while (s <= m) s *= 10; s }
    val rep0 = r.filter(col("doc_id") === 1L)
      .select("text").head().getString(0)
    assert(rep0 == b, "replica 0 must be the base corpus verbatim")
    val rep1 = r.filter(col("doc_id") === dS + 1L)
      .select(col("text"), col("n_chars")).head()
    assert(rep1.getString(0) == b.replaceAll("(\\p{L}+)", "r1x$1"),
      "replica 1 must word-prefix the text")
    assert(rep1.getLong(1) == rep1.getString(0).length.toLong,
      "n_chars must track the TAGGED text")
    val eb = spark.read.parquet(s"$base/embeddings.parquet")
      .filter(col("vec_id") === 1L).select("embedding").head()
      .getSeq[Float](0)
    // the vec_id stride is FLOORED at 10⁷ so replicas clear the 10⁶
    // ANN plant window (rev5) — the spec mirrors the floor
    val vS = { var s = 10L
      val m = spark.read.parquet(s"$base/embeddings.parquet")
        .agg(max("vec_id")).head().getLong(0)
      while (s <= m) s *= 10; math.max(s, 10000000L) }
    val er = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") === vS + 1L).select("embedding").head()
      .getSeq[Float](0)
    assert(er.zipWithIndex.forall { case (x, i) =>
      x == (if (i % 2 == 0) eb(i) else -eb(i)) },
      "replica 1 must Walsh-flip odd embedding elements")

    // events replicate horizontally: ×scale rows, replica users are
    // FRESH ids (stride-offset), the time window unchanged (rev2)
    val evBase = graft.Tables.events(spark, base)
    val evOut = graft.Tables.events(spark, out)
    assert(evOut.count() == 2 * evBase.count())
    val uS = { var s = 10L
      val m = evBase.agg(max("user_id")).head().getLong(0)
      while (s <= m) s *= 10; s }
    assert(evOut.agg(max("user_id")).head().getLong(0)
      == evBase.agg(max("user_id")).head().getLong(0) + uS)
    assert(evOut.agg(max("ts")).head().getTimestamp(0)
      == evBase.agg(max("ts")).head().getTimestamp(0),
      "the time window must not grow")

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
    assert(new String(Files.readAllBytes(ready), "UTF-8").trim == "3 rev5")
    assert(spark.read.parquet(s"$out/documents.parquet").count()
      == 3 * baseDocs)
    graft.operators.ArtifactGen.wipe(Paths.get(out))
  }
}
