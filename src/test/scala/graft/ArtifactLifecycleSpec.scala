package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, TextIndex}

/** The generation-pointer artifact lifecycle (operators.ArtifactGen):
  * a rebuild of the SAME corpus version — e.g. after a torn-append
  * invalidation — must never rewrite a directory a stale reader still
  * holds. Interleaves ensure() with a stale `Loaded` and proves every
  * reader sees a WHOLLY-OLD or WHOLLY-NEW artifact, plus the in-JVM
  * memo eviction that makes "next ensure() rebuilds" true without a
  * JVM restart (the round-7 advisor finding). */
class ArtifactLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def wipe(root: java.nio.file.Path): Unit =
    graft.operators.ArtifactGen.wipe(root)

  test("text index: rebuild publishes a fresh generation; stale reader stays wholly-old") {
    val key = "lifecycle-spec-text"
    val root = TextIndex.rootFor(key)
    TextIndex.evictMemo(key)
    wipe(root)
    val docs1 = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val a = TextIndex.ensure(docs1, key)
    assert(a.dir.endsWith("gen-1"), a.dir)

    // a torn append invalidates: _DONE removed AND the memo evicted —
    // the SAME JVM must rebuild on the next ensure()
    TextIndex.invalidate(a)
    val docs2 = (1L to 5L).map(i => (i, s"delta epsilon d$i"))
      .toDF("doc_id", "text")
    val b = TextIndex.ensure(docs2, key)
    assert(b.dir != a.dir && b.dir.endsWith("gen-2"),
      s"rebuild must go to a fresh generation: ${a.dir} -> ${b.dir}")

    // the stale reader's generation is untouched and internally
    // consistent (its stats still describe its own postings)
    assert(a.doclen(spark).count() == 2L)
    assert(a.corpus(spark).head.getDouble(0) == 2.0)
    assert(a.postings(spark).select("doc_id").distinct().count() == 2L)
    // the new reader is wholly-new
    assert(b.doclen(spark).count() == 5L)
    assert(b.corpus(spark).head.getDouble(0) == 5.0)

    // a fresh JVM (memo evicted, disk intact) resolves the pointer to
    // the PUBLISHED generation — no rebuild (a rebuild would be gen-3)
    TextIndex.evictMemo(key)
    assert(TextIndex.ensure(docs2, key).dir == b.dir)
  }

  test("ann index: rebuild publishes a fresh generation; stale reader stays wholly-old") {
    val key = "lifecycle-spec-ann"
    val root = AnnIndex.rootFor(key)
    AnnIndex.evictMemo(key)
    wipe(root)
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = AnnIndex.ensure(corpus, key)
    assert(a.dir.endsWith("gen-1"), a.dir)
    val nIvf = a.ivf(spark).count()
    val nPq = a.pqCodes(spark).count()

    AnnIndex.invalidate(a)
    val b = AnnIndex.ensure(corpus, key)
    assert(b.dir != a.dir && b.dir.endsWith("gen-2"),
      s"rebuild must go to a fresh generation: ${a.dir} -> ${b.dir}")

    // stale reader: generation 1 untouched — every table still whole
    assert(a.ivf(spark).count() == nIvf)
    assert(a.pqCodes(spark).count() == nPq)
    assert(a.sq8(spark).count() == nIvf)

    AnnIndex.evictMemo(key)
    assert(AnnIndex.ensure(corpus, key).dir == b.dir)
  }
}
