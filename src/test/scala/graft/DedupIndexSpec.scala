package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupIndex}

/** The standing dedup index as a persisted artifact
  * (operators.DedupIndex): screening through the artifact must equal
  * the in-query standing frames it replaced, and the maintenance
  * append must give the idempotence a daily-ingest dedup service
  * relies on. */
class DedupIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val standing = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val batch = docs.filter(col("doc_id") % 10 === 0)

  test("artifact screening equals the in-query standing frames exactly") {
    val ix = DedupIndex.build(standing, Scratch.dir("dixspec"))
    val exactA = DedupIndex.screenExact(spark, ix, batch)
      .orderBy("doc_id").collect().toSeq
    val exactD = Dedup.incrementalExact(batch, Dedup.exact(standing))
      .orderBy("doc_id").collect().toSeq
    assert(exactA == exactD)
    val nearA = DedupIndex.screenNear(spark, ix, batch)
      .orderBy("doc_id").collect().toSeq
    val nearD = Dedup.incrementalMinhash(batch,
        Dedup.bandBuckets(standing), Dedup.withHashedShingleSet(standing))
      .orderBy("doc_id").collect().toSeq
    assert(nearA == nearD)
  }

  test("addBatch: survivors enter once; re-screen knows all; re-append is a no-op") {
    val ix = DedupIndex.build(standing, Scratch.dir("dixspec2"))
    val before = ix.fingerprints(spark).count()
    val (n1, fps1) = DedupIndex.addBatch(spark, ix, batch)
    assert(n1 > 0 && fps1 > 0 && fps1 <= n1)
    assert(ix.fingerprints(spark).count() == before + fps1)
    // idempotence: the same batch re-delivered screens entirely known
    // (exact AND near — the appended representatives carry bucket and
    // shingle rows too) and appends nothing
    assert(DedupIndex.screenExact(spark, ix, batch)
      .filter(col("is_new")).count() == 0L)
    assert(DedupIndex.screenNear(spark, ix, batch)
      .filter(col("is_new")).count() == 0L)
    val (n2, fps2) = DedupIndex.addBatch(spark, ix, batch)
    assert(n2 == 0L && fps2 == 0L)
    assert(ix.fingerprints(spark).count() == before + fps1)
  }
}
