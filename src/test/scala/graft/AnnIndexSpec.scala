package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** The ANN index as a persisted ingest artifact (operators.AnnIndex):
  * one build job, many index families reading it. */
class AnnIndexSpec extends SparkSpec {

  private val probes = Seq(1L, 5L, 9L)

  private def plantedCorpus = {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    val planted = emb.filter(col("vec_id").isin(probes: _*))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
          .as("embedding"))
    emb.unionByName(planted)
  }

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("annix").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def allTrue(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.collect()
    assert(rows.length == probes.size)
    rows.foreach { r =>
      (1 until r.length).foreach(i =>
        assert(r.getBoolean(i), s"qid=${r.getLong(0)} col=$i (${df.columns(i)})"))
    }
  }

  test("one built artifact serves IVF, PQ, IVFPQ, and SQ8 queries") {
    val corpus = plantedCorpus
    val ix = AnnIndex.build(corpus, freshDir())
    // FOUR query families share the single trained artifact — none of
    // them trains or encodes anything
    allTrue(Similarity.ivfContractWith(corpus, ix.cents, ix.ivf(spark),
      probes, k = 10))
    allTrue(Similarity.pqContractWith(corpus, ix.pqCbs, ix.pqCodes(spark),
      probes, k = 10))
    allTrue(Similarity.ivfPqContractWith(corpus, ix.cents, ix.resCbs,
      ix.ivfPqCodes(spark), probes, k = 10))
    allTrue(Similarity.rerankContractWith(corpus, ix.sq8(spark),
      probes, k = 10))
  }

  test("artifact round-trips: load() equals the build's trained state") {
    val corpus = plantedCorpus
    val dir = freshDir()
    val built = AnnIndex.build(corpus, dir)
    val loaded = AnnIndex.load(spark, dir)
    assert(loaded.cents.map(_.toSeq).toSeq == built.cents.map(_.toSeq).toSeq)
    assert(loaded.pqCbs.map(_.map(_.toSeq).toSeq).toSeq ==
      built.pqCbs.map(_.map(_.toSeq).toSeq).toSeq)
    assert(loaded.resCbs.map(_.map(_.toSeq).toSeq).toSeq ==
      built.resCbs.map(_.map(_.toSeq).toSeq).toSeq)
    // the persisted artifact matches in-query training exactly: the
    // artifact-backed contract result equals the self-training one
    val a = Similarity.ivfContractWith(corpus, loaded.cents,
      loaded.ivf(spark), probes, k = 10).collect().map(_.toSeq).toSet
    val b = Similarity.ivfContract(corpus, probes, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("artifact-backed results equal self-training results (PQ/IVFPQ)") {
    val corpus = plantedCorpus
    val ix = AnnIndex.build(corpus, freshDir())
    assert(Similarity.pqContractWith(corpus, ix.pqCbs, ix.pqCodes(spark),
        probes, k = 10).collect().map(_.toSeq).toSet ==
      Similarity.pqContract(corpus, probes, k = 10)
        .collect().map(_.toSeq).toSet)
    assert(Similarity.ivfPqContractWith(corpus, ix.cents, ix.resCbs,
        ix.ivfPqCodes(spark), probes, k = 10).collect().map(_.toSeq).toSet ==
      Similarity.ivfPqContract(corpus, probes, k = 10)
        .collect().map(_.toSeq).toSet)
  }

  test("ivf table is cell-partitioned so probes prune files") {
    val corpus = plantedCorpus
    val ix = AnnIndex.build(corpus, freshDir())
    // partitionBy(cell) layout: one directory per cell on disk
    val cellDirs = new java.io.File(s"${ix.dir}/ivf").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "expected multiple cell= partitions")
    // a single-cell read plans a PartitionFilters prune, not a full scan
    val one = ix.ivf(spark).filter(col("cell") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell"), plan)
  }
}
