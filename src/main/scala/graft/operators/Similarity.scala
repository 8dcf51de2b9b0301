package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over an embedding column (`Array[Float]`) —
  * SURVEY.md §7 M5. Two paths:
  *
  *  - brute-force cosine top-k: one scan, dot products via
  *    zip_with/aggregate (codegen'd builtins, no UDF), global top-k via
  *    orderBy+limit which Spark plans as `TakeOrderedAndProject` —
  *    partition-local top-k then a driver merge, so the full score
  *    column never shuffles. Correct baseline at any scale, O(n·d) work.
  *  - LSH-bucketed (random hyperplane signs → bucket): the scale path.
  *    Probing only the query's bucket (+ optionally neighboring probes)
  *    turns a full scan into a fraction-of-corpus scan, the standard
  *    SimHash-for-cosine construction. Hyperplanes are derived
  *    deterministically (seeded), so signatures are reproducible across
  *    runs and cluster sizes.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors of the vector with id
    * `queryId`. The 1-row query side is collected and inlined as a
    * literal (the degenerate broadcast join), so the corpus is scanned
    * exactly once with no shuffle. */
  def knnBrute(emb: DataFrame, queryId: Long, k: Int = 10): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head()
      .getSeq[Float](0).toArray
    val qc = lit(q)
    emb.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding").cast("array<double>"),
          qc.cast("array<double>")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random unit hyperplanes (seeded), used for
    * the LSH signature. */
  private def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: one bit per plane = sign of the
    * dot product. Vectors in the same bucket are likely cosine-close. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, lit(p)) > 0.0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k: restrict the scan to the query's LSH bucket, then exact
    * cosine rank inside it. With `nPlanes` bits, the corpus shrinks
    * ~2^nPlanes-fold; recall is tested against `knnBrute` in
    * SimilaritySpec. */
  def knnLsh(emb: DataFrame, queryId: Long, k: Int = 10,
             nPlanes: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val planes = hyperplanes(dim, nPlanes, seed)
    val bucketed = emb.withColumn("bucket",
      lshBucket(col("embedding").cast("array<double>"), planes))
    val qRow = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding"), col("bucket")).head()
    val q = qRow.getSeq[Float](0).toArray
    val qBucket = qRow.getLong(1)
    bucketed
      .filter(col("bucket") === qBucket && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding").cast("array<double>"),
          lit(q).cast("array<double>")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs (the 5th dedup variant of
    * the brief): LSH-bucket the corpus, compare only within buckets,
    * keep pairs with cosine ≥ threshold. At 100 TB the within-bucket
    * pair join replaces the impossible all-pairs cross join. */
  def cosineDupPairs(emb: DataFrame, threshold: Double = 0.95,
                     nPlanes: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val planes = hyperplanes(dim, nPlanes, seed)
    val b = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"),
        round(cosine(col("l.v"), col("r.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }
}
