package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sampled recall@k probe for the IVF serving path — both the routing
  * approximation AND the nprobe operating point.
  *
  * Routing above [[graft.functions.Centroids.RouteThreshold]] cells is
  * SEMANTICS-CHANGING (only the best `RouteBeam` top groups' member
  * cells are scanned when ranking probe cells), and the planted-copy
  * contract (n4) can't see a recall regression if the plant lands in
  * an easy cell. This main measures it directly, the way FAISS
  * benchmarks a coarse quantizer: sample Q query vectors
  * deterministically (xxhash64 order — same discipline as the
  * training sample), compute exact brute-force top-k ground truth,
  * then run the SAME centroids + query set through
  *
  *  - the ROUTED serving pipeline (routed assignment + routed probe —
  *    exactly what [[graft.operators.AnnIndex.build]] ships at scale),
  *  - the FLAT control arm ([[graft.operators.Similarity
  *    .knnIvfBatchWithFlat]] — routing forced off on both sides),
  *
  * and report mean recall@k of each arm against ground truth plus the
  * routed/flat ratio, PER nprobe value. Two acceptance bars:
  *
  *  - routed ≥ 0.95 × flat (round-11 task 5): the beam approximation
  *    costs at most 5% of what IVF-with-exact-cell-ranking achieves
  *    at the same nprobe;
  *  - absolute routed recall ≥ 0.9 at the SERVING operating point
  *    (round-12 verdict task 1): the round-12 probe showed the fixed
  *    nprobe = 4 itself had drifted to 0.68–0.69 absolute at ×100 —
  *    both arms, so the operating point, not the routing, was wrong.
  *    The serving default is now [[graft.operators.AnnIndex
  *    .nprobeFor]] (≈√nlist); this probe sweeps the curve around it.
  *
  * Env: SPARK_GRAFT_SF_DIR (corpus dir), SPARK_GRAFT_RECALL_Q
  * (queries, default 64), SPARK_GRAFT_RECALL_K (default 10),
  * SPARK_GRAFT_RECALL_NPROBE (comma-separated sweep; default "auto" =
  * the serving default nprobeFor(nlist), plus the legacy 4 for the
  * drift comparison), SPARK_GRAFT_SCALE_OUT (output file, default
  * bench_recall.json).
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = sys.env.getOrElse("SPARK_GRAFT_RECALL_Q", "64").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the index's own corpus (embeddings + the n4 plants) so ground
    // truth and both arms rank the identical universe
    val emb = SparkEntry.annPlantedCorpus(spark, dir)
    val n = emb.count()
    val ix = SparkEntry.annIndexFor(spark, dir)
    val nlist = ix.cents.length
    val serving = operators.AnnIndex.nprobeFor(nlist)
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_RECALL_NPROBE", "auto")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .flatMap {
        case "auto" => Seq(4, serving).distinct // legacy vs serving point
        case s => Seq(s.toInt)
      }.distinct.sorted

    // deterministic query sample — hash-ordered like every other
    // bounded sample in the repo
    val qids = emb.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(q).select("vec_id").collect().map(_.getLong(0)).toSeq

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (id, rows) =>
          id -> rows.map(_.getLong(1)).toSet }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val gt = topSets(operators.Similarity.knnBruteBatch(emb, qids, k))
    def recall(arm: Map[Long, Set[Long]]): Double = {
      val per = qids.map { id =>
        val g = gt.getOrElse(id, Set.empty)
        if (g.isEmpty) 1.0
        else arm.getOrElse(id, Set.empty).count(g).toDouble / g.size
      }
      per.sum / per.size
    }

    val rows = nprobes.map { nprobe =>
      val (routed, routedSec) = timed(topSets(
        operators.Similarity.knnIvfBatchAssigned(
          emb, ix.ivf(spark), ix.cents, qids, k, nprobe)))
      val (flat, flatSec) = timed(topSets(
        operators.Similarity.knnIvfBatchWithFlat(
          emb, ix.cents, qids, k, nprobe)))
      val rFlat = recall(flat)
      val rRouted = recall(routed)
      val ratio = if (rFlat > 0) rRouted / rFlat else 1.0
      val row = f"""{"nprobe":$nprobe,"serving_default":${nprobe == serving},""" +
        f""""recall_flat":$rFlat%.4f,"recall_routed":$rRouted%.4f,""" +
        f""""routed_over_flat":$ratio%.4f,""" +
        f""""routed_sec":$routedSec%.2f,"flat_sec":$flatSec%.2f}"""
      System.err.println(s"[recall] $row")
      row
    }
    val line =
      f"""{"metric":"recall_probe","dir":"$dir","n":$n,"nlist":$nlist,""" +
        f""""routing_active":${nlist >= graft.functions.Centroids.RouteThreshold},""" +
        f""""q":$q,"k":$k,"serving_nprobe":$serving,""" +
        f""""sweep":${rows.mkString("[", ",", "]")}}"""
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "bench_recall.json")),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
