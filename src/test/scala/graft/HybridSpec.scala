package graft

import org.apache.spark.sql.functions._
import graft.operators.{Search, TextIndex}

/** Hybrid BM25+vector retrieval with reciprocal-rank fusion
  * (Search.hybridRrf) — the fusion arithmetic and leg composition
  * checked independently of the h2 oracle replay. */
class HybridSpec extends SparkSpec {

  lazy val ix: TextIndex.Loaded = TextIndex.build(
    Tables.documents(spark, sf),
    java.nio.file.Files.createTempDirectory("hybix").toString)
  lazy val emb = Tables.embeddings(spark, sf)

  lazy val fused = Search.hybridRrf(spark, ix, emb,
    Seq("spark", "window"), probeId = 7L).collect()

  private def contrib(rank: Any): Long = rank match {
    case null => 0L
    case r: java.lang.Long => 1000000000L / (60L + r)
  }

  test("rrf score is the exact integer sum of the legs' contributions") {
    assert(fused.nonEmpty && fused.length <= 10)
    fused.foreach { row =>
      val expected = contrib(row.getAs[Any]("text_rank")) +
        contrib(row.getAs[Any]("vec_rank"))
      assert(row.getAs[Long]("rrf") == expected,
        s"fusion drifted from integer RRF on id ${row.getAs[Long]("id")}")
    }
  }

  test("output is ordered by (rrf desc, id) and ids are unique") {
    val keys = fused.map(r => (-r.getAs[Long]("rrf"), r.getAs[Long]("id")))
    assert(keys.sameElements(keys.sorted))
    assert(fused.map(_.getAs[Long]("id")).distinct.length == fused.length)
  }

  test("an empty text leg degrades to the pure vector ranking") {
    // terms absent from the corpus: the BM25 leg returns zero rows and
    // the full-outer fusion must yield exactly the vector leg's top-k,
    // ranked by its contribution alone — not an empty or erroring result
    val solo = Search.hybridRrf(spark, ix, emb,
      Seq("zzzznope", "qqqqnever"), probeId = 7L).collect()
    assert(solo.length == 10)
    solo.foreach { r =>
      assert(r.getAs[Any]("text_rank") == null)
      val vr = r.getAs[Long]("vec_rank")
      assert(r.getAs[Long]("rrf") == 1000000000L / (60L + vr))
    }
    val order = solo.map(_.getAs[Long]("vec_rank"))
    assert(order.sameElements(order.sorted))
  }

  test("text leg agrees with searchBm25Indexed's ranking") {
    val leg = Search.searchBm25Indexed(spark, ix, Seq("spark", "window"), 20)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    fused.foreach { row =>
      val id = row.getAs[Long]("id")
      assert(Option(row.getAs[Any]("text_rank"))
        .map(_.asInstanceOf[Long]) == leg.get(id),
        s"text_rank mismatch for id $id")
    }
  }

  test("vector leg ranks by the exact quantized dot product") {
    // independent single-partition recompute of the vector leg
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        // HALF_UP away from zero — the same tie rule as Spark round()
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val probe = rows.find(_._1 == 7L).get._2
    val ranked = rows
      .map { case (id, q) =>
        (id, q.zip(probe).map { case (a, b) => a * b }.sum)
      }
      .sortBy { case (id, dp) => (-dp, id) }
      .take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    fused.foreach { row =>
      val id = row.getAs[Long]("id")
      assert(Option(row.getAs[Any]("vec_rank"))
        .map(_.asInstanceOf[Long]) == ranked.get(id),
        s"vec_rank mismatch for id $id")
    }
    // the fused list must actually draw from both legs somewhere in
    // the corpus (a degenerate all-one-leg fixture would test nothing)
    assert(fused.exists(r => r.getAs[Any]("vec_rank") != null))
    assert(fused.exists(r => r.getAs[Any]("text_rank") != null))
  }
}
