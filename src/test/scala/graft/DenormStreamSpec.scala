package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.DenormStream

/** Streaming denorm ingest ≡ batch denorm: feeding the orders table
  * through the file-stream path must produce exactly the batch
  * documents. */
class DenormStreamSpec extends SparkSpec {

  test("stream-static denorm produces the same documents as batch") {
    val tmp = Files.createTempDirectory("graft-dstream").toFile
    val src = new java.io.File(tmp, "orders"); src.mkdirs()
    val out = new java.io.File(tmp, "docs")
    val ckpt = new java.io.File(tmp, "ckpt")

    // stage orders as two "arriving" chunks to exercise micro-batching
    val orders = Tables.orders(spark, sf)
    orders.filter(col("o_orderkey") % 2 === 0)
      .write.mode("append").parquet(src.getAbsolutePath)
    orders.filter(col("o_orderkey") % 2 === 1)
      .write.mode("append").parquet(src.getAbsolutePath)

    val q = DenormStream.ingest(spark, src.getAbsolutePath, sf,
      out.getAbsolutePath, ckpt.getAbsolutePath)
    q.awaitTermination(180000)

    val streamed = spark.read.parquet(out.getAbsolutePath)
    val batch = graft.operators.Denorm.docs(spark, sf)
    assert(streamed.count() == batch.count())
    // spot-check full-document equality on a sample of ids
    val ids = Seq(0L, 42L, 434L, 1075L)
    val s = streamed.filter(col("id").isin(ids: _*)).orderBy("id").collect()
    val b = batch.filter(col("id").isin(ids: _*)).orderBy("id").collect()
    assert(s.sameElements(b))
  }
}
