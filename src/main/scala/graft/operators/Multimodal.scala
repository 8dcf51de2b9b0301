package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (brief §extensions): image/audio/video
  * treated as opaque `binary` columns with typed metadata, batched
  * decode/feature-extract over partitions. The actual media decode is
  * STUBBED (no image/audio libs in this container) behind
  * [[StubDecoder]] — a deterministic fake — but the Spark-side shape is
  * real: binary column + metadata struct schema, partition-wise batch
  * processing via a typed `mapPartitions` (the Scala analog of
  * `mapInPandas`: one decoder init per partition, streamed rows), and a
  * columnar feature output suitable for the Similarity operators.
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte],
                      format: String, n_bytes: Long)
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
                           width: Int, height: Int,
                           features: Array[Float])

  /** ==== STUB ==== deterministic fake decoder standing in for a real
    * image/audio codec (libs absent in this container). Derives
    * "decoded" dimensions and a feature vector from the content alone,
    * so tests are reproducible; swap `decode` for a real codec call
    * (e.g. javax.imageio / ffmpeg bindings) in production. Expensive
    * per-row init is modeled by `open()` being called once per
    * partition, the pattern that matters at scale.
    *
    * The fake arithmetic is a mod-prime polynomial fold over the
    * content's code points — the same SQL-expressible construction as
    * `expressions.RollingImpl` — so the whole stub pipeline is
    * replayable in DuckDB and `m2_media_features` is oracle-checked
    * end to end (schema, batching, and values), not just row-counted. */
  class StubDecoder {
    final val Base = 1000003L
    final val Mod = 1000000007L
    def open(): Unit = () // real codec: load model / native lib here
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        h = (h * Base + cp) % Mod
        ci += Character.charCount(cp)
      }
      val width = (h % 640).toInt + 1
      val height = ((h / 640) % 480).toInt + 1
      val features = Array.tabulate(8)(i =>
        ((h * 31 + i * 2654435761L) % Base) / Base.toFloat)
      (width, height, features)
    }
  }

  /** Wrap a text table as a binary media table — the ingest shape for
    * opaque content (utf-8 bytes stand in for image bytes here). */
  def asMedia(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("media_id"),
      encode(col(textCol), "utf-8").as("content"),
      lit("txt").as("format"))
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))

  /** Batched decode/feature-extract: one decoder per partition, rows
    * pulled in `batchSize` groups (the mapInPandas batch shape — a real
    * codec amortizes per-batch setup/SIMD over the group), the
    * partition itself never materialized. Partitioning: inherit the
    * scan's splits — media decode is CPU-bound and embarrassingly
    * parallel, so the only scale knob is input split size, not shuffle. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "content", "format", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        val dec = new StubDecoder
        dec.open()
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, f) = dec.decode(r.content)
            MediaFeatures(r.media_id, r.n_bytes, r.format, w, h, f)
          }
        }
      }
  }

  /** Resize stage: clamp decoded dimensions to a bounding box
    * preserving aspect ratio (the thumbnail/downsample step of an image
    * pipeline; arithmetic is real, pixel work would live in the codec).
    * Columnar — no UDF needed once dimensions are columns. */
  def resize(features: Dataset[MediaFeatures], maxW: Int = 224,
             maxH: Int = 224): DataFrame = {
    val f = features.toDF()
    val scale = least(lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"), lit(1.0))
    f.select(col("media_id"), col("width"), col("height"),
      greatest(floor(col("width") * scale), lit(1)).cast("int").as("out_w"),
      greatest(floor(col("height") * scale), lit(1)).cast("int").as("out_h"))
  }

  /** Fixed-size binary chunking — the frame-sampling / windowing shape
    * for opaque media: split the payload into `chunkBytes` windows and
    * digest each (all on the binary column; `Substring` supports
    * BinaryType). A real pipeline would decode per chunk; the chunk
    * boundaries, counts and digests are the schema-level contract. */
  def mediaChunks(media: DataFrame, chunkBytes: Int = 64): DataFrame = {
    val n = col("n_bytes")
    val nChunks = ceil(n.cast("double") / chunkBytes).cast("long")
    media.select(col("media_id"), nChunks.as("n_chunks"),
        transform(sequence(lit(0L), nChunks - 1),
          i => md5(col("content").substr(
            (i * chunkBytes + 1).cast("int"), lit(chunkBytes))))
          .as("chunk_md5s"))
      .orderBy(col("media_id"))
  }

  /** Oracle-friendly metadata projection (no stubbed math): byte size
    * and content digest of the binary column. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("n_bytes"), col("format"),
      md5(col("content")).as("content_md5"))
      .orderBy(col("media_id"))
}
