package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (brief §extensions): image/audio/video
  * treated as opaque `binary` columns with typed metadata, batched
  * decode/feature-extract over partitions via [[MediaDecoder]] — a
  * REAL from-scratch 24-bit BMP parser for `format = "bmp"`, a
  * documented deterministic stub for codecs whose libraries are absent
  * in this container. The Spark-side shape is real either way: binary
  * column + metadata struct schema, partition-wise batch processing
  * via a typed `mapPartitions` (the Scala analog of `mapInPandas`: one
  * decoder init per partition, streamed rows), and a columnar feature
  * output suitable for the Similarity operators.
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte],
                      format: String, n_bytes: Long)
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
                           width: Int, height: Int,
                           features: Array[Float])

  /** Per-partition media decoder. Dispatches on the typed `format`
    * column:
    *
    *  - `"bmp"` — a REAL decode path: a from-scratch parser for the
    *    public BMP format (24-bit uncompressed, BITMAPINFOHEADER —
    *    little-endian dims at offsets 18/22, pixel rows bottom-up and
    *    4-byte padded, BGR byte order). Features are exact pixel
    *    statistics: per-channel mean and max, aspect, bit depth.
    *  - anything else — ==== STUB ==== a deterministic fake standing
    *    in for codecs whose libraries are absent in this container
    *    (JPEG/PNG/audio); swap for javax.imageio / ffmpeg bindings in
    *    production. The fake arithmetic is a mod-prime polynomial fold
    *    over the content's code points — the same SQL-expressible
    *    construction as `expressions.RollingImpl` — so even the stub
    *    path is replayable in DuckDB and oracle-checked end to end.
    *
    * Expensive init is modeled by `open()` being called once per
    * partition, the pattern that matters at scale. */
  class MediaDecoder {
    final val Base = 1000003L
    final val Mod = 1000000007L
    def open(): Unit = () // real codec: load model / native lib here

    def decode(format: String, bytes: Array[Byte]): (Int, Int, Array[Float]) =
      if (format == "bmp") decodeBmp(bytes) else decodeStub(bytes)

    /** 24-bit uncompressed BMP: header-declared dims; features are
      * [meanB, meanG, meanR, maxB, maxG, maxR] / 255, w/(w+h), bpp/32.
      * Unsupported variants (other depths / compressed) degrade to
      * header dims with zero features rather than failing the batch. */
    private def decodeBmp(b: Array[Byte]): (Int, Int, Array[Float]) = {
      // degrade, never throw: one corrupt row must not kill the batch
      if (b.length < 54) return (0, 0, new Array[Float](8))
      def i32(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      def i16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      val dataOff = i32(10)
      val w = i32(18)
      val h = math.abs(i32(22)) // negative height = top-down row order
      val bpp = i16(28)
      val compression = i32(30)
      if (bpp != 24 || compression != 0 || w <= 0 || h <= 0)
        return (w, h, new Array[Float](8))
      // truncated pixel payload / bogus data offset: header dims, no stats
      val rowBytes = ((w.toLong * 3 + 3) / 4) * 4
      if (dataOff < 0 || dataOff + rowBytes * h > b.length)
        return (w, h, new Array[Float](8))
      val rowSize = ((w * 3 + 3) / 4) * 4
      val sums = new Array[Long](3)
      val maxs = new Array[Int](3)
      var r = 0
      while (r < h) {
        var x = 0
        while (x < w) {
          val p = dataOff + r * rowSize + 3 * x
          var c = 0
          while (c < 3) {
            val v = b(p + c) & 0xFF
            sums(c) += v
            if (v > maxs(c)) maxs(c) = v
            c += 1
          }
          x += 1
        }
        r += 1
      }
      val n = w.toLong * h
      ( w, h,
        Array(
          (sums(0) / (n * 255.0)).toFloat, (sums(1) / (n * 255.0)).toFloat,
          (sums(2) / (n * 255.0)).toFloat,
          maxs(0) / 255.0f, maxs(1) / 255.0f, maxs(2) / 255.0f,
          w.toFloat / (w + h), bpp / 32.0f))
    }

    /** Average-hash (aHash) — the classic perceptual image fingerprint:
      * box-pool the image to a `grid`×`grid` gray grid, set bit i when
      * cell i's mean exceeds the global mean. Identical for the same
      * picture at different resolutions (that is the point: byte-exact
      * dedup can't see a rescaled copy, aHash can). BMP rows hash real
      * pixels; stub rows hash the same deterministic pseudo-grid the
      * stub features come from (SQL-replayable, so the oracle covers
      * both paths). Flat images hash to 0 — the documented aHash
      * degenerate case (no cell exceeds the mean). */
    def aHash(format: String, bytes: Array[Byte], grid: Int = 4): Long =
      if (format == "bmp") aHashBmp(bytes, grid) else aHashStub(bytes, grid)

    private def aHashBmp(b: Array[Byte], grid: Int): Long = {
      if (b.length < 54) return 0L
      def i32(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      def i16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      val dataOff = i32(10)
      val w = i32(18)
      val rawH = i32(22)
      val h = math.abs(rawH)
      if (i16(28) != 24 || i32(30) != 0 || w <= 0 || h <= 0) return 0L
      val rowSize = ((w * 3 + 3) / 4) * 4
      if (dataOff < 0 || dataOff + rowSize.toLong * h > b.length) return 0L
      // gray as the (b+g+r) sum — scaling by 1/3 cancels in comparisons
      val cellSum = new Array[Long](grid * grid)
      val cellCnt = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        // normalize orientation to image rows FROM THE TOP: positive
        // header height means file rows run bottom-up, negative
        // top-down — unlike the per-channel stats (orientation-
        // invariant), grid cells are positional, and skipping this
        // flip would hash the same picture differently per encoding
        val imageRow = if (rawH < 0) y else h - 1 - y
        val cy = (imageRow.toLong * grid / h).toInt
        var x = 0
        while (x < w) {
          val p = dataOff + y * rowSize + 3 * x
          val g = (b(p) & 0xFF) + (b(p + 1) & 0xFF) + (b(p + 2) & 0xFF)
          val c = cy * grid + (x.toLong * grid / w).toInt
          cellSum(c) += g
          cellCnt(c) += 1
          x += 1
        }
        y += 1
      }
      val total = cellSum.sum.toDouble / cellSum.indices.map(cellCnt).sum
      var hash = 0L
      var i = 0
      while (i < grid * grid) {
        if (cellCnt(i) > 0 && cellSum(i).toDouble / cellCnt(i) > total)
          hash |= 1L << i
        i += 1
      }
      hash
    }

    private def aHashStub(bytes: Array[Byte], grid: Int): Long = {
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        h = (h * Base + cp) % Mod
        ci += Character.charCount(cp)
      }
      val n = grid * grid
      val cells = Array.tabulate(n)(i => (h * 31 + i * 2654435761L) % Base)
      val mean = cells.sum.toDouble / n
      cells.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v.toDouble > mean) acc | (1L << i) else acc
      }
    }

    private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
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

  /** Minimal 24-bit uncompressed BMP writer (the public
    * BITMAPFILEHEADER + BITMAPINFOHEADER layout) — used to plant
    * byte-exact binary fixtures whose decoded statistics are
    * hand-computable. `bgr` is row-major bottom-up, matching the
    * format's native row order. */
  def makeBmp(width: Int, height: Int, bgr: Seq[(Int, Int, Int)],
              topDown: Boolean = false): Array[Byte] = {
    require(bgr.length == width * height, "pixel count != w*h")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val size = 54 + rowSize * height
    val out = new Array[Byte](size)
    def w32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def w16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, size); w32(10, 54) // file size, pixel-data offset
    w32(14, 40); w32(18, width) // BITMAPINFOHEADER
    w32(22, if (topDown) -height else height) // negative = top-down rows
    w16(26, 1); w16(28, 24) // planes, bpp
    w32(34, rowSize * height) // image size (compression stays 0)
    bgr.zipWithIndex.foreach { case ((bb, g, r), i) =>
      // `bgr` rows arrive bottom-up; a top-down file stores them flipped
      val fileRow = if (topDown) height - 1 - (i / width) else i / width
      val p = 54 + fileRow * rowSize + 3 * (i % width)
      out(p) = bb.toByte; out(p + 1) = g.toByte; out(p + 2) = r.toByte
    }
    out
  }

  /** Planted BMP fixtures for the feature-extraction contract: real
    * binary images built by [[makeBmp]], chosen so every decoded
    * statistic is an exact binary fraction — the oracle carries the
    * hand-computed values as literals. */
  def bmpFixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val red2x2 = makeBmp(2, 2, Seq.fill(4)((0, 0, 255)))
    val black3x1 = makeBmp(3, 1, Seq.fill(3)((0, 0, 0)))
    Seq((-1L, red2x2, "bmp", red2x2.length.toLong),
        (-2L, black3x1, "bmp", black3x1.length.toLong))
      .toDF("media_id", "content", "format", "n_bytes")
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
        val dec = new MediaDecoder
        dec.open()
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, f) = dec.decode(r.format, r.content)
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

  case class MediaHash(media_id: Long, phash: Long)

  /** Planted fixtures for the perceptual-hash contract: the SAME
    * left-white/right-black picture at 4×4 and 8×8 (different bytes,
    * equal aHash — the rescaled-copy case byte dedup misses) and its
    * inversion (different aHash). Grid cells: white column halves beat
    * the global mean → bits 0x3333 row-wise; inverted → 0xCCCC. */
  /** Left/right-half test picture (shared by fixtures and specs so the
    * planted image and the tested image cannot drift apart). */
  private[graft] def halfImage(w: Int, h: Int, leftWhite: Boolean,
                               topDown: Boolean = false): Array[Byte] =
    makeBmp(w, h, (0 until w * h).map { i =>
      val left = (i % w) < w / 2
      if (left == leftWhite) (255, 255, 255) else (0, 0, 0)
    }, topDown)

  def phashFixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((-11L, halfImage(4, 4, leftWhite = true)),
        (-12L, halfImage(8, 8, leftWhite = true)),
        (-13L, halfImage(4, 4, leftWhite = false)))
      .map { case (id, b) => (id, b, "bmp", b.length.toLong) }
      .toDF("media_id", "content", "format", "n_bytes")
  }

  /** M6: perceptual near-dup detection over a media corpus — aHash per
    * row (batched per-partition decode, same shape as
    * [[extractFeatures]]), then hash-exact grouping: every row resolves
    * to the lowest media_id sharing its perceptual hash. One shuffle on
    * the 8-byte hash; a rescaled copy of an image lands in the same
    * group even though its bytes (and md5) differ. */
  def phashDedup(spark: SparkSession, media: DataFrame,
                 grid: Int = 4, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val hashed = media.select("media_id", "content", "format", "n_bytes")
      .as[MediaRow]
      .mapPartitions { rows =>
        val dec = new MediaDecoder
        dec.open()
        rows.grouped(batchSize).flatMap(_.map(r =>
          MediaHash(r.media_id, dec.aHash(r.format, r.content, grid))))
      }
      .toDF()
    val canon = hashed.groupBy(col("phash"))
      .agg(min(col("media_id")).as("canonical_id"))
    hashed.join(canon, "phash")
      .select(col("media_id"), col("phash"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).as("is_dup"))
  }
}
