package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real codec paths in [[Multimodal.MediaDecoder]]: PNG (zlib inflate +
  * per-filter scanline reconstruction) and 16-bit PCM WAV. The writers
  * ([[Multimodal.makePng]]/[[Multimodal.makeWav]]) forward-encode the
  * same public formats, so every test is a true round-trip through
  * independent encode and decode arithmetic.
  */
class MultimodalCodecSpec extends SparkSpec {

  private val dec = new Multimodal.MediaDecoder

  private def gradient(w: Int, h: Int): Seq[(Int, Int, Int)] =
    for { y <- 0 until h; x <- 0 until w }
      yield ((x * 37 + y * 11) % 256, (x * 91 + y * 53) % 256, (x * 17 + y * 71) % 256)

  test("scene cuts: delta segmentation matches an independent digest replay") {
    import spark.implicits._
    val a64 = "a" * 64; val b64 = "b" * 64
    val media = Seq(
      (1L, a64 + b64 + a64 + a64), // 4 frames, repeated tail
      (2L, "x" * 30),              // single short frame
      (3L, "")                     // zero-byte media
    ).toDF("doc_id", "text")
    // independent replay: chunk → md5 → first-8-hex feature → deltas
    def feat(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 8), 16)
    }
    def expect(content: String): (Long, Long, Long) = {
      val chunks = content.grouped(64).toSeq
      val fs = chunks.map(feat)
      val cuts = fs.zip(fs.drop(1))
        .count { case (p, c) => math.abs(c - p) > 3000000000L }
      (chunks.size.toLong, cuts.toLong,
        if (chunks.isEmpty) 0L else cuts + 1L)
    }
    val got = Multimodal.sceneCuts(Multimodal.asMedia(media)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == expect(a64 + b64 + a64 + a64))
    // identical consecutive frames can never cut: the aa tail is one scene
    assert(got(1L)._2 == expect(a64 + b64 + a64 + a64)._2)
    assert(got(2L) == ((1L, 0L, 1L)), "single frame: no cuts, one scene")
    assert(got(3L) == ((0L, 0L, 0L)), "zero-byte media survives as 0/0/0")
  }

  test("silence segmentation: PCM windows and stub bits match replays") {
    import spark.implicits._
    val media = Multimodal.wavFixtures(spark)
      .unionByName(Multimodal.asMedia(
        Seq((1L, "hello world")).toDF("doc_id", "text")))
    val got = Multimodal.silenceSegments(spark, media).collect()
      .map(r => r.media_id ->
        ((r.n_windows, r.n_voiced, r.n_segments, r.longest_silence))).toMap
    assert(got(-21L) == ((1L, 1L, 1L, 0L)), "square wave: one voiced window")
    assert(got(-22L) == ((1L, 1L, 1L, 0L)), "stereo ramp")
    assert(got(-23L) == ((0L, 0L, 0L, 0L)), "corrupt header degrades")
    assert(got(-24L) == ((3L, 2L, 2L, 1L)),
      "gap wave: voiced/silent/voiced = 2 segments around 1 silent window")
    // stub replay: same mod-prime fold, 8-bit MSB-first voiced pattern
    val h = "hello world".codePoints().toArray
      .foldLeft(0L)((a, c) => (a * 1000003L + c) % 1000000007L)
    val bits = (0 until 8).map(i => ((h % 256 >> (7 - i)) & 1) == 1)
    def runs(t: Boolean) = bits.foldLeft(List.empty[Int]) {
      case (acc, v) if v == t => if (acc.isEmpty || acc.head == 0) 1 :: acc
        else (acc.head + 1) :: acc.tail
      case (acc, _) => 0 :: acc
    }.filter(_ > 0)
    assert(got(1L) == ((8L, bits.count(identity).toLong,
      runs(true).size.toLong,
      if (runs(false).isEmpty) 0L else runs(false).max.toLong)))
  }

  test("png: every filter type round-trips the exact pixels") {
    val px = gradient(5, 4)
    for (f <- 0 to 4) {
      val bytes = Multimodal.makePng(5, 4, px, Seq.fill(4)(f))
      val Some((w, h, rgb)) = dec.pngPixels(bytes)
      assert((w, h) == (5, 4), s"filter $f dims")
      val got = (0 until w * h).map(i =>
        (rgb(3 * i) & 0xFF, rgb(3 * i + 1) & 0xFF, rgb(3 * i + 2) & 0xFF))
      assert(got == px, s"filter $f pixels")
    }
    // mixed filters down the scanlines round-trip too
    val mixed = Multimodal.makePng(5, 4, px, Seq(4, 1, 3, 2))
    val Some((_, _, rgb)) = dec.pngPixels(mixed)
    val got = (0 until 20).map(i =>
      (rgb(3 * i) & 0xFF, rgb(3 * i + 1) & 0xFF, rgb(3 * i + 2) & 0xFF))
    assert(got == px)
  }

  test("png: features match the BMP path on the same picture") {
    val red = Seq.fill(4)((255, 0, 0))
    val png = Multimodal.makePng(2, 2, red, Seq(0, 1))
    // BMP writer wants BGR tuples; the picture is the same pure red
    val bmp = Multimodal.makeBmp(2, 2, Seq.fill(4)((0, 0, 255)))
    val (pw, ph, pf) = dec.decode("png", png)
    val (bw, bh, bf) = dec.decode("bmp", bmp)
    assert((pw, ph) == (bw, bh))
    assert(pf.toSeq == bf.toSeq,
      "feature contract must be format-independent")
  }

  test("png: aHash equals the BMP hash across format AND resolution") {
    val half8png = Multimodal.makePng(8, 8,
      (0 until 64).map(i => if (i % 8 < 4) (255, 255, 255) else (0, 0, 0)),
      Seq(0, 1, 2, 3, 4, 1, 2, 4))
    assert(dec.aHash("png", half8png) == 0x3333L)
    assert(dec.aHash("png", half8png) ==
      dec.aHash("bmp", Multimodal.halfImage(4, 4, leftWhite = true)))
  }

  test("png: corrupt input degrades, never throws") {
    val good = Multimodal.makePng(3, 3, gradient(3, 3), Seq(0, 0, 0))
    // bad signature
    assert(dec.decode("png", "nope".getBytes)._1 == 0)
    // truncated mid-IDAT: header dims survive, features zero
    val cut = good.take(good.length - 20)
    val (w, h, f) = dec.decode("png", cut)
    assert((w, h) == (3, 3) && f.forall(_ == 0f))
    // flipped bit inside the zlib stream: dims survive
    val bad = good.clone(); bad(45) = (bad(45) ^ 0x7F).toByte
    val (w2, h2, _) = dec.decode("png", bad)
    assert((w2, h2) == (3, 3))
    assert(dec.aHash("png", cut) == 0L)
  }

  test("png/wav: crafted headers degrade — overflow lengths, huge dims, FDICT") {
    def w32be(a: Array[Byte], o: Int, v: Long): Unit = {
      a(o) = (v >> 24).toByte; a(o + 1) = (v >> 16).toByte
      a(o + 2) = (v >> 8).toByte; a(o + 3) = v.toByte
    }
    val good = Multimodal.makePng(3, 3, gradient(3, 3), Seq(0, 0, 0))
    // chunk length near Int.MaxValue: the bounds test must fail in
    // Long arithmetic, not wrap negative past it
    val hugeChunk = good.clone()
    w32be(hugeChunk, 33, 0x7FFFFFF4L) // first post-IHDR chunk length
    assert(dec.decode("png", hugeChunk)._3.forall(_ == 0f))
    // 30000×30000 declared dims from a tiny file: reject before any
    // allocation (h·(1+3w) overflows Int)
    val hugeDims = good.clone()
    w32be(hugeDims, 16, 30000L); w32be(hugeDims, 20, 30000L)
    assert(dec.pngPixels(hugeDims).isEmpty)
    // zlib header with the FDICT bit (0x78 0x20): inflate makes no
    // progress and must bail, not spin forever
    val fdict = good.clone()
    val idatData = 8 + 25 + 8 // sig + IHDR chunk + IDAT len/type
    fdict(idatData) = 0x78.toByte; fdict(idatData + 1) = 0x20.toByte
    assert(dec.pngPixels(fdict).isEmpty)
    // WAV chunk length near Int.MaxValue
    val wav = Multimodal.makeWav(8000, 1, Seq(1, 2, 3))
    val hugeWav = wav.clone()
    hugeWav(40) = 0xF0.toByte; hugeWav(41) = 0xFF.toByte
    hugeWav(42) = 0xFF.toByte; hugeWav(43) = 0x7F.toByte // data len LE
    assert(dec.decodeAudio("wav", hugeWav) == ((0, 0, 0L, 0, 0L)))
  }

  test("wav: square wave and stereo ramp decode to exact statistics") {
    val square = Multimodal.makeWav(8000, 1,
      (0 until 16).map(i => if (i % 2 == 0) 8000 else -8000))
    assert(dec.decodeAudio("wav", square) == ((8000, 1, 16L, 8000, 8000L)))
    val stereo = Multimodal.makeWav(44100, 2,
      (0 until 8).flatMap(i => Seq(1000 * i, 3000)))
    // sumsq = 1e6*(0+1+4+9+16+25+36+49) + 8*9e6 = 212e6; /16 ->
    // 13_250_000; isqrt = 3640 (3640^2 = 13_249_600)
    assert(dec.decodeAudio("wav", stereo) == ((44100, 2, 8L, 7000, 3640L)))
    // negative peak dominates |.|
    val neg = Multimodal.makeWav(16000, 1, Seq(-30000, 100))
    assert(dec.decodeAudio("wav", neg)._4 == 30000)
  }

  test("wav: corrupt or non-PCM input degrades to zeros") {
    assert(dec.decodeAudio("wav", "RIFFxxxxWAVE".getBytes) ==
      ((0, 0, 0L, 0, 0L)))
    val good = Multimodal.makeWav(8000, 1, Seq(1, 2, 3))
    val nonPcm = good.clone(); nonPcm(20) = 3 // format tag != 1
    assert(dec.decodeAudio("wav", nonPcm) == ((0, 0, 0L, 0, 0L)))
    val eightBit = good.clone(); eightBit(34) = 8
    assert(dec.decodeAudio("wav", eightBit) == ((0, 0, 0L, 0, 0L)))
  }

  test("audioFeatures operator: fixture rows decode inside the batch shape") {
    val out = Multimodal.audioFeatures(spark, Multimodal.wavFixtures(spark))
      .toDF().orderBy(col("media_id")).collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(-21L).getInt(3) == 8000 && byId(-21L).getLong(7) == 8000L)
    assert(byId(-22L).getInt(4) == 2 && byId(-22L).getLong(7) == 3640L)
    assert(byId(-23L).getInt(3) == 0)
    // -24 gap wave: 48 frames, sumsq 208e6 → rms isqrt(208e6/48) = 2081
    assert(byId(-24L).getLong(5) == 48L && byId(-24L).getInt(6) == 3000 &&
      byId(-24L).getLong(7) == 2081L)
  }
}
