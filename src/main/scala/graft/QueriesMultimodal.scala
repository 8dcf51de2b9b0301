package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Analyzers
import graft.operators._
import graft.streaming.EventStream

/** SparkEntry's Multimodal family —
  * binary decoders, pHash, scene cuts, silence detection (brief extensions).
  *
  * Split out of the single 7.7k-line registry (round-14): each family
  * module contributes its slice of the SAME SparkEntry.queries /
  * oracleSql maps — pure motion, no semantics; key-disjointness is
  * spec-asserted so ++ can never silently overwrite an entry. */
private[graft] object QueriesMultimodal {
  import SparkEntry.{queries => _, oracleSql => _, entry => _, _}

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- multimodal plumbing (brief §extensions) ----
    "m1_media_meta" -> ((s, d) =>
      Multimodal.mediaMeta(Multimodal.asMedia(Tables.documents(s, d)))),
    "m2_media_features" -> ((s, d) =>
      // two decode paths through one batched extractor: planted BMP
      // fixtures exercise the REAL image parser (hand-computed pixel
      // statistics as oracle literals); the text rows exercise the
      // documented stub (mod-prime code-point fold → DuckDB-replayable).
      // Features verified as exact ×1000003 fixed-point integers.
      // the PNG fixtures ride the REAL compressed path: zlib inflate +
      // per-row unfiltering (every filter type planted), stats checked
      // against hand-computed literals; -3 is the same picture as BMP
      // -1, so equal features across formats is part of the contract
      Multimodal.extractFeatures(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.bmpFixtures(s))
          .unionByName(Multimodal.pngFixtures(s)))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("format"),
          col("width"), col("height"),
          joined(transform(col("features"),
            f => round(f.cast("double") * 1000003, 0).cast("long")))
            .as("features"))
        .orderBy(col("media_id"))),
    "m6_media_phash" -> ((s, d) =>
      // perceptual near-dup over media: planted BMPs include the SAME
      // picture at two resolutions (different bytes, equal aHash) plus
      // its inversion; stub rows exercise the SQL-replayable path.
      // A rescaled copy resolves to its original's group — the case
      // byte-exact md5 dedup (m1) can never catch
      // -10 is the same picture PNG-encoded: a cross-FORMAT duplicate
      // (different codec, different bytes, equal aHash) resolving into
      // the BMP fixtures' perceptual group
      Multimodal.phashDedup(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.phashFixtures(s))
          .unionByName(Multimodal.pngPhashFixtures(s)))
        .orderBy(col("media_id"))),
    "m7_audio_features" -> ((s, d) =>
      // audio modality: real 16-bit PCM WAV parse (planted square wave
      // + stereo ramp + corrupt header) over the same batched decoder
      // shape; text rows take the replayable stub
      Multimodal.audioFeatures(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.wavFixtures(s)))
        .toDF()
        .orderBy(col("media_id"))),
    "m3_media_chunks" -> ((s, d) =>
      Multimodal.mediaChunks(Multimodal.asMedia(Tables.documents(s, d)))
        .select(col("media_id"), col("n_chunks"),
          joined(col("chunk_md5s")).as("chunk_md5s"))
        .orderBy(col("media_id"))),
    "m4_media_resize" -> ((s, d) =>
      // thumbnail/downsample stage over decoded dims (stub dims reach
      // 640x480, so the 224-box scaling math is exercised; the planted
      // BMPs pass through un-scaled) — columnar, no UDF
      Multimodal.resize(
        Multimodal.extractFeatures(s,
          Multimodal.asMedia(Tables.documents(s, d))
            .unionByName(Multimodal.bmpFixtures(s))))
        .orderBy(col("media_id"))),
    "m5_frame_sample" -> ((s, d) =>
      // frame sampling over the chunked payload: keep every 4th chunk
      // digest (stride sampling on the window index — the video
      // keyframe-ish selection done entirely on the binary column)
      Multimodal.mediaChunks(Multimodal.asMedia(Tables.documents(s, d)))
        .select(col("media_id"), col("n_chunks"),
          joined(filter(col("chunk_md5s"), (m, i) => i % 4 === 0))
            .as("sampled_md5s"))
        .orderBy(col("media_id"))),
    "m9_silence_split" -> ((s, d) =>
      // VAD-style silence segmentation (Multimodal.silenceSegments
      // scaladoc): exact integer window RMS over real PCM (planted
      // fixtures incl. the -24 gap wave: voiced/silent/voiced → 2
      // segments), bit-pattern stub for text rows; row-local
      Multimodal.silenceSegments(s,
        Multimodal.asMedia(Tables.documents(s, d))
          .unionByName(Multimodal.wavFixtures(s)))
        .toDF()
        .orderBy(col("media_id"))),
    "m8_scene_cut" -> ((s, d) =>
      // scene-cut segmentation over the frame stream
      // (Multimodal.sceneCuts scaladoc): per media, a cut wherever
      // consecutive frame features jump past the threshold —
      // replayable stub features standing in for decoder frame means,
      // per-media lag window, explode+agg (never nested lambdas over
      // a computed array)
      Multimodal.sceneCuts(Multimodal.asMedia(Tables.documents(s, d)))),
  )

  lazy val oracleSql: Map[String, String] = Map(
    "m2_media_features" ->
      """WITH cp AS (SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
                            'txt' AS format,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id, n_bytes, format,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp)
         SELECT media_id, n_bytes, format,
                ((h0 % 640) + 1)::INT AS width,
                (((h0 // 640) % 480) + 1)::INT AS height,
                array_to_string(list_transform(generate_series(0, 7),
                                i -> (h0*31 + i*2654435761) % 1000003), '|') AS features
         FROM h
         UNION ALL
         -- planted BMP fixtures (real decode path): hand-computed pixel
         -- stats as exact x1000003 fixed-point. -1 = 2x2 pure red:
         -- means/maxs (B,G,R)=(0,0,1), aspect 2/(2+2)=0.5, bpp 24/32;
         -- -2 = 3x1 all black: zeros, aspect 3/(3+1)=0.75. Sizes:
         -- 54-byte header + 4-byte-padded rows (2x2: 2*8=16 -> 70;
         -- 3x1: 12 -> 66).
         SELECT * FROM (VALUES
           (-1::BIGINT, 70::BIGINT, 'bmp', 2::INT, 2::INT,
            '0|0|1000003|0|0|1000003|500002|750002'),
           (-2::BIGINT, 66::BIGINT, 'bmp', 3::INT, 1::INT,
            '0|0|0|0|0|0|750002|750002'),
           -- planted PNGs (real inflate+unfilter path; stored-deflate
           -- blocks make n_bytes closed-form: 57 + h*(1+3w) + 11).
           -- -3 = 2x2 pure red, the SAME picture as BMP -1 -> same
           -- features; -4 = 3x3 gradient r=10+20x, g=50y, b=25(x+y):
           -- means (B,G,R)=(50,50,30)/255, maxs (100,100,50)/255,
           -- aspect 0.5, 24bpp -> float32 fixed-point literals
           (-4::BIGINT, 98::BIGINT, 'png', 3::INT, 3::INT,
            '196079|196079|117647|392158|392158|196079|500002|750002'),
           (-3::BIGINT, 82::BIGINT, 'png', 2::INT, 2::INT,
            '0|0|1000003|0|0|1000003|500002|750002'))
           AS t(media_id, n_bytes, format, width, height, features)
         ORDER BY media_id""",
    "m6_media_phash" ->
      """WITH cp AS (SELECT doc_id AS media_id,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp),
          c AS (SELECT media_id,
                       list_transform(generate_series(0, 15),
                                      i -> (h0*31 + i*2654435761) % 1000003) AS cells
                FROM h),
          p AS (SELECT media_id,
                       -- ::BIGINT: DuckDB's list sum yields HUGEINT,
                       -- which the harness canonicalizes differently
                       -- from int64 even at equal values
                       list_aggregate(list_transform(generate_series(1, 16),
                         i -> CASE WHEN cells[i] > list_aggregate(cells, 'sum') / 16.0
                                   THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END),
                         'sum')::BIGINT AS phash
                FROM c),
          -- planted fixtures (real aHash path): left-white half at
          -- 4x4 BMP, 8x8 BMP and 8x8 PNG pool to the SAME 0x3333 grid
          -- bits (cross-resolution AND cross-format duplicates); the
          -- inverted picture flips to 0xCCCC
          allrows AS (SELECT * FROM p UNION ALL
                      SELECT * FROM (VALUES (-10::BIGINT, 13107::BIGINT),
                                            (-11::BIGINT, 13107::BIGINT),
                                            (-12::BIGINT, 13107::BIGINT),
                                            (-13::BIGINT, 52428::BIGINT))
                        AS t(media_id, phash)),
          canon AS (SELECT phash, min(media_id) AS canonical_id
                    FROM allrows GROUP BY 1)
          SELECT a.media_id, a.phash, canon.canonical_id,
                 a.media_id <> canon.canonical_id AS is_dup
          FROM allrows a JOIN canon USING (phash)
          ORDER BY a.media_id""",
    "m7_audio_features" ->
      // planted WAV literals: -21 mono square wave ±8000 (RMS = the
      // amplitude exactly, 44+32 bytes); -22 stereo ramp L=1000i,
      // R=3000: sumsq = 140e6+72e6 over 16 samples -> isqrt(13250000)
      // = 3640, peak 7000; -23 truncated RIFF header -> all-zero
      // degrade. Text rows replay the stub from the shared h0 fold.
      """WITH cp AS (SELECT doc_id AS media_id, text,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id, text,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp)
          SELECT media_id,
                 octet_length(encode(text))::BIGINT AS n_bytes,
                 'txt' AS format,
                 (8000 + h0 % 40001)::INT AS sample_rate,
                 (1 + h0 % 2)::INT AS channels,
                 (1 + h0 % 100000)::BIGINT AS n_frames,
                 ((h0*31) % 32768)::INT AS peak,
                 ((h0*37) % 32768)::BIGINT AS rms
          FROM h
          UNION ALL
          SELECT * FROM (VALUES
            (-21::BIGINT, 76::BIGINT, 'wav', 8000::INT, 1::INT,
             16::BIGINT, 8000::INT, 8000::BIGINT),
            (-22::BIGINT, 76::BIGINT, 'wav', 44100::INT, 2::INT,
             8::BIGINT, 7000::INT, 3640::BIGINT),
            (-23::BIGINT, 12::BIGINT, 'wav', 0::INT, 0::INT,
             0::BIGINT, 0::INT, 0::BIGINT),
            -- -24 gap wave (m9's fixture): 48 mono samples, sumsq =
            -- 16·2000² + 16·0 + 16·3000² = 208e6 → isqrt(208e6/48) = 2081
            (-24::BIGINT, 140::BIGINT, 'wav', 8000::INT, 1::INT,
             48::BIGINT, 3000::INT, 2081::BIGINT))
            AS t(media_id, n_bytes, format, sample_rate, channels,
                 n_frames, peak, rms)
          ORDER BY media_id""",
    "m3_media_chunks" ->
      """SELECT doc_id AS media_id,
                ceil(octet_length(encode(text)) / 64.0)::BIGINT AS n_chunks,
                array_to_string(
                  list_transform(generate_series(0, ceil(octet_length(encode(text)) / 64.0)::BIGINT - 1),
                                 i -> md5(substring(text, (i * 64 + 1)::INT, 64))), '|') AS chunk_md5s
         FROM documents ORDER BY media_id""",
    // m9: stub rows replay the 8-bit voiced pattern from the shared
    // h0 fold (runs via one regexp over the padded bin string); the
    // planted PCM fixtures are hand-computed VALUES
    "m9_silence_split" ->
      """WITH cp AS (SELECT doc_id AS media_id,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp),
          bits AS (SELECT media_id, lpad(bin((h0 % 256)::INT), 8, '0') AS bs FROM h)
          SELECT media_id, 8::BIGINT AS n_windows,
                 (len(bs) - len(replace(bs, '1', '')))::BIGINT AS n_voiced,
                 len(regexp_extract_all(bs, '1+'))::BIGINT AS n_segments,
                 coalesce(list_max(list_transform(regexp_extract_all(bs, '0+'),
                                                  x -> len(x))), 0)::BIGINT AS longest_silence
          FROM bits
          UNION ALL
          SELECT * FROM (VALUES
            (-21::BIGINT, 1::BIGINT, 1::BIGINT, 1::BIGINT, 0::BIGINT),
            (-22::BIGINT, 1::BIGINT, 1::BIGINT, 1::BIGINT, 0::BIGINT),
            (-23::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT),
            (-24::BIGINT, 3::BIGINT, 2::BIGINT, 2::BIGINT, 1::BIGINT))
            AS t(media_id, n_windows, n_voiced, n_segments, longest_silence)
          ORDER BY media_id""",
    // m8: the m3 chunk-digest replay folded to 32-bit frame features,
    // consecutive-delta cuts
    "m8_scene_cut" ->
      """WITH c AS (SELECT doc_id AS media_id,
                           list_transform(
                             generate_series(0, ceil(octet_length(encode(text)) / 64.0)::BIGINT - 1),
                             i -> ('0x' || substr(md5(substring(text, (i * 64 + 1)::INT, 64)), 1, 8))::BIGINT) AS f
                    FROM documents),
          s AS (SELECT media_id, len(f)::BIGINT AS n_frames,
                       len(list_filter(generate_series(2, len(f)),
                                       i -> abs(f[i] - f[i - 1]) > 3000000000))::BIGINT AS n_cuts
                FROM c)
          SELECT media_id, n_frames, n_cuts,
                 (CASE WHEN n_frames = 0 THEN 0 ELSE n_cuts + 1 END)::BIGINT AS n_scenes
          FROM s ORDER BY media_id""",
    "m4_media_resize" ->
      """WITH cp AS (SELECT doc_id AS media_id,
                            list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cps
                     FROM documents),
          h AS (SELECT media_id,
                       list_reduce(list_prepend(0::BIGINT, cps),
                                   (a, b) -> (a*1000003 + b) % 1000000007) AS h0
                FROM cp),
          dims AS (SELECT media_id, ((h0 % 640) + 1)::INT AS width,
                          (((h0 // 640) % 480) + 1)::INT AS height FROM h
                   UNION ALL
                   SELECT * FROM (VALUES (-1::BIGINT, 2::INT, 2::INT),
                                         (-2::BIGINT, 3::INT, 1::INT)) v(media_id, width, height)),
          s AS (SELECT *, least(224.0 / width, 224.0 / height, 1.0) AS sc FROM dims)
          SELECT media_id, width, height,
                 greatest(floor(width * sc), 1)::INT AS out_w,
                 greatest(floor(height * sc), 1)::INT AS out_h
          FROM s ORDER BY media_id""",
    "m5_frame_sample" ->
      """SELECT doc_id AS media_id,
                ceil(octet_length(encode(text)) / 64.0)::BIGINT AS n_chunks,
                array_to_string(
                  list_transform(
                    list_filter(generate_series(0, ceil(octet_length(encode(text)) / 64.0)::BIGINT - 1),
                                i -> i % 4 = 0),
                    i -> md5(substring(text, (i * 64 + 1)::INT, 64))), '|') AS sampled_md5s
         FROM documents ORDER BY media_id""",
    "m1_media_meta" ->
      """SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
                'txt' AS format, md5(text) AS content_md5
         FROM documents ORDER BY media_id""",
  )
}
