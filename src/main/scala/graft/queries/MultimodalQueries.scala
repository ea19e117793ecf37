package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries on real driver data. q34/q35 run the
  * deterministic FakeCodec over text-as-blob payloads (schema/partition/
  * batch plumbing under a fixture codec); q34b generates REAL PNG bytes
  * and decodes them with the JDK `javax.imageio` kernel
  * ([[Multimodal.ImageIoCodec]]) — the decode step itself is real, not
  * stubbed.
  */
object MultimodalQueries {

  private val hexv: String => String = c => s"(strpos('0123456789abcdef', $c) - 1)"
  /** SQL for the integer value of md5 hex chars [i, i+1] (1-based). */
  private def hexPair(h: String, i: Int): String =
    s"(${hexv(s"substr($h, $i, 1)")} * 16 + ${hexv(s"substr($h, ${i + 1}, 1)")})"

  /** Session-shared image dHash frame `(id, dhash)`: q120, q123, q129
    * and q133 all generate the IDENTICAL PNG corpus (seed = doc_id mod
    * 50, w = 9+seed%23, h = 8+(seed*7)%24, default gradient) and
    * pixel-decode it to the same dHash — previously four independent
    * full decode passes per bench run. One [[Materialized]] frame (the
    * change-3 pattern from this round's notes) decodes once per
    * session; every consumer reads the scan leaf. Contents are
    * byte-identical to each query's inline frame — same generation,
    * same codec — so the oracle replays are untouched. */
  private def imgDhashShared(s: SparkSession, dir: String): DataFrame =
    Materialized(s, s"imgdhash50:$dir") {
      import s.implicits._
      val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val seed = id % 50
          (id, Multimodal.encodePng(
            (9 + seed % 23).toInt, (8 + (seed * 7) % 24).toInt, seed = seed))
        })
        .toDF("doc_id", "blob")
      Multimodal.decodeImageHashPartitions(blobs, "blob", "doc_id")
        .select(col("id"), col("dhash"))
    }

  /** Session-shared video signature frame `(id, vsig)`: q131 and q133
    * generate the IDENTICAL ISO-BMFF corpus (seed = doc_id mod 40 ×
    * two variants) and walk the same sample tables — shared the same
    * way as [[imgDhashShared]]. */
  private def vidSigShared(s: SparkSession, dir: String): DataFrame =
    Materialized(s, s"vidsig40:$dir") {
      import s.implicits._
      val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val seed = id % 40
          val v = (id / 40) % 2
          (id, Multimodal.encodeMp4Sampled(
            width = 320, height = 240,
            nFrames = (70 + (seed * 11) % 160).toInt,
            keyEvery = (1 + seed % 5).toInt,
            trackTimescale = 12000, delta1 = 300, delta2 = 364,
            uniformSize = 0, seed = seed * 2 + v))
        })
        .toDF("doc_id", "blob")
      Multimodal.decodeVideoSigPartitions(blobs, "blob", "doc_id")
        .select(col("id"), col("vsig"))
    }

  /** Blob metadata extraction: byte length, checksum, pseudo-dimensions
    * derived from the checksum (the FakeCodec contract). */
  val q34 = GQuery("q34_multimodal_meta",
    s"""WITH b AS (SELECT doc_id, md5(text) AS ck, octet_length(encode(text)) AS nb
       |           FROM documents)
       |SELECT doc_id,
       |  'txt' AS format,
       |  CAST(64 + (${hexPair("ck", 1)} % 16) * 64 AS INT) AS width,
       |  CAST(64 + (${hexPair("ck", 3)} % 16) * 64 AS INT) AS height,
       |  CAST(nb AS BIGINT) AS n_bytes,
       |  ck AS checksum
       |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val blobs = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
    Multimodal.withMeta(blobs, "blob", "txt")
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling plumbing: deterministic pseudo frame counts, every
    * 2nd frame index emitted via explode/unnest. */
  val q35 = GQuery("q35_frame_sample",
    """WITH b AS (SELECT doc_id AS id,
      |  CAST(octet_length(encode(text)) % 32 + 1 AS INT) AS n_frames FROM documents)
      |SELECT id, n_frames, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
      |FROM b ORDER BY id, frame_idx""".stripMargin) { (s, dir) =>
    val blobs = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
    Multimodal.sampleFrames(blobs, "blob", "doc_id", stride = 2)
      .select(col("id"), col("n_frames"), col("frame_idx").cast("int").as("frame_idx"))
      .orderBy(col("id"), col("frame_idx"))
  }

  /** REAL image decode end-to-end: deterministic PNG bytes are
    * generated per-partition (`BufferedImage` → `ImageIO.write`, pixel
    * values seeded by doc_id), then [[Multimodal.ImageIoCodec]] probes
    * them back — true format and header width/height, no pixel decode.
    * The oracle recomputes the sidecar dimension formula from doc_id:
    * the row hash-matches only if PNG encode AND ImageIO header probe
    * both work, making this the driver-green proof that the decode
    * kernel is real (n_bytes/checksum are PNG-encoder-specific, so the
    * projected columns are the decoded invariants). */
  val q34b = GQuery("q34b_image_decode",
    """SELECT doc_id, 'png' AS format,
      |  CAST(8 + doc_id % 24 AS INT) AS width,
      |  CAST(8 + (doc_id * 7) % 24 AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodePng(
          (8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, seed = id))
      })
      .toDF("doc_id", "blob")
    Multimodal.decodePartitions(blobs, "blob", "doc_id", "png",
        Multimodal.ImageIoCodec)
      .select(col("id").as("doc_id"), col("format"),
        col("width"), col("height"))
      .orderBy(col("doc_id"))
  }

  /** REAL audio decode end-to-end — the WAV sibling of q34b:
    * deterministic PCM16 RIFF bytes are generated per-partition
    * ([[Multimodal.encodeWav]], parameters seeded by doc_id), then
    * [[Multimodal.WavCodec]] parses the headers back — true sample
    * rate / channels / bit depth from the `fmt ` chunk, frame count
    * from the `data` chunk size, PCM payload untouched. The oracle
    * recomputes the parameter formulas and the n_bytes identity
    * (44-byte header + 2·channels·frames) from doc_id, so the row
    * hash-matches only if RIFF encode AND the chunk-walk parse both
    * work. */
  val q110 = GQuery("q110_wav_decode",
    """SELECT doc_id, 'wav' AS format,
      |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(16 AS INT) AS bits_per_sample,
      |  CAST(100 + (doc_id * 13) % 900 AS BIGINT) AS n_frames,
      |  CAST(44 + 2 * (1 + doc_id % 2) * (100 + (doc_id * 13) % 900)
      |    AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodeWav(
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          channels = (1 + id % 2).toInt,
          nFrames = (100 + (id * 13) % 900).toInt,
          seed = id))
      })
      .toDF("doc_id", "blob")
    Multimodal.decodeAudioPartitions(blobs, "blob", "doc_id", "wav",
        Multimodal.WavCodec)
      .select(col("id").as("doc_id"), col("format"), col("sample_rate"),
        col("channels"), col("bits_per_sample"), col("n_frames"),
        col("n_bytes"))
      .orderBy(col("doc_id"))
  }

  /** REAL video-container decode end-to-end — the MP4 member of the
    * q34b/q110 family: spec-shaped ISO-BMFF bytes are generated
    * per-partition ([[Multimodal.encodeMp4]], parameters seeded by
    * doc_id), then [[Multimodal.Mp4Codec]] walks the boxes back —
    * brand from `ftyp`, duration from `mvhd` timescale ticks, first
    * track's 16.16 dimensions from `tkhd`, track count. The oracle
    * recomputes every field from the doc_id formulas (duration_ms =
    * ticks·1000 ÷ 600 in integer math), so the hash matches only if
    * the box writer AND the box walk both work. */
  val q112 = GQuery("q112_mp4_decode",
    """SELECT doc_id, 'isom' AS format,
      |  CAST(((300 + (doc_id * 17) % 4200) * 1000) // 600 AS BIGINT)
      |    AS duration_ms,
      |  CAST(160 + (doc_id % 8) * 16 AS INT) AS width,
      |  CAST(120 + (doc_id % 6) * 20 AS INT) AS height,
      |  CAST(1 + doc_id % 3 AS INT) AS n_tracks
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodeMp4(
          timescale = 600,
          durationTicks = 300 + (id * 17) % 4200,
          width = (160 + (id % 8) * 16).toInt,
          height = (120 + (id % 6) * 20).toInt,
          nTracks = (1 + id % 3).toInt))
      })
      .toDF("doc_id", "blob")
    Multimodal.decodeVideoPartitions(blobs, "blob", "doc_id", "mp4",
        Multimodal.Mp4Codec)
      .select(col("id").as("doc_id"), col("format"), col("duration_ms"),
        col("width"), col("height"), col("n_tracks"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal corpus data card — the media analog of q76: ONE report
    * over all three REAL codecs. Each document carries a blob in a
    * deterministic modality (doc_id % 3 → image/audio/video, generated
    * by the q34b/q110/q112 fixture formulas), with every 13th blob
    * TRUNCATED to 6 bytes — short of the PNG magic, the 12-byte RIFF
    * header, and the first ISO-BMFF box header, so all three kernels
    * must degrade it to their typed corrupt row. The card aggregates
    * per (source, modality): blob and corrupt counts, corrupt fraction,
    * mean valid dimensions (width/height, sample_rate/channels), and
    * total content units (pixels, frames, duration ms). The oracle
    * replays the generator formulas and the corrupt set from doc_id, so
    * the hash matches only if encode, all three box/chunk walks, the
    * corrupt-degradation contract, AND the aggregation agree.
    *
    * Scale shape: three independent per-partition decode maps (zero
    * shuffle, O(header) per blob), one union, one keyed aggregate —
    * the same linear metadata-pass plan a 100 TB media crawl wants. */
  val q116 = GQuery("q116_media_datacard",
    """WITH m AS (
      |  SELECT doc_id, source,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |         ELSE 'video' END AS modality,
      |    (doc_id % 13 = 0) AS bad,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(8 + doc_id % 24 AS DOUBLE)
      |         WHEN doc_id % 3 = 1 THEN CAST(8000 + (doc_id % 8) * 1000 AS DOUBLE)
      |         ELSE CAST(160 + (doc_id % 8) * 16 AS DOUBLE) END AS d1,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(8 + (doc_id * 7) % 24 AS DOUBLE)
      |         WHEN doc_id % 3 = 1 THEN CAST(1 + doc_id % 2 AS DOUBLE)
      |         ELSE CAST(120 + (doc_id % 6) * 20 AS DOUBLE) END AS d2,
      |    CASE WHEN doc_id % 3 = 0
      |           THEN CAST((8 + doc_id % 24) * (8 + (doc_id * 7) % 24) AS BIGINT)
      |         WHEN doc_id % 3 = 1 THEN CAST(100 + (doc_id * 13) % 900 AS BIGINT)
      |         ELSE CAST(((300 + (doc_id * 17) % 4200) * 1000) // 600 AS BIGINT)
      |         END AS units
      |  FROM documents)
      |SELECT source, modality,
      |  CAST(count(*) AS BIGINT) AS n_blobs,
      |  CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |  round(sum(CASE WHEN bad THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
      |    AS frac_corrupt,
      |  round(avg(CASE WHEN bad THEN NULL ELSE d1 END), 4) AS avg_dim1,
      |  round(avg(CASE WHEN bad THEN NULL ELSE d2 END), 4) AS avg_dim2,
      |  CAST(sum(CASE WHEN bad THEN NULL ELSE units END) AS BIGINT)
      |    AS total_units
      |FROM m GROUP BY source, modality
      |ORDER BY source, modality""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val ids = docs.select(col("doc_id")).as[Long]
    // Every 13th blob truncated to 6 bytes — invalid for all three
    // container formats, exercising the corrupt-degradation contract.
    def maim(id: Long, bytes: Array[Byte]): Array[Byte] =
      if (id % 13 == 0) bytes.take(6) else bytes

    val img = Multimodal.decodePartitions(
      ids.filter(_ % 3 == 0).mapPartitions(_.map { id =>
        (id, maim(id, Multimodal.encodePng(
          (8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, seed = id)))
      }).toDF("doc_id", "blob"),
      "blob", "doc_id", "png", Multimodal.ImageIoCodec)
      .select(col("id").as("doc_id"), lit("image").as("modality"),
        (col("format") === "corrupt").as("bad"),
        col("width").cast("double").as("d1"),
        col("height").cast("double").as("d2"),
        (col("width").cast("long") * col("height")).as("units"))

    val aud = Multimodal.decodeAudioPartitions(
      ids.filter(_ % 3 == 1).mapPartitions(_.map { id =>
        (id, maim(id, Multimodal.encodeWav(
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          channels = (1 + id % 2).toInt,
          nFrames = (100 + (id * 13) % 900).toInt,
          seed = id)))
      }).toDF("doc_id", "blob"),
      "blob", "doc_id", "wav", Multimodal.WavCodec)
      .select(col("id").as("doc_id"), lit("audio").as("modality"),
        (col("format") === "corrupt").as("bad"),
        col("sample_rate").cast("double").as("d1"),
        col("channels").cast("double").as("d2"),
        col("n_frames").as("units"))

    val vid = Multimodal.decodeVideoPartitions(
      ids.filter(_ % 3 == 2).mapPartitions(_.map { id =>
        (id, maim(id, Multimodal.encodeMp4(
          timescale = 600,
          durationTicks = 300 + (id * 17) % 4200,
          width = (160 + (id % 8) * 16).toInt,
          height = (120 + (id % 6) * 20).toInt,
          nTracks = (1 + id % 3).toInt)))
      }).toDF("doc_id", "blob"),
      "blob", "doc_id", "mp4", Multimodal.Mp4Codec)
      .select(col("id").as("doc_id"), lit("video").as("modality"),
        (col("format") === "corrupt").as("bad"),
        col("width").cast("double").as("d1"),
        col("height").cast("double").as("d2"),
        col("duration_ms").as("units"))

    img.unionByName(aud).unionByName(vid)
      .join(docs, Seq("doc_id"))
      .groupBy(col("source"), col("modality"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_corrupt"),
        round(sum(when(col("bad"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 4).as("frac_corrupt"),
        round(avg(when(!col("bad"), col("d1"))), 4).as("avg_dim1"),
        round(avg(when(!col("bad"), col("d2"))), 4).as("avg_dim2"),
        sum(when(!col("bad"), col("units"))).as("total_units"))
      .orderBy(col("source"), col("modality"))
  }

  /** REAL audio SAMPLE decode — past q110's header probe and into the
    * PCM payload ([[Multimodal.PcmStatsCodec]]): exact integer signal
    * statistics (sample count, energy as the exact sum of squares,
    * clipped-sample count at |s| ≥ 32700, peak amplitude) — the
    * silence/clipping discard signals of an audio-curation pass. The
    * generator's sample formula ((doc_id + i·31) mod 2¹⁶ − 2¹⁵) is
    * replayed sample-by-sample by the oracle via unnest(range(n)), so
    * the hash matches only if the RIFF writer, the chunk walk, AND the
    * frame-by-frame PCM16 read all agree — integer-exact, no float
    * anywhere. */
  val q119 = GQuery("q119_wav_stats",
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST((1 + doc_id % 2) * (100 + (doc_id * 13) % 900) AS BIGINT) AS n
      |  FROM documents),
      |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM p),
      |v AS (
      |  SELECT doc_id, n, ((doc_id + i * 31) % 65536) - 32768 AS v FROM s)
      |SELECT doc_id, 'wav' AS format,
      |  CAST(max(n) AS BIGINT) AS n_samples,
      |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
      |  CAST(sum(CASE WHEN abs(v) >= 32700 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped,
      |  CAST(max(abs(v)) AS INT) AS max_abs
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodeWav(
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          channels = (1 + id % 2).toInt,
          nFrames = (100 + (id * 13) % 900).toInt,
          seed = id))
      })
      .toDF("doc_id", "blob")
    Multimodal.decodeAudioStatsPartitions(blobs, "blob", "doc_id")
      .select(col("id").as("doc_id"), col("format"), col("n_samples"),
        col("sum_sq"), col("n_clipped"), col("max_abs"))
      .orderBy(col("doc_id"))
  }

  /** REAL pixel decode → perceptual dHash → exact-duplicate census
    * ([[Multimodal.DHashCodec]]): PNGs are generated with seed =
    * doc_id mod 50 (dimensions AND pixels derive from the seed), so
    * same-seed documents carry byte-different but pixel-identical
    * images; `ImageIO.read` decodes the full raster back, the
    * integer-exact 9×8 box-average dHash reduces it to 64 bits, and a
    * hash census counts copies — the image-dedup move at corpus
    * scale. The oracle replays the ENTIRE pixel arithmetic
    * (gradient formula → per-cell luma sums over floor-boundary
    * blocks → cross-multiplied brighter-than bits → census) in SQL
    * from the 50 distinct seeds, so the hash matches only if the PNG
    * round-trip is bit-exact and the downscale/compare arithmetic
    * agrees term-for-term.
    *
    * Scale shape: per-partition decode (zero shuffle, O(pixels) per
    * blob), then ONE hash-keyed census aggregate joined back — the
    * exact-dedup plan (q23) with a decoded perceptual key; Hamming
    * banding over the same 64-bit strings (q60 machinery) is the
    * near-dup extension. */
  val q120 = GQuery("q120_image_dhash",
    """WITH sd AS (SELECT DISTINCT doc_id % 50 AS seed FROM documents),
      |dim AS (SELECT seed, 9 + seed % 23 AS w, 8 + (seed * 7) % 24 AS h
      |        FROM sd),
      |g AS (SELECT seed, w, h, gxs.gx AS gx, gys.gy AS gy
      |      FROM dim,
      |        (SELECT unnest(range(0, 9)) AS gx) gxs,
      |        (SELECT unnest(range(0, 8)) AS gy) gys),
      |xb AS (SELECT seed, gx, gy,
      |        (gx * w) // 9 AS x0, ((gx + 1) * w) // 9 AS x1,
      |        (gy * h) // 8 AS y0, ((gy + 1) * h) // 8 AS y1 FROM g),
      |px AS (SELECT seed, gx, gy, y0, y1, unnest(range(x0, x1)) AS x
      |       FROM xb),
      |pxy AS (SELECT seed, gx, gy, x, unnest(range(y0, y1)) AS y FROM px),
      |lum AS (SELECT seed, gx, gy,
      |        (((seed + x * 31 + y * 131) % 16777216) // 65536) * 299
      |        + ((((seed + x * 31 + y * 131) % 16777216) // 256) % 256) * 587
      |        + (((seed + x * 31 + y * 131) % 16777216) % 256) * 114 AS l
      |        FROM pxy),
      |ls AS (SELECT seed, gx, gy, sum(l) AS s, count(*) AS c FROM lum
      |       GROUP BY seed, gx, gy),
      |bits AS (SELECT a.seed AS seed, a.gx AS gx, a.gy AS gy,
      |         CASE WHEN b.s * a.c > a.s * b.c THEN '1' ELSE '0' END AS bit
      |         FROM ls a JOIN ls b
      |           ON a.seed = b.seed AND a.gy = b.gy AND b.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |hs AS (SELECT seed, string_agg(bit, '' ORDER BY gy, gx) AS dhash
      |       FROM bits GROUP BY seed),
      |dh AS (SELECT d.doc_id, h.dhash FROM documents d
      |       JOIN hs h ON d.doc_id % 50 = h.seed)
      |SELECT doc_id, dhash,
      |  CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS n_copies
      |FROM dh ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // session-shared decoded frame (imgDhashShared): decode once per
    // session, every branch reads the materialized scan leaf
    val hashed = imgDhashShared(s, dir)
      .select(col("id").as("doc_id"), col("dhash"))
    // hash census join, not a window: the heavy-hitter hash (a viral
    // duplicate image) must partial-aggregate map-side, not pile onto
    // one window task.
    val census = hashed.groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_copies"))
    hashed.join(census, Seq("dhash"))
      .select(col("doc_id"), col("dhash"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** Image NEAR-duplicate pairing — [[q120]]'s dHash composed with the
    * q60 banded-Hamming machinery
    * ([[graft.operators.Dedup.hammingNearDupsFromSigs]]): each document
    * carries one of 100 distinct images (seed = doc_id mod 50 × two
    * x-gradient variants), every image is REALLY decoded and dHashed,
    * and pairs within Hamming ≤ 8 surface via the pigeonhole band join
    * + native `hamming_dist` verify — same-class copies at distance 0,
    * cross-variant gradients at whatever small distance the arithmetic
    * yields. The oracle recomputes both hash families pixel-exactly,
    * takes CLASS-level distances (100×100, not doc×doc), and expands to
    * doc pairs — so banding recall, the Hamming expression, and the
    * decode all have to agree with the replay. Top-200 by (id_a, id_b)
    * keeps the output deterministic and SF-stable. */
  val q121 = GQuery("q121_image_neardup",
    """WITH cls AS (SELECT DISTINCT doc_id % 50 AS seed,
      |              (doc_id // 50) % 2 AS v FROM documents),
      |dim AS (SELECT seed, v, CASE WHEN v = 1 THEN 37 ELSE 31 END AS cf,
      |        9 + seed % 23 AS w, 8 + (seed * 7) % 24 AS h FROM cls),
      |g AS (SELECT seed, v, cf, w, h, gxs.gx AS gx, gys.gy AS gy
      |      FROM dim,
      |        (SELECT unnest(range(0, 9)) AS gx) gxs,
      |        (SELECT unnest(range(0, 8)) AS gy) gys),
      |xb AS (SELECT seed, v, cf, gx, gy,
      |        (gx * w) // 9 AS x0, ((gx + 1) * w) // 9 AS x1,
      |        (gy * h) // 8 AS y0, ((gy + 1) * h) // 8 AS y1 FROM g),
      |px AS (SELECT seed, v, cf, gx, gy, y0, y1, unnest(range(x0, x1)) AS x
      |       FROM xb),
      |pxy AS (SELECT seed, v, cf, gx, gy, x, unnest(range(y0, y1)) AS y
      |        FROM px),
      |lum AS (SELECT seed, v, gx, gy,
      |        (((seed + x * cf + y * 131) % 16777216) // 65536) * 299
      |        + ((((seed + x * cf + y * 131) % 16777216) // 256) % 256) * 587
      |        + (((seed + x * cf + y * 131) % 16777216) % 256) * 114 AS l
      |        FROM pxy),
      |ls AS (SELECT seed, v, gx, gy, sum(l) AS s, count(*) AS c FROM lum
      |       GROUP BY seed, v, gx, gy),
      |bits AS (SELECT a.seed AS seed, a.v AS v, a.gx AS gx, a.gy AS gy,
      |         CASE WHEN b.s * a.c > a.s * b.c THEN '1' ELSE '0' END AS bit
      |         FROM ls a JOIN ls b
      |           ON a.seed = b.seed AND a.v = b.v AND a.gy = b.gy
      |          AND b.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |hs AS (SELECT seed, v, string_agg(bit, '' ORDER BY gy, gx) AS dhash
      |       FROM bits GROUP BY seed, v),
      |cp AS (SELECT a.seed AS sa, a.v AS va, b.seed AS sb, b.v AS vb,
      |         len([i for i in range(1, 65)
      |              if substr(a.dhash, i, 1) <> substr(b.dhash, i, 1)])
      |           AS hamming
      |       FROM hs a, hs b),
      |pr AS (SELECT da.doc_id AS id_a, db.doc_id AS id_b, cp.hamming
      |       FROM cp
      |       JOIN documents da
      |         ON da.doc_id % 50 = cp.sa AND (da.doc_id // 50) % 2 = cp.va
      |       JOIN documents db
      |         ON db.doc_id % 50 = cp.sb AND (db.doc_id // 50) % 2 = cp.vb
      |       WHERE da.doc_id < db.doc_id AND cp.hamming <= 8)
      |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
      |FROM pr ORDER BY id_a, id_b LIMIT 200""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val seed = id % 50
        val coef = if ((id / 50) % 2 == 1) 37L else 31L
        (id, Multimodal.encodePng(
          (9 + seed % 23).toInt, (8 + (seed * 7) % 24).toInt, seed, coef))
      })
      .toDF("doc_id", "blob")
    // persisted: the collapsed pairer reads the signature frame from
    // several branches (collapse, expansion, same-hash join) — the
    // pixel decode must run once, not once per branch
    val sigs = Multimodal.decodeImageHashPartitions(blobs, "blob", "doc_id")
      .select(col("id"), col("dhash").as("simhash64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // collapsed variant: identical hashes (50 copies per class at
    // sf0.1) would otherwise square inside every matching band
    graft.operators.Dedup.hammingNearDupsCollapsed(sigs, maxHamming = 8)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id_a"), col("id_b")).limit(200)
  }

  /** Audio NEAR-duplicate pairing — the audio member of the perceptual
    * dedup family (text SimHash q60 / image dHash q121):
    * [[Multimodal.AudioSigCodec]] fingerprints REAL PCM16 payloads by
    * 65-segment energy profile, and the collapsed banded-Hamming
    * pairer surfaces duplicates. Each document carries one of 80
    * distinct signals (seed = doc_id mod 40 × two variants whose
    * samples differ by a +1 DC offset — energies shift ~0.006%, so
    * energy ORDER is mostly preserved and the variant lands a few
    * Hamming bits away: the near-dup property, from real byte
    * decode). The oracle replays every sample's integer arithmetic
    * (segment assignment i·65÷n, exact energy sums, cross-multiplied
    * bits) per class and expands class pairs to doc pairs. */
  val q122 = GQuery("q122_audio_neardup",
    """WITH cls AS (SELECT DISTINCT doc_id % 40 AS seed,
      |              (doc_id // 40) % 2 AS v FROM documents),
      |prm AS (SELECT seed, v,
      |        CAST((1 + seed % 2) * (100 + (seed * 13) % 900) AS BIGINT) AS n
      |        FROM cls),
      |smp AS (SELECT seed, v, n, unnest(range(0, n)) AS i FROM prm),
      |sv AS (SELECT seed, v, n, i,
      |        ((seed * 7 + v + i * 31) % 65536) - 32768 AS s FROM smp),
      |seg AS (SELECT seed, v, (i * 65) // n AS j, sum(s * s) AS e,
      |        count(*) AS c
      |        FROM sv GROUP BY seed, v, (i * 65) // n),
      |bits AS (SELECT a.seed AS seed, a.v AS v, a.j AS j,
      |         CASE WHEN b.e * a.c > a.e * b.c THEN '1' ELSE '0' END AS bit
      |         FROM seg a JOIN seg b
      |           ON a.seed = b.seed AND a.v = b.v AND b.j = a.j + 1
      |         WHERE a.j < 64),
      |hs AS (SELECT seed, v, string_agg(bit, '' ORDER BY j) AS asig
      |       FROM bits GROUP BY seed, v),
      |cp AS (SELECT a.seed AS sa, a.v AS va, b.seed AS sb, b.v AS vb,
      |         len([i for i in range(1, 65)
      |              if substr(a.asig, i, 1) <> substr(b.asig, i, 1)])
      |           AS hamming
      |       FROM hs a, hs b),
      |pr AS (SELECT da.doc_id AS id_a, db.doc_id AS id_b, cp.hamming
      |       FROM cp
      |       JOIN documents da
      |         ON da.doc_id % 40 = cp.sa AND (da.doc_id // 40) % 2 = cp.va
      |       JOIN documents db
      |         ON db.doc_id % 40 = cp.sb AND (db.doc_id // 40) % 2 = cp.vb
      |       WHERE da.doc_id < db.doc_id AND cp.hamming <= 8)
      |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
      |FROM pr ORDER BY id_a, id_b LIMIT 200""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val seed = id % 40
        val v = (id / 40) % 2
        (id, Multimodal.encodeWav(
          sampleRate = 16000,
          channels = (1 + seed % 2).toInt,
          nFrames = (100 + (seed * 13) % 900).toInt,
          seed = seed * 7 + v))
      })
      .toDF("doc_id", "blob")
    val sigs = Multimodal.decodeAudioSigPartitions(blobs, "blob", "doc_id")
      .select(col("id"), col("asig").as("simhash64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Dedup.hammingNearDupsCollapsed(sigs, maxHamming = 8)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id_a"), col("id_b")).limit(200)
  }

  /** Capstone curation v6 — MULTIMODAL selection under one oracle: a
    * document survives iff its TEXT clears the q28 quality bar (4-dp
    * grid) AND its IMAGE is the canonical copy of its perceptual-hash
    * class (min doc_id per dHash — the q120 census turned into a keep
    * rule, so 49 of every 50 pixel-identical images drop). Per-source
    * summary carries doc counts and kept token sums. The oracle chains
    * the full pixel-arithmetic dHash replay with the quality CTE — the
    * first oracle where image bytes and text signals gate the SAME
    * keep decision, which is what a production multimodal curation
    * pass does.
    *
    * Scale shape: decode map (zero shuffle) → hash-keyed min aggregate
    * (the canonical census) → broadcast-sized join back + quality pure
    * map → one source-keyed aggregate. */
  val q123 = GQuery("q123_curation_v6",
    s"""WITH sd AS (SELECT DISTINCT doc_id % 50 AS seed FROM documents),
      |dim AS (SELECT seed, 9 + seed % 23 AS w, 8 + (seed * 7) % 24 AS h
      |        FROM sd),
      |g AS (SELECT seed, w, h, gxs.gx AS gx, gys.gy AS gy
      |      FROM dim,
      |        (SELECT unnest(range(0, 9)) AS gx) gxs,
      |        (SELECT unnest(range(0, 8)) AS gy) gys),
      |xb AS (SELECT seed, gx, gy,
      |        (gx * w) // 9 AS x0, ((gx + 1) * w) // 9 AS x1,
      |        (gy * h) // 8 AS y0, ((gy + 1) * h) // 8 AS y1 FROM g),
      |px AS (SELECT seed, gx, gy, y0, y1, unnest(range(x0, x1)) AS x
      |       FROM xb),
      |pxy AS (SELECT seed, gx, gy, x, unnest(range(y0, y1)) AS y FROM px),
      |lum AS (SELECT seed, gx, gy,
      |        (((seed + x * 31 + y * 131) % 16777216) // 65536) * 299
      |        + ((((seed + x * 31 + y * 131) % 16777216) // 256) % 256) * 587
      |        + (((seed + x * 31 + y * 131) % 16777216) % 256) * 114 AS l
      |        FROM pxy),
      |ls AS (SELECT seed, gx, gy, sum(l) AS s, count(*) AS c FROM lum
      |       GROUP BY seed, gx, gy),
      |bits AS (SELECT a.seed AS seed, a.gx AS gx, a.gy AS gy,
      |         CASE WHEN b.s * a.c > a.s * b.c THEN '1' ELSE '0' END AS bit
      |         FROM ls a JOIN ls b
      |           ON a.seed = b.seed AND a.gy = b.gy AND b.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |hs AS (SELECT seed, string_agg(bit, '' ORDER BY gy, gx) AS dhash
      |       FROM bits GROUP BY seed),
      |dh AS (SELECT d.doc_id, d.source, h.dhash FROM documents d
      |       JOIN hs h ON d.doc_id % 50 = h.seed),
      |canon AS (SELECT dhash, min(doc_id) AS keep_id FROM dh GROUP BY dhash),
      |${TextQueries.qualityCtesOver("documents")},
      |verdicts AS (
      |  SELECT dh.doc_id, dh.source, q.n_tokens, q.quality,
      |    (q.quality >= 0.5 AND dh.doc_id = c.keep_id) AS kept
      |  FROM dh JOIN canon c USING (dhash) JOIN q ON q.doc_id = dh.doc_id)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
      |    AS kept_tokens
      |FROM verdicts GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import graft.functions.TextFunctions
    val docs = Tables.documents(s, dir)
    val hashed = imgDhashShared(s, dir)
      .select(col("id").as("doc_id"), col("dhash"))
    val canon = hashed.groupBy(col("dhash")).agg(min(col("doc_id")).as("keep_id"))
    val scored = docs.select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    hashed.join(canon, Seq("dhash"))
      .join(scored, Seq("doc_id"))
      .withColumn("kept",
        col("quality") >= 0.5 && col("doc_id") === col("keep_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** REAL MP4 SAMPLE-TABLE decode — completes the payload triad (audio
    * got PCM samples in q119, image got pixels in q120; this takes
    * video past q112's container header): spec-shaped ISO-BMFF blobs
    * now carry a full `mdia/minf/stbl` ([[Multimodal.encodeMp4Sampled]])
    * and [[Multimodal.Mp4StatsCodec]] walks
    * `moov/trak/mdia/minf/stbl` back — frame count from `stsz`
    * (uniform-size AND per-sample layouts both exercised, split on
    * doc_id), track duration from `stts` run-length deltas over the
    * `mdhd` timescale, mean/max frame size, and keyframe count/ratio
    * from `stss` — the video discard signals of a media-curation pass.
    * Every 13th blob is TRUNCATED to 6 bytes and must degrade to the
    * typed corrupt row. The oracle replays the generator formulas
    * (per-sample sizes via unnest(range(n)), integer tick arithmetic),
    * so the hash matches only if the box writer AND the sample-table
    * walk agree field-for-field.
    *
    * Scale shape: one per-partition decode map — zero shuffle,
    * O(sample tables) per blob, `mdat` never touched. */
  val q128 = GQuery("q128_mp4_sample_stats",
    """WITH p AS (
      |  SELECT doc_id,
      |    (doc_id % 13 = 0) AS bad,
      |    30 + (doc_id * 11) % 170 AS n,
      |    1 + doc_id % 7 AS k,
      |    9000 + (doc_id % 5) * 600 AS tsm,
      |    256 + doc_id % 128 AS d1,
      |    (doc_id % 5 = 0) AS uni,
      |    600 + doc_id % 400 AS us
      |  FROM documents),
      |d AS (SELECT p.*,
      |        (n // 2) * d1 + (n - n // 2) * (d1 + 64) AS ticks FROM p),
      |e AS (SELECT doc_id, unnest(range(0, n)) AS i FROM d
      |      WHERE NOT uni AND NOT bad),
      |sz AS (SELECT doc_id, 500 + (doc_id * 31 + i * 97) % 1000 AS s FROM e),
      |szs AS (SELECT doc_id, avg(s) AS mean_s, max(s) AS max_s
      |        FROM sz GROUP BY doc_id)
      |SELECT d.doc_id AS doc_id,
      |  CASE WHEN bad THEN 'corrupt' ELSE 'isom' END AS format,
      |  CAST(CASE WHEN bad THEN -1 ELSE n END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN bad THEN -1 ELSE ticks * 1000 // tsm END AS BIGINT)
      |    AS duration_ms,
      |  round(CASE WHEN bad THEN NULL WHEN uni THEN us
      |             ELSE szs.mean_s END, 4) AS mean_frame_bytes,
      |  CAST(CASE WHEN bad THEN -1 WHEN uni THEN us ELSE szs.max_s END
      |    AS BIGINT) AS max_frame_bytes,
      |  CAST(CASE WHEN bad THEN -1 ELSE (n + k - 1) // k END AS BIGINT)
      |    AS n_keyframes,
      |  round(CASE WHEN bad THEN NULL
      |             ELSE ((n + k - 1) // k) * 1.0 / n END, 4) AS keyframe_ratio
      |FROM d LEFT JOIN szs ON d.doc_id = szs.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val full = Multimodal.encodeMp4Sampled(
          width = (160 + (id % 8) * 16).toInt,
          height = (120 + (id % 6) * 20).toInt,
          nFrames = (30 + (id * 11) % 170).toInt,
          keyEvery = (1 + id % 7).toInt,
          trackTimescale = (9000 + (id % 5) * 600).toInt,
          delta1 = (256 + id % 128).toInt,
          delta2 = (256 + id % 128 + 64).toInt,
          uniformSize = if (id % 5 == 0) (600 + id % 400).toInt else 0,
          seed = id)
        (id, if (id % 13 == 0) full.take(6) else full)
      })
      .toDF("doc_id", "blob")
    Multimodal.decodeVideoStatsPartitions(blobs, "blob", "doc_id")
      .select(col("id").as("doc_id"), col("format"), col("n_frames"),
        col("duration_ms"),
        round(col("mean_frame_bytes"), 4).as("mean_frame_bytes"),
        col("max_frame_bytes"), col("n_keyframes"),
        round(col("keyframe_ratio"), 4).as("keyframe_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Mega-class-safe image duplicate GROUPS
    * ([[graft.operators.Dedup.hammingDupGroups]]) — the group-emission
    * form of the q120 census under a full oracle: every image is
    * pixel-decoded and dHashed, and each identical-signature class
    * reports ONE row (hash, representative = min doc_id, true member
    * count, the `maxMembers` smallest ids comma-joined, overflow
    * census) instead of O(g²) pairs — the shape that survives a
    * 10⁵-copy viral-image class. The fixture's 50 seed classes carry
    * 10 members each at sf0.001 (100 at sf0.01), so the member CAP and
    * the overflow arithmetic are both load-bearing under the oracle,
    * which replays the pixel arithmetic and the capped/overflowed
    * group report. */
  val q129 = GQuery("q129_image_dup_groups",
    """WITH sd AS (SELECT DISTINCT doc_id % 50 AS seed FROM documents),
      |dim AS (SELECT seed, 9 + seed % 23 AS w, 8 + (seed * 7) % 24 AS h
      |        FROM sd),
      |g AS (SELECT seed, w, h, gxs.gx AS gx, gys.gy AS gy
      |      FROM dim,
      |        (SELECT unnest(range(0, 9)) AS gx) gxs,
      |        (SELECT unnest(range(0, 8)) AS gy) gys),
      |xb AS (SELECT seed, gx, gy,
      |        (gx * w) // 9 AS x0, ((gx + 1) * w) // 9 AS x1,
      |        (gy * h) // 8 AS y0, ((gy + 1) * h) // 8 AS y1 FROM g),
      |px AS (SELECT seed, gx, gy, y0, y1, unnest(range(x0, x1)) AS x
      |       FROM xb),
      |pxy AS (SELECT seed, gx, gy, x, unnest(range(y0, y1)) AS y FROM px),
      |lum AS (SELECT seed, gx, gy,
      |        (((seed + x * 31 + y * 131) % 16777216) // 65536) * 299
      |        + ((((seed + x * 31 + y * 131) % 16777216) // 256) % 256) * 587
      |        + (((seed + x * 31 + y * 131) % 16777216) % 256) * 114 AS l
      |        FROM pxy),
      |ls AS (SELECT seed, gx, gy, sum(l) AS s, count(*) AS c FROM lum
      |       GROUP BY seed, gx, gy),
      |bits AS (SELECT a.seed AS seed, a.gx AS gx, a.gy AS gy,
      |         CASE WHEN b.s * a.c > a.s * b.c THEN '1' ELSE '0' END AS bit
      |         FROM ls a JOIN ls b
      |           ON a.seed = b.seed AND a.gy = b.gy AND b.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |hs AS (SELECT seed, string_agg(bit, '' ORDER BY gy, gx) AS dhash
      |       FROM bits GROUP BY seed),
      |dh AS (SELECT d.doc_id, h.dhash FROM documents d
      |       JOIN hs h ON d.doc_id % 50 = h.seed),
      |gr AS (SELECT dhash, doc_id,
      |        row_number() OVER (PARTITION BY dhash ORDER BY doc_id) AS rn,
      |        count(*) OVER (PARTITION BY dhash) AS n FROM dh)
      |SELECT dhash,
      |  CAST(min(doc_id) AS BIGINT) AS rep_id,
      |  CAST(max(n) AS BIGINT) AS n_members,
      |  string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END,
      |    ',' ORDER BY doc_id) AS members,
      |  CAST(greatest(max(n) - 8, 0) AS BIGINT) AS n_overflow
      |FROM gr GROUP BY dhash HAVING max(n) >= 2
      |ORDER BY dhash""".stripMargin) { (s, dir) =>
    val sigs = imgDhashShared(s, dir)
      .select(col("id"), col("dhash").as("simhash64"))
    graft.operators.Dedup.hammingDupGroups(sigs, maxMembers = 8)
      .select(col("simhash64").as("dhash"), col("rep_id"), col("n_members"),
        array_join(col("members"), ",").as("members"), col("n_overflow"))
      .orderBy(col("dhash"))
  }

  /** Video NEAR-duplicate pairing — completes the perceptual dedup
    * triad (image dHash q121, audio energy q122):
    * [[Multimodal.VideoSigCodec]] fingerprints REAL ISO-BMFF sample
    * tables by 65-segment frame-size profile, and the collapsed
    * banded-Hamming pairer surfaces duplicates. Each document carries
    * one of 80 distinct streams (seed = doc_id mod 40 × two variants
    * whose per-sample sizes shift by a constant +31 mod 1000 — the
    * cross-multiplied comparison cancels a pure additive shift
    * exactly, so ONLY the samples that wrap past the modulus flip
    * segment order: the variant lands a few Hamming bits away from
    * real integer arithmetic, not a synthetic perturbation). The
    * oracle replays sizes → segment sums → bits → class distances and
    * expands class pairs to doc pairs. */
  val q131 = GQuery("q131_video_neardup",
    """WITH cls AS (SELECT DISTINCT doc_id % 40 AS seed,
      |              (doc_id // 40) % 2 AS v FROM documents),
      |prm AS (SELECT seed, v,
      |        CAST(70 + (seed * 11) % 160 AS BIGINT) AS n FROM cls),
      |smp AS (SELECT seed, v, n, unnest(range(0, n)) AS i FROM prm),
      |sv AS (SELECT seed, v, n, i,
      |        500 + ((seed * 2 + v) * 31 + i * 97) % 1000 AS s FROM smp),
      |seg AS (SELECT seed, v, (i * 65) // n AS j, sum(s) AS e,
      |        count(*) AS c
      |        FROM sv GROUP BY seed, v, (i * 65) // n),
      |bits AS (SELECT a.seed AS seed, a.v AS v, a.j AS j,
      |         CASE WHEN b.e * a.c > a.e * b.c THEN '1' ELSE '0' END AS bit
      |         FROM seg a JOIN seg b
      |           ON a.seed = b.seed AND a.v = b.v AND b.j = a.j + 1
      |         WHERE a.j < 64),
      |hs AS (SELECT seed, v, string_agg(bit, '' ORDER BY j) AS vsig
      |       FROM bits GROUP BY seed, v),
      |cp AS (SELECT a.seed AS sa, a.v AS va, b.seed AS sb, b.v AS vb,
      |         len([i for i in range(1, 65)
      |              if substr(a.vsig, i, 1) <> substr(b.vsig, i, 1)])
      |           AS hamming
      |       FROM hs a, hs b),
      |pr AS (SELECT da.doc_id AS id_a, db.doc_id AS id_b, cp.hamming
      |       FROM cp
      |       JOIN documents da
      |         ON da.doc_id % 40 = cp.sa AND (da.doc_id // 40) % 2 = cp.va
      |       JOIN documents db
      |         ON db.doc_id % 40 = cp.sb AND (db.doc_id // 40) % 2 = cp.vb
      |       WHERE da.doc_id < db.doc_id AND cp.hamming <= 8)
      |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
      |FROM pr ORDER BY id_a, id_b LIMIT 200""".stripMargin) { (s, dir) =>
    val sigs = vidSigShared(s, dir)
      .select(col("id"), col("vsig").as("simhash64"))
    graft.operators.Dedup.hammingNearDupsCollapsed(sigs, maxHamming = 8)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id_a"), col("id_b")).limit(200)
  }

  /** Keyframe-aligned frame sampling from REAL sample tables
    * ([[Multimodal.sampleKeyframes]]) — the production upgrade of
    * q35's pseudo-count plumbing: a sampler decodes only sync samples
    * (keyframes need no reference chain), so the emitted rows ARE the
    * `stss` table — one row per keyframe with the stream's frame
    * count. The oracle replays the generator's sync-sample grid
    * (1, 1+k, …) and the corrupt exclusion (truncated every-13th blobs
    * emit nothing), so the hash matches only if the stss walk and the
    * explode agree row-for-row. */
  val q132 = GQuery("q132_keyframe_sample",
    """WITH p AS (
      |  SELECT doc_id, (doc_id % 13 = 0) AS bad,
      |    30 + (doc_id * 11) % 170 AS n,
      |    1 + doc_id % 7 AS k
      |  FROM documents),
      |kf AS (SELECT doc_id, n,
      |        1 + unnest(range(0, (n + k - 1) // k)) * k AS sn
      |       FROM p WHERE NOT bad)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_frames,
      |  CAST(sn AS BIGINT) AS sample_number
      |FROM kf ORDER BY doc_id, sample_number""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val full = Multimodal.encodeMp4Sampled(
          width = (160 + (id % 8) * 16).toInt,
          height = (120 + (id % 6) * 20).toInt,
          nFrames = (30 + (id * 11) % 170).toInt,
          keyEvery = (1 + id % 7).toInt,
          trackTimescale = (9000 + (id % 5) * 600).toInt,
          delta1 = (256 + id % 128).toInt,
          delta2 = (256 + id % 128 + 64).toInt,
          uniformSize = if (id % 5 == 0) (600 + id % 400).toInt else 0,
          seed = id)
        (id, if (id % 13 == 0) full.take(6) else full)
      })
      .toDF("doc_id", "blob")
    Multimodal.sampleKeyframes(blobs, "blob", "doc_id")
      .select(col("id").as("doc_id"), col("n_frames"), col("sample_number"))
      .orderBy(col("doc_id"), col("sample_number"))
  }

  /** Capstone curation v8 — the full MULTIMODAL TRIAD under one
    * oracle: a document survives iff its TEXT clears the quality bar
    * (q28 4-dp grid), its IMAGE is the canonical copy of its
    * perceptual-hash class (q120 census), AND its VIDEO stream is the
    * canonical copy of its frame-size-profile class (q131 signature) —
    * three REAL byte-decode kernels gating ONE keep decision, which is
    * the shape of a production multimodal curation pass. The oracle
    * chains the complete pixel-arithmetic dHash replay, the complete
    * sizes→segments→bits video replay, and the quality CTE into a
    * single statement.
    *
    * Scale shape: two zero-shuffle decode maps + one pure-map quality
    * score → two hash-keyed min aggregates (broadcast-sized canons) →
    * joins back → one source-keyed aggregate. */
  val q133 = GQuery("q133_curation_v8",
    s"""WITH sd AS (SELECT DISTINCT doc_id % 50 AS seed FROM documents),
      |dim AS (SELECT seed, 9 + seed % 23 AS w, 8 + (seed * 7) % 24 AS h
      |        FROM sd),
      |g AS (SELECT seed, w, h, gxs.gx AS gx, gys.gy AS gy
      |      FROM dim,
      |        (SELECT unnest(range(0, 9)) AS gx) gxs,
      |        (SELECT unnest(range(0, 8)) AS gy) gys),
      |xb AS (SELECT seed, gx, gy,
      |        (gx * w) // 9 AS x0, ((gx + 1) * w) // 9 AS x1,
      |        (gy * h) // 8 AS y0, ((gy + 1) * h) // 8 AS y1 FROM g),
      |px AS (SELECT seed, gx, gy, y0, y1, unnest(range(x0, x1)) AS x
      |       FROM xb),
      |pxy AS (SELECT seed, gx, gy, x, unnest(range(y0, y1)) AS y FROM px),
      |lum AS (SELECT seed, gx, gy,
      |        (((seed + x * 31 + y * 131) % 16777216) // 65536) * 299
      |        + ((((seed + x * 31 + y * 131) % 16777216) // 256) % 256) * 587
      |        + (((seed + x * 31 + y * 131) % 16777216) % 256) * 114 AS l
      |        FROM pxy),
      |ls AS (SELECT seed, gx, gy, sum(l) AS s, count(*) AS c FROM lum
      |       GROUP BY seed, gx, gy),
      |ibits AS (SELECT a.seed AS seed, a.gx AS gx, a.gy AS gy,
      |         CASE WHEN b.s * a.c > a.s * b.c THEN '1' ELSE '0' END AS bit
      |         FROM ls a JOIN ls b
      |           ON a.seed = b.seed AND a.gy = b.gy AND b.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |ihs AS (SELECT seed, string_agg(bit, '' ORDER BY gy, gx) AS dhash
      |       FROM ibits GROUP BY seed),
      |dh AS (SELECT d.doc_id, h.dhash FROM documents d
      |       JOIN ihs h ON d.doc_id % 50 = h.seed),
      |vcls AS (SELECT DISTINCT doc_id % 40 AS seed,
      |          (doc_id // 40) % 2 AS v FROM documents),
      |vprm AS (SELECT seed, v,
      |        CAST(70 + (seed * 11) % 160 AS BIGINT) AS n FROM vcls),
      |vsmp AS (SELECT seed, v, n, unnest(range(0, n)) AS i FROM vprm),
      |vsv AS (SELECT seed, v, n, i,
      |        500 + ((seed * 2 + v) * 31 + i * 97) % 1000 AS s FROM vsmp),
      |vseg AS (SELECT seed, v, (i * 65) // n AS j, sum(s) AS e,
      |        count(*) AS c
      |        FROM vsv GROUP BY seed, v, (i * 65) // n),
      |vbits AS (SELECT a.seed AS seed, a.v AS v, a.j AS j,
      |         CASE WHEN b.e * a.c > a.e * b.c THEN '1' ELSE '0' END AS bit
      |         FROM vseg a JOIN vseg b
      |           ON a.seed = b.seed AND a.v = b.v AND b.j = a.j + 1
      |         WHERE a.j < 64),
      |vhs AS (SELECT seed, v, string_agg(bit, '' ORDER BY j) AS vsig
      |       FROM vbits GROUP BY seed, v),
      |vdh AS (SELECT d.doc_id, h.vsig FROM documents d
      |       JOIN vhs h ON d.doc_id % 40 = h.seed
      |         AND (d.doc_id // 40) % 2 = h.v),
      |${TextQueries.qualityCtesOver("documents")},
      |icanon AS (SELECT dhash, min(doc_id) AS keep_img FROM dh GROUP BY dhash),
      |vcanon AS (SELECT vsig, min(doc_id) AS keep_vid FROM vdh GROUP BY vsig),
      |verdicts AS (
      |  SELECT dh.doc_id, d.source, q.n_tokens,
      |    (q.quality >= 0.5 AND dh.doc_id = ic.keep_img
      |      AND vdh.doc_id = vc.keep_vid) AS kept
      |  FROM dh JOIN icanon ic USING (dhash)
      |  JOIN vdh ON vdh.doc_id = dh.doc_id
      |  JOIN vcanon vc USING (vsig)
      |  JOIN q ON q.doc_id = dh.doc_id
      |  JOIN documents d ON d.doc_id = dh.doc_id)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
      |    AS kept_tokens
      |FROM verdicts GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import graft.functions.TextFunctions
    val docs = Tables.documents(s, dir)
    val imgHashed = imgDhashShared(s, dir)
      .select(col("id").as("doc_id"), col("dhash"))
    val vidSigs = vidSigShared(s, dir)
      .select(col("id").as("doc_id"), col("vsig"))
    val icanon = imgHashed.groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("keep_img"))
    val vcanon = vidSigs.groupBy(col("vsig"))
      .agg(min(col("doc_id")).as("keep_vid"))
    val scored = docs.select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    imgHashed.join(icanon, Seq("dhash"))
      .join(vidSigs, Seq("doc_id"))
      .join(vcanon, Seq("vsig"))
      .join(scored, Seq("doc_id"))
      .withColumn("kept",
        col("quality") >= 0.5 && col("doc_id") === col("keep_img") &&
          col("doc_id") === col("keep_vid"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** Per-source image color profile (see
    * [[graft.operators.Multimodal.ChannelStatsCodec]]): REAL
    * full-raster decode → exact integer channel sums → per-source
    * channel means on the grid — the color-cast / tint-drift detector
    * (a broken thumbnailer or camera-pipeline change shifts a whole
    * source's balance). Corrupt blobs (every 13th truncated) count
    * separately and never contribute pixels. The oracle replays the
    * generator's full pixel arithmetic per (x, y). */
  val q175 = GQuery("q175_image_color_census",
    """WITH m AS (
      |  SELECT doc_id, source, (doc_id % 13 = 0) AS bad,
      |    8 + doc_id % 24 AS w, 8 + (doc_id * 7) % 24 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (
      |  SELECT doc_id, source, w, h, unnest(range(0, w)) AS x
      |  FROM m WHERE NOT bad),
      |px AS (
      |  SELECT doc_id, source,
      |    ((doc_id + x * 31 + unnest(range(0, h)) * 131) % 16777216) AS v
      |  FROM xs),
      |sums AS (
      |  SELECT source, count(*) AS n_px,
      |    CAST(sum((v // 65536) % 256) AS BIGINT) AS sum_r,
      |    CAST(sum((v // 256) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum(v % 256) AS BIGINT) AS sum_b
      |  FROM px GROUP BY source),
      |cnts AS (
      |  SELECT source, count(*) AS n_images,
      |    CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
      |  FROM m GROUP BY source)
      |SELECT c.source, c.n_images, c.n_corrupt,
      |  CAST(s.n_px AS BIGINT) AS n_px,
      |  CAST(round(1e4 * s.sum_r / s.n_px) AS BIGINT) AS mean_r4,
      |  CAST(round(1e4 * s.sum_g / s.n_px) AS BIGINT) AS mean_g4,
      |  CAST(round(1e4 * s.sum_b / s.n_px) AS BIGINT) AS mean_b4
      |FROM cnts c JOIN sums s USING (source)
      |ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val ids = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
    val blobs = ids.mapPartitions(_.map { id =>
      val bytes = Multimodal.encodePng(
        (8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, seed = id)
      (id, if (id % 13 == 0) bytes.take(6) else bytes)
    }).toDF("doc_id", "blob")
    val st = Multimodal
      .decodeImageChannelStatsPartitions(blobs, "blob", "doc_id")
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
    val sums = st.where(col("format") =!= "corrupt")
      .groupBy("source")
      .agg(sum(col("n_px")).as("n_px"), sum(col("sum_r")).as("sum_r"),
        sum(col("sum_g")).as("sum_g"), sum(col("sum_b")).as("sum_b"))
    val cnts = st.groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        sum(when(col("format") === "corrupt", 1L).otherwise(0L))
          .as("n_corrupt"))
    cnts.join(sums, "source")
      .select(col("source"), col("n_images"), col("n_corrupt"), col("n_px"),
        round(lit(1e4) * col("sum_r") / col("n_px")).cast("long").as("mean_r4"),
        round(lit(1e4) * col("sum_g") / col("n_px")).cast("long").as("mean_g4"),
        round(lit(1e4) * col("sum_b") / col("n_px")).cast("long").as("mean_b4"))
      .orderBy(col("source"))
  }

  /** Thumbnail census (see [[graft.operators.Multimodal.ThumbCodec]]):
    * REAL decode → 4×4 nearest-neighbor resize (`src = ⌊t·W/tw⌋`, pure
    * integer arithmetic — the property that makes a resampler
    * oracle-able) → per-source exact channel sums of the THUMBNAILS.
    * The transform face of the image family; corrupt blobs (every
    * 13th truncated) count separately. The oracle replays the
    * generator's pixel formula AT the nearest-neighbor source
    * coordinates. */
  val q190 = GQuery("q190_thumbnail_census",
    """WITH m AS (
      |  SELECT doc_id, source, (doc_id % 13 = 0) AS bad,
      |    8 + doc_id % 24 AS w, 8 + (doc_id * 7) % 24 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |txs AS (
      |  SELECT doc_id, source, w, h, unnest(range(0, 4)) AS tx
      |  FROM m WHERE NOT bad),
      |px AS (
      |  SELECT doc_id, source,
      |    ((doc_id + ((tx * w) // 4) * 31
      |      + ((unnest(range(0, 4)) * h) // 4) * 131) % 16777216) AS v
      |  FROM txs),
      |sums AS (
      |  SELECT source, count(*) AS n_px,
      |    CAST(sum((v // 65536) % 256) AS BIGINT) AS sum_r,
      |    CAST(sum((v // 256) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum(v % 256) AS BIGINT) AS sum_b
      |  FROM px GROUP BY source),
      |cnts AS (
      |  SELECT source, count(*) AS n_images,
      |    CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
      |  FROM m GROUP BY source)
      |SELECT c.source, c.n_images, c.n_corrupt,
      |  s.sum_r, s.sum_g, s.sum_b
      |FROM cnts c JOIN sums s USING (source)
      |ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val ids = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
    val blobs = ids.mapPartitions(_.map { id =>
      val bytes = Multimodal.encodePng(
        (8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, seed = id)
      (id, if (id % 13 == 0) bytes.take(6) else bytes)
    }).toDF("doc_id", "blob")
    val st = Multimodal
      .decodeThumbStatsPartitions(blobs, "blob", "doc_id", tw = 4, th = 4)
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
    val sums = st.where(col("format") =!= "corrupt")
      .groupBy("source")
      .agg(sum(col("sum_r")).as("sum_r"), sum(col("sum_g")).as("sum_g"),
        sum(col("sum_b")).as("sum_b"))
    val cnts = st.groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        sum(when(col("format") === "corrupt", 1L).otherwise(0L))
          .as("n_corrupt"))
    cnts.join(sums, "source")
      .select(col("source"), col("n_images"), col("n_corrupt"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy(col("source"))
  }

  /** Patch-grid luma census (see
    * [[graft.operators.Multimodal.PatchStatsCodec]]): real raster
    * decode onto the 4×4 ViT-style patch grid, exact per-patch luma
    * means, and the per-image patch CONTRAST (max−min patch mean —
    * the flat-image/letterbox discard signal), rolled up per source.
    * Same corpus as q175 (every 3rd doc, every 13th blob truncated);
    * the oracle replays the generator's pixel arithmetic AND the
    * integer patch quantization per (x, y). */
  val q232 = GQuery("q232_image_patch_census",
    """WITH m AS (
      |  SELECT doc_id, source, (doc_id % 13 = 0) AS bad,
      |    8 + doc_id % 24 AS w, 8 + (doc_id * 7) % 24 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (
      |  SELECT doc_id, source, w, h, unnest(range(0, w)) AS x
      |  FROM m WHERE NOT bad),
      |pxy AS (
      |  SELECT doc_id, source, w, h, x, unnest(range(0, h)) AS y
      |  FROM xs),
      |lum AS (
      |  SELECT doc_id, source,
      |    (y * 4) // h AS py, (x * 4) // w AS pxc,
      |    ((doc_id + x * 31 + y * 131) % 16777216) AS v
      |  FROM pxy),
      |pat AS (
      |  SELECT doc_id, source, py, pxc, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(((v // 65536) % 256) * 299 + ((v // 256) % 256) * 587
      |      + (v % 256) * 114) AS BIGINT) AS sl
      |  FROM lum GROUP BY 1, 2, 3, 4),
      |pm AS (SELECT doc_id, source,
      |  CAST(round(CAST(sl AS DOUBLE) / n) AS BIGINT) AS meanm FROM pat),
      |ci AS (
      |  SELECT doc_id, source, max(meanm) - min(meanm) AS contrast,
      |    CAST(count(*) AS BIGINT) AS n_patches
      |  FROM pm GROUP BY 1, 2),
      |per AS (
      |  SELECT source, count(*) AS n_images,
      |    CAST(round(avg(contrast)) AS BIGINT) AS avg_contrast,
      |    max(contrast) AS max_contrast, min(n_patches) AS min_patches
      |  FROM ci GROUP BY source),
      |co AS (
      |  SELECT source,
      |    CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
      |  FROM m GROUP BY source)
      |SELECT p.source, p.n_images, coalesce(co.n_corrupt, 0) AS n_corrupt,
      |  p.avg_contrast, p.max_contrast, p.min_patches
      |FROM per p LEFT JOIN co USING (source)
      |ORDER BY source""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val ids = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
    val blobs = ids.mapPartitions(_.map { id =>
      val bytes = Multimodal.encodePng(
        (8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, seed = id)
      (id, if (id % 13 == 0) bytes.take(6) else bytes)
    }).toDF("doc_id", "blob")
    val st = Multimodal
      .decodeImagePatchStatsPartitions(blobs, "blob", "doc_id", grid = 4)
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
    val ci = st.where(col("format") =!= "corrupt")
      .withColumn("meanm",
        round(col("sum_luma").cast("double") / col("n_px")).cast("long"))
      .groupBy(col("id"), col("source"))
      .agg((max(col("meanm")) - min(col("meanm"))).as("contrast"),
        count(lit(1)).as("n_patches"))
    val per = ci.groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        round(avg(col("contrast"))).cast("long").as("avg_contrast"),
        max(col("contrast")).as("max_contrast"),
        min(col("n_patches")).as("min_patches"))
    val corrupt = st.where(col("format") === "corrupt")
      .groupBy("source").agg(count(lit(1)).as("n_corrupt"))
    per.join(corrupt, Seq("source"), "left")
      .select(col("source"), col("n_images"),
        coalesce(col("n_corrupt"), lit(0L)).as("n_corrupt"),
        col("avg_contrast"), col("max_contrast"), col("min_patches"))
      .orderBy(col("source"))
  }

  /** Sobel edge-energy census (see
    * [[graft.operators.Multimodal.EdgeStatsCodec]]): real raster decode
    * → integer BT.601 luma → the two 3×3 Sobel convolutions over the
    * interior → exact Σ(|Gx|+|Gy|), peak gradient, and flat-pixel
    * count per image — the cheap blur/flat discard signal of a
    * vision-corpus pass. Same 50-seed image classes as q120 (seed =
    * doc_id mod 50 fixes dimensions AND pixels), so the oracle replays
    * the ENTIRE convolution from the generator's pixel formula: luma
    * per (x, y), an 8-row neighbor-offset/weight table joined against
    * the luma grid, gradient sums per interior pixel, exact integer
    * aggregates per class expanded back to documents. A hash match
    * means the PNG round-trip, the luma weighting, and every Sobel
    * term agree with the replay.
    *
    * Scale shape: per-partition decode + convolution (zero shuffle,
    * O(pixels) per blob); the only shuffle is the final orderBy. */
  val q255 = GQuery("q255_image_edge_energy",
    """WITH sd AS (SELECT DISTINCT doc_id % 50 AS seed FROM documents),
      |dim AS (SELECT seed, 9 + seed % 23 AS w, 8 + (seed * 7) % 24 AS h
      |        FROM sd),
      |xs AS (SELECT seed, w, h, unnest(range(0, w)) AS x FROM dim),
      |pxy AS (SELECT seed, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |lum AS (SELECT seed, w, h, x, y,
      |  (((seed + x * 31 + y * 131) % 16777216) // 65536) * 299
      |  + ((((seed + x * 31 + y * 131) % 16777216) // 256) % 256) * 587
      |  + (((seed + x * 31 + y * 131) % 16777216) % 256) * 114 AS l
      |  FROM pxy),
      |ip AS (SELECT seed, x, y FROM lum
      |  WHERE x >= 1 AND x <= w - 2 AND y >= 1 AND y <= h - 2),
      |off AS (SELECT * FROM (VALUES
      |  (-1, -1, -1, -1), (0, -1, 0, -2), (1, -1, 1, -1),
      |  (-1, 0, -2, 0), (1, 0, 2, 0),
      |  (-1, 1, -1, 1), (0, 1, 0, 2), (1, 1, 1, 1))
      |  AS t(dx, dy, wx, wy)),
      |g AS (SELECT ip.seed AS seed, ip.x AS x, ip.y AS y,
      |   sum(o.wx * n.l) AS gx, sum(o.wy * n.l) AS gy
      | FROM ip CROSS JOIN off o
      | JOIN lum n ON n.seed = ip.seed AND n.x = ip.x + o.dx
      |   AND n.y = ip.y + o.dy
      | GROUP BY 1, 2, 3),
      |agg AS (SELECT seed,
      |  CAST(count(*) AS BIGINT) AS n_interior,
      |  CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS edge_sum,
      |  CAST(max(abs(gx) + abs(gy)) AS BIGINT) AS max_grad,
      |  CAST(sum(CASE WHEN abs(gx) + abs(gy) = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_flat
      | FROM g GROUP BY seed)
      |SELECT d.doc_id, 'png' AS format,
      |  CAST(m.w AS INT) AS width, CAST(m.h AS INT) AS height,
      |  a.n_interior, a.edge_sum, a.max_grad, a.n_flat
      |FROM documents d
      |JOIN dim m ON d.doc_id % 50 = m.seed
      |JOIN agg a ON a.seed = m.seed
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val seed = id % 50
        (id, Multimodal.encodePng(
          (9 + seed % 23).toInt, (8 + (seed * 7) % 24).toInt, seed = seed))
      })
      .toDF("doc_id", "blob")
    Multimodal.decodeImageEdgeStatsPartitions(blobs, "blob", "doc_id")
      .select(col("id").as("doc_id"), col("format"), col("width"),
        col("height"), col("n_interior"), col("edge_sum"),
        col("max_grad"), col("n_flat"))
      .orderBy(col("doc_id"))
  }

  /** Zero-crossing-rate census (see
    * [[graft.operators.Multimodal.ZcrStatsCodec]]): the
    * voiced/unvoiced/silence discriminator over REAL PCM payloads —
    * per-channel sign changes between consecutive frames plus the
    * exact Σ|sample| loudness proxy, q119's energy sibling. Same WAV
    * fixture family as q119 (rate/channels/frames derive from doc_id),
    * and because the generator's sample formula is closed-form the
    * oracle replays BOTH the sample and its same-channel predecessor
    * ((doc_id + (i − ch)·31) mod 2¹⁶ − 2¹⁵) directly — no join, no
    * window — so a hash match proves the RIFF walk, the channel
    * de-interleave, and every crossing comparison. */
  val q256 = GQuery("q256_audio_zcr",
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
      |    CAST(1 + doc_id % 2 AS INT) AS ch,
      |    CAST(100 + (doc_id * 13) % 900 AS BIGINT) AS nf
      |  FROM documents),
      |s AS (SELECT doc_id, sample_rate, ch, nf,
      |        unnest(range(0, nf * ch)) AS i FROM p),
      |v AS (SELECT doc_id, sample_rate, ch, nf,
      |  ((doc_id + i * 31) % 65536) - 32768 AS v,
      |  CASE WHEN i >= ch
      |    THEN ((doc_id + (i - ch) * 31) % 65536) - 32768 END AS pv
      |  FROM s)
      |SELECT doc_id, 'wav' AS format,
      |  max(sample_rate) AS sample_rate, max(ch) AS channels,
      |  max(nf) AS n_frames,
      |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
      |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.encodeWav(
          sampleRate = (8000 + (id % 8) * 1000).toInt,
          channels = (1 + id % 2).toInt,
          nFrames = (100 + (id * 13) % 900).toInt,
          seed = id))
      })
      .toDF("doc_id", "blob")
    Multimodal.decodeAudioZcrPartitions(blobs, "blob", "doc_id")
      .select(col("id").as("doc_id"), col("format"), col("sample_rate"),
        col("channels"), col("n_frames"), col("n_crossings"),
        col("sum_abs"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[GQuery] =
    Seq(q34, q34b, q35, q110, q112, q116, q119, q120, q121, q122, q123,
      q128, q129, q131, q132, q133, q175, q190, q232, q255, q256)
}
