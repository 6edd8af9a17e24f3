package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (charter extension, SURVEY.md §2.10):
  * image/audio/video content is carried as an opaque `binary` column
  * plus typed metadata, and decode/feature-extraction runs as BATCHED
  * per-partition transforms (the Scala analogue of arrow-batched
  * Pandas UDFs: one `mapPartitions` pass, amortizing per-batch setup
  * the way a real codec would amortize model/library init).
  *
  * The decode itself is a clearly-marked deterministic STUB — the
  * container has no image/audio codecs — but everything Spark-side is
  * real and tested: the schema, the binary payload path, the batch
  * shape, and the partition-parallel execution. Swap `decodeOne` for a
  * JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** An opaque media payload + metadata row. */
  case class MediaDoc(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Int)

  /** Decoded features: fake "image" dims + a 16-dim feature vector. */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, feat: Array[Float])

  /** Wrap the documents table as media payloads (UTF-8 bytes stand in
    * for image bytes). */
  def toMediaDocs(documents: DataFrame): Dataset[MediaDoc] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"),
        col("text").cast("binary").as("media"),
        lit("application/octet-stream").as("mime"),
        expr("octet_length(text)").as("n_bytes"))
      .as[MediaDoc]
  }

  /** STUB decode — deterministic fake for an image decoder.
    * Real implementation would hand `batch.map(_.media)` to a codec;
    * the arithmetic below is mirrored by the q97 oracle. */
  private def decodeOne(m: MediaDoc): MediaFeatures = {
    val width = 32 + m.n_bytes % 97
    val height = 32 + (m.n_bytes * 7) % 97
    val feat = new Array[Float](16)
    var i = 0
    while (i < 16) {
      feat(i) = if (i < m.media.length) (m.media(i) & 0xff) / 255.0f else 0.0f
      i += 1
    }
    MediaFeatures(m.doc_id, width, height, feat)
  }

  /** Batched per-partition decode: `grouped(batchSize)` gives the
    * codec its batch shape without materializing the partition. */
  def decodeFeatures(ds: Dataset[MediaDoc], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real codec: decodeBatch(batch.map(_.media)); stub: per-row
        batch.map(decodeOne)
      }
    }
  }

  /** Video frame-sampling stub: every n-th fixed-size byte window. */
  def frameSample(media: Array[Byte], frameBytes: Int, everyN: Int): Seq[Array[Byte]] =
    media.grouped(frameBytes).zipWithIndex
      .collect { case (frame, i) if i % everyN == 0 => frame }
      .toSeq

  /** Image resize stub: nearest-neighbour downsample of a byte matrix
    * to (w, h) — deterministic stand-in with the real signature (a
    * codec would interpolate pixels; the byte-index arithmetic and the
    * output shape are what the pipeline depends on). */
  def resizeStub(media: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        val sy = y * srcH / dstH
        val idx = sy * srcW + sx
        out(y * dstW + x) = if (idx < media.length) media(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** dHash perceptual hash over the stub-decoded "image" — the
    * classic image near-dup signature: downsample to a 9×8 grid
    * (resizeStub — the real pipeline's codec resize), then bit j
    * (j = 8·y + x) records whether pixel (x, y) outbrightens its
    * right neighbour. Emitted as FOUR 16-bit band values rather than
    * one 64-bit word: bands are exactly the LSH blocking unit a
    * near-dup join buckets on (share a band → candidate pair, the
    * q103 SimHash discipline), and 16-bit integers survive every
    * SQL dialect without 64-bit shift/overflow gymnastics. Identical
    * media hash identically on any engine; a local pixel change
    * flips only the bits whose samples cross it. */
  def dHashBands(media: Array[Byte], srcW: Int, srcH: Int): (Int, Int, Int, Int) = {
    val r = resizeStub(media, srcW, srcH, 9, 8)
    val bands = new Array[Int](4)
    var j = 0
    while (j < 64) {
      val x = j % 8
      val y = j / 8
      val a = r(y * 9 + x) & 0xff
      val b = r(y * 9 + x + 1) & 0xff
      if (a > b) bands(j / 16) |= 1 << (j % 16)
      j += 1
    }
    (bands(0), bands(1), bands(2), bands(3))
  }

  /** q151: the perceptual-hash pipeline as a query — binary wrap →
    * image geometry → resize → dHash bands, one map-side Dataset pass
    * (the shape a real image-dedup job has: decode and hash fused per
    * partition, only the 8-byte signature shuffles). The stand-in
    * geometry must COVER the payload (width from the q97 stub,
    * height = ceil(n/width)) — a matrix larger than the bytes leaves
    * most sample rows in zero padding and collapses the hash to its
    * first band (observed on the q97 dims: only row 0 carried
    * signal). The oracle replays the full resize + compare arithmetic
    * in SQL — integer division and zero-padding agree
    * index-for-index. */
  /** Per-doc dHash bands (doc_id, h0..h3) — q151's body, shared with
    * q203's banded near-dup join. */
  private def dHashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    toMediaDocs(graft.Tables.spread(s, graft.Tables.documents(s, d)))
      .map { m =>
        val w = 32 + m.n_bytes % 97
        val h = math.max(1, (m.n_bytes + w - 1) / w)
        val (h0, h1, h2, h3) = dHashBands(m.media, w, h)
        (m.doc_id, h0, h1, h2, h3)
      }
      .toDF("doc_id", "h0", "h1", "h2", "h3")
  }

  def q151(s: SparkSession, d: String): DataFrame =
    dHashFrame(s, d).transform(graft.queries.Det.emitWide(_, "doc_id"))

  /** q203: MEDIA NEAR-DUP pairs (round 15 — the image twin of q103's
    * SimHash banding, completing the multimodal family's dedup path:
    * decode→hash is q151's fused map-side pass, and only the 8-byte
    * signature ever shuffles): perceptual-hash pairs at hamming ≤ 3
    * over the 64-bit dHash, candidates from the 16-bit band
    * equi-join — ≤ 3 flipped bits leave ≥ 1 of 4 bands intact
    * (pigeonhole, exact), so the bucket join ∝ band occupancy, never
    * media². The oracle is the BRUTE-FORCE all-pairs hamming join
    * over the SQL-replayed resize+compare arithmetic, so the banding
    * completeness is hash-proven per run (q103/q148 discipline). */
  def q203(s: SparkSession, d: String): DataFrame = {
    val hashes = graft.queries.Det.pin(dHashFrame(s, d))
    val banded = hashes.select(col("doc_id"), col("h0"), col("h1"),
      col("h2"), col("h3"),
      explode(expr("""array(named_struct('bi', 0, 'bv', h0),
                           named_struct('bi', 1, 'bv', h1),
                           named_struct('bi', 2, 'bv', h2),
                           named_struct('bi', 3, 'bv', h3))""")).as("b"))
      .select(col("doc_id"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = banded.select(col("doc_id").as("a_id"), col("h0").as("a0"),
      col("h1").as("a1"), col("h2").as("a2"), col("h3").as("a3"),
      col("bi"), col("bv"))
    val b = banded.select(col("doc_id").as("b_id"), col("h0").as("b0"),
      col("h1").as("b1"), col("h2").as("b2"), col("h3").as("b3"),
      col("bi").as("bi2"), col("bv").as("bv2"))
    a.join(b, col("bi") === col("bi2") && col("bv") === col("bv2") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("""bit_count(a0 ^ b0) + bit_count(a1 ^ b1) +
                bit_count(a2 ^ b2) + bit_count(a3 ^ b3)""")
          .cast("int").as("hd"))
      .distinct()
      .where(col("hd") <= 3)
      .transform(graft.queries.Det.emitWide(_, "a_id", "b_id"))
  }

  /** q97: the full pipeline as a query — binary wrap → batched decode
    * → scalar features. Oracle mirrors the stub arithmetic in SQL. */
  def q97(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.spread(s, graft.Tables.documents(s, d))
    decodeFeatures(toMediaDocs(docs)).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        round(element_at(col("feat"), 1).cast("double"), 4).as("f0"))
      .transform(graft.queries.Det.emitWide(_, "doc_id"))
  }

  /** q102: frame-sampling as a query — every 2nd 64-byte "frame" of
    * each payload, reporting the sampled-frame count and the first
    * frame's content hash. Distribution shape: a pure Dataset map
    * (per-row sampling needs no batch amortization); the oracle
    * mirrors the sampling arithmetic in SQL. */
  def q102(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    toMediaDocs(graft.Tables.spread(s, graft.Tables.documents(s, d)))
      .map { m =>
        val fs = frameSample(m.media, frameBytes = 64, everyN = 2)
        (m.doc_id, fs.length,
          fs.headOption.map(new String(_, "UTF-8")).getOrElse(""))
      }
      .toDF("doc_id", "n_frames", "first_frame")
      .select(col("doc_id"), col("n_frames"),
        md5(col("first_frame")).as("first_md5"))
      .transform(graft.queries.Det.emitWide(_, "doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q97_multimodal_features" -> q97, "q102_frame_sample" -> q102,
      "q151_dhash_bands" -> q151, "q203_media_neardup" -> q203)

  /** The q151 dHash oracle chain, shared with q203: `ph` holds the
    * per-doc band values from the SQL-replayed resize + compare. */
  private val DHASH_CTES =
    """d AS (SELECT doc_id, text, strlen(text) AS n,
                           32 + strlen(text) % 97 AS w,
                           greatest(1, (strlen(text) + 32 + strlen(text) % 97 - 1)
                                       // (32 + strlen(text) % 97)) AS h
                    FROM documents),
         b AS (SELECT doc_id, j // 16 AS band,
                      CASE WHEN pxa > pxb THEN (1 << (j % 16)) ELSE 0 END AS v
               FROM d, LATERAL (
                 SELECT j,
                   CASE WHEN ((j // 8) * h // 8) * w + ((j % 8) * w // 9) < n
                        THEN ascii(substr(text,
                               ((j // 8) * h // 8) * w + ((j % 8) * w // 9) + 1, 1))
                        ELSE 0 END AS pxa,
                   CASE WHEN ((j // 8) * h // 8) * w + (((j % 8) + 1) * w // 9) < n
                        THEN ascii(substr(text,
                               ((j // 8) * h // 8) * w + (((j % 8) + 1) * w // 9) + 1, 1))
                        ELSE 0 END AS pxb
                 FROM (SELECT unnest(generate_series(0, 63)) AS j)) u),
         ph AS (SELECT doc_id,
                CAST(sum(CASE WHEN band = 0 THEN v ELSE 0 END) AS INT) AS h0,
                CAST(sum(CASE WHEN band = 1 THEN v ELSE 0 END) AS INT) AS h1,
                CAST(sum(CASE WHEN band = 2 THEN v ELSE 0 END) AS INT) AS h2,
                CAST(sum(CASE WHEN band = 3 THEN v ELSE 0 END) AS INT) AS h3
         FROM b GROUP BY doc_id)"""

  val oracles: Map[String, String] = Map(
    "q97_multimodal_features" ->
      """SELECT doc_id,
                CAST(32 + strlen(text) % 97 AS INT) AS width,
                CAST(32 + (strlen(text) * 7) % 97 AS INT) AS height,
                round(CAST(ascii(substr(text, 1, 1)) AS DOUBLE) / 255.0, 4) AS f0
         FROM documents ORDER BY doc_id""",
    "q102_frame_sample" ->
      """SELECT doc_id,
                CAST(ceil(ceil(strlen(text) / 64.0) / 2.0) AS INT) AS n_frames,
                md5(substr(text, 1, 64)) AS first_md5
         FROM documents ORDER BY doc_id""",
    "q151_dhash_bands" ->
      s"""WITH $DHASH_CTES
         SELECT doc_id, h0, h1, h2, h3 FROM ph ORDER BY doc_id""",
    "q203_media_neardup" ->
      s"""WITH $DHASH_CTES
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) +
                     bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3))
                     AS INT) AS hd
         FROM ph a JOIN ph b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) +
               bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3
         ORDER BY a_id, b_id""")
}
