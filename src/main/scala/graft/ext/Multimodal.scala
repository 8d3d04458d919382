package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media (image/audio/video) travels as an opaque `binary`
 * payload column plus typed metadata, exactly how a 100 TB training-data lake stores it.
 *
 * The container has no image/audio codecs, so the decode step is a clearly-marked
 * deterministic STUB ([[fakeDecode]]); the Spark-side plumbing — binary columns, typed
 * metadata schema, partition-parallel `mapPartitions` batch iteration (the Scala analogue of
 * `mapInPandas`: one iterator per partition, record-batch shaped) — is real and tested.
 *
 * Payloads here are synthesized from `documents.text` bytes so every stage is reproducible
 * and the metadata query is DuckDB-oracle-checkable.
 */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, byte_len: Int, features: Array[Float])

  /**
   * STUB decoder (no codecs in this container): derives a fixed-width feature vector from
   * raw bytes — lane j accumulates the raw values of bytes at positions ≡ j (mod dims).
   * Raw integer accumulation (not normalized) is deliberate: the sums stay exactly
   * representable in Float32 (< 2^24 for any realistic payload), so the decode stage is
   * bit-checkable against a SQL oracle computing the same byte sums. A real deployment
   * swaps this body for an image/audio decode (which would normalize); the signature,
   * schema and batching are what production code would keep.
   */
  def fakeDecode(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff).toFloat
      i += 1
    }
    out
  }

  /** Partition-parallel decode: the mapInPandas-shaped batch UDF surface. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { batch =>
      batch.map(m => MediaFeatures(m.doc_id, m.payload.length, fakeDecode(m.payload)))
    }
  }

  final case class ResizedRow(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /**
   * STUB resize (no image codec in this container): deterministic downsample of the raw
   * byte stream to width*height bytes by strided selection. Real deployments decode,
   * resample, and re-encode here; the schema, batching, and partition-parallelism are
   * the production shape.
   */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[ResizedRow] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val n = width * height
        val out = new Array[Byte](n)
        if (m.payload.nonEmpty) {
          var i = 0
          while (i < n) { out(i) = m.payload((i.toLong * m.payload.length / n).toInt); i += 1 }
        }
        ResizedRow(m.doc_id, width, height, out)
      }
    }
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /**
   * STUB frame sampling (video analogue): treat the payload as `nFrames` equal chunks and
   * emit every `stride`-th chunk as a frame row — the 1:N explode shape of real frame
   * extraction, with deterministic fake frame content.
   */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int, stride: Int): Dataset[FrameRow] = {
    val s = media.sparkSession
    import s.implicits._
    media.flatMap { m =>
      val chunk = math.max(1, m.payload.length / math.max(1, nFrames))
      (0 until nFrames by stride).iterator.map { f =>
        val from = math.min(f * chunk, m.payload.length)
        val to = math.min(from + chunk, m.payload.length)
        FrameRow(m.doc_id, f, java.util.Arrays.copyOfRange(m.payload, from, to))
      }
    }
  }

  /** documents.text rendered as a binary media payload column. */
  def mediaFrame(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.engine.Tables(s, dir, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // typed metadata extraction over the binary payload (oracle-checked)
    "multimodal_meta" -> { (s, dir) =>
      import s.implicits._
      graft.engine.Tables(s, dir, "documents")
        .select($"doc_id", encode($"text", "UTF-8").as("payload"), md5($"text").as("fp"),
          TextOps.hash32($"text").as("fp32"))
        .select($"doc_id", length($"payload").cast("long").as("byte_len"), $"fp",
          (lit(64L) + $"fp32" % 512).as("width"),
          (lit(64L) + ($"fp32" / 512).cast("long") % 512).as("height"),
          (lit(1L) + $"fp32" % 16).as("n_frames"))
        .orderBy($"doc_id")
    },
    // frame-sampling stage (the 1:N video explode), oracle-gated — every emitted frame's
    // position, length and byte-sum recomputed by DuckDB from the payload hex dump
    "multimodal_frames" -> { (s, dir) =>
      import s.implicits._
      sampleFrames(mediaFrame(s, dir), nFrames = 10, stride = 3)
        .map(f => (f.doc_id, f.frame_idx, f.payload.length,
          f.payload.foldLeft(0L)((a, b) => a + (b & 0xff))))
        .toDF("doc_id", "frame_idx", "frame_len", "byte_sum")
        .orderBy($"doc_id", $"frame_idx")
    },
    // resize stage (strided selection), oracle-gated the same way
    "multimodal_resize" -> { (s, dir) =>
      import s.implicits._
      resize(mediaFrame(s, dir), width = 4, height = 3)
        .map(r => (r.doc_id, r.width, r.height,
          r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))))
        .toDF("doc_id", "width", "height", "byte_sum")
        .orderBy($"doc_id")
    },
    // decode stage: stub decode through the real mapPartitions plumbing, now oracle-gated —
    // f0 is lane 0 of the decode (sum of bytes at positions ≡ 0 mod 8), which DuckDB
    // recomputes from the hex dump of the same payload
    "multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      decodeFeatures(mediaFrame(s, dir))
        .select($"doc_id", $"byte_len".cast("long").as("byte_len"),
          element_at($"features", 1).cast("double").as("f0"))
        .orderBy($"doc_id")
    },
  )

  val oracle: Map[String, String] = Map(
    "multimodal_frames" ->
      """WITH b AS (SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS len FROM documents),
        |c AS (SELECT doc_id, p, len, greatest(len // 10, 1) AS chunk FROM b),
        |f AS (SELECT doc_id, p, len, chunk, unnest([0, 3, 6, 9]) AS frame_idx FROM c),
        |g AS (SELECT doc_id, frame_idx, p,
        |        least(frame_idx * chunk, len) AS f_from,
        |        least(least(frame_idx * chunk, len) + chunk, len) AS f_to FROM f)
        |SELECT doc_id, frame_idx, cast(f_to - f_from AS INTEGER) AS frame_len,
        |  cast(coalesce(list_sum([('0x' || substr(hex(p), 2*i + 1, 2))::BIGINT
        |    for i in range(f_from, f_to)]), 0) AS BIGINT) AS byte_sum
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_resize" ->
      """WITH b AS (SELECT doc_id, encode(text) AS p, octet_length(encode(text)) AS len FROM documents)
        |SELECT doc_id, 4 AS width, 3 AS height,
        |  CASE WHEN len = 0 THEN 0
        |    ELSE cast(coalesce(list_sum([('0x' || substr(hex(p), 2*((i*len)//12) + 1, 2))::BIGINT
        |      for i in range(0, 12)]), 0) AS BIGINT) END AS byte_sum
        |FROM b ORDER BY doc_id""".stripMargin,
    // the decode oracle re-derives lane 0 byte-by-byte from the payload's hex dump:
    // byte i (0-indexed) of a blob is substr(hex(blob), 2i+1, 2) parsed base-16
    "multimodal_decode" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        | cast(coalesce(list_sum(
        |   [('0x' || substr(hex(encode(text)), 2*i + 1, 2))::BIGINT
        |    for i in range(0, octet_length(encode(text)), 8)]), 0) AS DOUBLE) AS f0
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS fp,
        | 64 + ('0x' || substr(md5(text), 1, 8))::BIGINT % 512 AS width,
        | 64 + (('0x' || substr(md5(text), 1, 8))::BIGINT // 512) % 512 AS height,
        | 1 + ('0x' || substr(md5(text), 1, 8))::BIGINT % 16 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
