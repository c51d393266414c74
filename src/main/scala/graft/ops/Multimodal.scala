package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; decode / feature-extraction runs as *batched* partition-local
  * functions over the binary payloads.
  *
  * The Spark-side plumbing — schema, binary columns, batched
  * `mapPartitions`, partition sizing — is real and tested. The actual
  * codec call is STUBBED (this environment has no image/audio libraries):
  * [[decodeStub]] derives deterministic pseudo-features from the bytes via
  * the portable hash, which keeps the whole path oracle-checkable. Swap
  * [[decodeStub]] for a real decoder (JNI/FFM to a codec lib) without
  * touching any plumbing.
  *
  * Scale notes: binary payloads dominate row size, so feature extraction
  * repartitions by id to spread decode work regardless of upstream file
  * layout, and processes fixed-size batches to bound peak memory per task
  * (the moral equivalent of `mapInPandas` batch semantics in PySpark).
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             sampleRate: Int, durationMs: Int)
  final case class MediaRecord(media_id: Long, kind: String,
                               bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 byte_len: Long, feature: Seq[Double])

  val FEATURE_DIM = 8

  /** Synthesize a media table from the documents fixture: text bytes stand
    * in for encoded media; metadata is derived deterministically. (In a real
    * pipeline this is `spark.read.format("binaryFile")` or similar.)
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 9) * 8).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sampleRate"),
        ((col("doc_id") % 30 + 1) * 1000).cast("int").as("durationMs")
      ).as("meta")
    )

  /** STUB decoder: where a real image/audio decode + model featurizer goes.
    * Deterministic pseudo-features from the payload hash — identical to the
    * SQL in [[sqlFeature]] so the plumbing is oracle-verified end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
    Array.tabulate(FEATURE_DIM) { i =>
      (h60jvm(s"$b64:$i") % 2000001L - 1000000L) / 1e6
    }
  }

  /** JVM twin of [[PortableHash.h60]] (first 15 md5 hex chars as int). */
  def h60jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  def sqlFeature(bytesExpr: String, iExpr: String): String =
    s"((${PortableHash.sqlH60(s"base64($bytesExpr) || ':' || CAST($iExpr AS VARCHAR)")} % 2000001 - 1000000) / 1000000.0)"

  /** Batched partition-local feature extraction. `batchSize` bounds how
    * many decoded payloads are in flight per task at once.
    */
  def extractFeatures(media: Dataset[MediaRecord],
                      batchSize: Int = 64,
                      parallelism: Option[Int] = None): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parts = parallelism.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    media
      .repartition(parts, col("media_id")) // spread decode work evenly
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.map { m =>
            MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
              decodeStub(m.bytes).toSeq)
          }
        }
      }
  }

  /** STUB resize: a real implementation decodes, resamples pixels and
    * re-encodes; the stub deterministically truncates/extends the payload
    * to the target byte budget (area-proportional), preserving metadata
    * arithmetic. Plumbing (schema/metadata update) is real.
    */
  def resizeStub(m: MediaRecord, w: Int, h: Int): MediaRecord = {
    val budget = math.max(1,
      (m.bytes.length.toDouble * (w.toLong * h) /
        math.max(1L, m.meta.width.toLong * m.meta.height)).toInt)
    val out =
      if (budget <= m.bytes.length) java.util.Arrays.copyOf(m.bytes, budget)
      else Array.tabulate(budget)(i => m.bytes(i % m.bytes.length))
    m.copy(bytes = out, meta = m.meta.copy(width = w, height = h))
  }

  /** STUB frame sampling for video/audio: yields `n` evenly-spaced
    * "frames" as byte slices with per-frame timestamps — the row-explosion
    * shape (one media row → n frame rows) a real decoder produces.
    */
  def sampleFramesStub(m: MediaRecord, n: Int): Seq[(Int, Long, Array[Byte])] = {
    val stepMs = math.max(1, m.meta.durationMs / math.max(1, n))
    (0 until n).map { i =>
      val offMs = i * stepMs
      val sliceLen = math.max(1, m.bytes.length / n)
      val start = math.min(i * sliceLen, math.max(0, m.bytes.length - 1))
      (i, offMs.toLong,
        java.util.Arrays.copyOfRange(m.bytes, start,
          math.min(start + sliceLen, m.bytes.length)))
    }
  }

  /** Distributed frame sampling: one media row explodes to n frame rows —
    * partition-local, no shuffle beyond the id spread.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      sampleFramesStub(m, n).map { case (i, offMs, bytes) =>
        (m.media_id, m.kind, i, offMs, bytes.length.toLong)
      }
    }.toDF("media_id", "kind", "frame", "offset_ms", "frame_bytes")
  }

  /** Full pipeline: documents → media table → features, exploded to one
    * row per (media_id, component) for stable comparison.
    */
  def featureQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(docs).as[MediaRecord]
    extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"), col("byte_len"),
        posexplode(col("feature")))
      .withColumnsRenamed(Map("pos" -> "i", "col" -> "f"))
      .select(col("media_id"), col("kind"), col("byte_len"),
        col("i").cast("long"), round(col("f"), 9).as("f"))
  }
}
