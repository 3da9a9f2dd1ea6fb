package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads plus typed
  * metadata, processed by batched per-partition decode.
  *
  * The image/audio codecs themselves are not available in this environment,
  * so `decodeStub` derives deterministic fake features from the bytes — the
  * Spark-side contract (schema, encoders, partition batching, feature
  * shape) is real and oracle-tested; swapping the stub body for a JNI/codec
  * call changes nothing structurally.
  *
  * Scale design: payloads never shuffle — decode is a mapPartitions over
  * the scan, feature rows are small, and downstream joins carry only
  * (id, features). Batch the iterator (here 64 rows) so a real decoder can
  * amortize model/codec init per batch, exactly like Arrow-batched
  * `mapInPandas` on the Python side.
  */
object Multimodal {

  /** Decoded-media metadata row (the stub "image decode" output). */
  case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      content_md5: String,
      width: Long,
      height: Long)

  val DecodeBatchSize = 64

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Attach the opaque payload column (UTF-8 bytes of `text` stand in for
    * real media bytes in the test corpus). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched per-partition "decode": byte length, content digest, and fake
    * dimensions derived deterministically from the byte length. */
  def decodeStub(payloads: DataFrame): Dataset[MediaMeta] = {
    val ss = payloads.sparkSession
    import ss.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(DecodeBatchSize).flatMap { batch =>
          // real decoder: init codec once here, decode the batch
          batch.map { case (id, bytes) =>
            val n = bytes.length.toLong
            MediaMeta(id, n, md5Hex(bytes), n % 640 + 1, (n * 7) % 480 + 1)
          }
        }
      }
  }

  /** Feature extraction: 16-bin byte-value histogram per payload — the
    * shape of a real embedding/feature step (fixed-width vector per item,
    * computed scan-side, only (id, features) flows downstream). Output is
    * long-form `(doc_id, bucket, n)` so the oracle can verify exactly. */
  def byteHistogram(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .filter(col("ch") =!= "")
      .select(col("doc_id"), (ascii(col("ch")) / 16).cast("int").as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Resize stub: strided downsample (every `stride`-th char) standing in
    * for image resize — emits the resized length and content digest, the
    * metadata a real resize would attach. */
  def resizeStub(docs: DataFrame, stride: Int): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        array_join(
          transform(
            sequence(lit(1), length(col("text")), lit(stride)),
            i => col("text").substr(i, lit(1))),
          "").as("resized"))
      .select(col("doc_id"),
        length(col("resized")).cast("long").as("resized_len"),
        md5(col("resized")).as("resized_md5"))

  /** Frame sampling over a payload treated as fixed-size frames: keep every
    * `stride`-th frame of `frameLen` chars with its digest. Pure relational
    * (sequence + explode + substring) — the shape a video pipeline uses to
    * cut keyframes before heavy decode. */
  def sampleFrames(docs: DataFrame, frameLen: Int, stride: Int): DataFrame =
    docs.select(
        col("doc_id").cast("long").as("doc_id"),
        col("text"),
        explode(sequence(lit(0L),
          floor((length(col("text")) - 1) / frameLen).cast("long"))).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame", col("text")
        .substr((col("frame_idx") * frameLen + 1).cast("int"), lit(frameLen)))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
}
