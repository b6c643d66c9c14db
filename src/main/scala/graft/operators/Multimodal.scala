package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages as typed mapPartitions transforms.
  *
  * The actual codec is STUBBED (no image/audio libraries in this environment) by
  * `decodeStub` — a deterministic fake that derives dimensions from the payload
  * bytes — while everything Spark-side is real and tested: the binary column
  * schema, the batch-shaped partition iteration, the feature vector output shape,
  * and the partitioning behavior.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, frames: Int, bytes: Long)
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, width: Int, height: Int, frames: Int,
                              bytes: Long, features: Array[Float])

  /** STUB decoder — deterministic fake standing in for a real image/video decode
    * (??? in spirit): dimensions are pure functions of the byte length, so any
    * engine can oracle them; a real deployment swaps this for the codec call.
    */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(
      width = 1 + (n % 64),
      height = 1 + (n % 37),
      frames = 1 + n / 100,
      bytes = n.toLong)
  }

  /** STUB feature extraction with real output shape: 8 block-mean byte values
    * scaled to [0,1] — the plumbing a real embedding model would use.
    */
  def featuresStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    if (payload.isEmpty) return out
    val block = math.max(1, payload.length / dims)
    var d = 0
    while (d < dims) {
      var s = 0L
      var i = d * block
      val end = math.min(payload.length, (d + 1) * block)
      var cnt = 0
      while (i < end) { s += (payload(i) & 0xff); i += 1; cnt += 1 }
      out(d) = if (cnt == 0) 0f else (s.toFloat / cnt) / 255f
      d += 1
    }
    out
  }

  /** Frame sampling stub: every `stride`-th frame index of the fake container. */
  def sampleFrames(meta: MediaMeta, stride: Int): Array[Int] =
    (0 until meta.frames by stride).toArray

  /** The decode + featurize pipeline over a binary-payload table. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup point (a real decoder would init its codec here once)
      it.map { row =>
        val meta = decodeStub(row.payload)
        DecodedRow(row.doc_id, meta.width, meta.height, meta.frames, meta.bytes,
          featuresStub(row.payload))
      }
    }
  }

  /** Convenience: treat a string column as the binary payload (docs-as-media). */
  def fromTextTable(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload")).as[MediaRow]
  }
}
