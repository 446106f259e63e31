package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension set): images/audio/
  * video ride through the engine as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction runs batch-at-a-time per
  * partition so a real implementation can amortize native-library calls.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — replaced by a deterministic byte-arithmetic fake. Everything
  * around it (schema, encoders, partition-batched execution shape, frame
  * sampling, downstream aggregation) is real and tested.
  */
object Multimodal {

  /** Typed metadata carried alongside the payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)
  /** `byteSums(d)` = exact integer sum of payload bytes at positions
    * ≡ d (mod dim) — the oracle-checkable shadow of the float
    * `features`, computed in the same decode pass.
    */
  final case class MediaFeatures(
      doc_id: Long, checksum: Long, features: Array[Float], byteSums: Array[Long])

  /** Attach a synthetic media payload + metadata to each document.
    * Payload = UTF-8 bytes of the text (stands in for image bytes);
    * metadata fields are deterministic arithmetic on n_chars so the
    * DuckDB oracle can reproduce them.
    */
  def synthesize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("fakeimg").as("format"),
        (lit(16) + col("n_chars") % 64).cast("int").as("width"),
        (lit(16) + (col("n_chars") * 7) % 64).cast("int").as("height"),
        (lit(1) + col("n_chars") % 8).cast("int").as("nFrames")).as("meta"))

  /** STUB decoder: a real engine would hand each partition's batch of
    * payloads to a native codec (JNI / Arrow FFI) here. The fake derives
    * an 8-dim feature vector from byte sums — deterministic, so tests
    * can assert on it. The `mapPartitions` shape (iterator-in/
    * iterator-out per partition) is exactly what a batched native call
    * needs; no driver collection, scales with partitions.
    */
  def decodeFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open the codec once here
      rows.map { r =>
        val dim = 8
        val feats = new Array[Float](dim)
        val byteSums = new Array[Long](dim)
        var i = 0
        var checksum = 0L
        while (i < r.media.length) {
          val b = r.media(i) & 0xff
          feats(i % dim) += (b.toFloat / 255f)
          byteSums(i % dim) += b
          checksum = (checksum * 31 + b) % 1000000007L
          i += 1
        }
        MediaFeatures(r.doc_id, checksum, feats, byteSums)
      }
      // codec would close on iterator exhaustion
    }
  }

  /** Frame sampling: every k-th frame index from the metadata, payload
    * sliced per frame — a pure projection + generator, no shuffle.
    */
  def sampleFrames(withMedia: DataFrame, everyK: Int): DataFrame =
    withMedia
      .select(col("doc_id"), col("media"), col("meta"),
        explode(sequence(lit(0), col("meta.nFrames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("frame_idx"),
        expr("substring(media, cast(frame_idx * 16 + 1 AS INT), 16)").as("frame_bytes"))
}
