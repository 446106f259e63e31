package graft.operators

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Queries exposing the multimodal plumbing (see
  * [[graft.functions.Multimodal]]): metadata projection is fully
  * oracle-checked; the stub-decode feature path gets the weaker
  * rows-only check (its checksum math is Scala-side mapPartitions).
  */
object MultimodalQueries {

  /** Binary payload + typed metadata: byte length and derived dims. */
  val extMultimodalMeta: Q = Q(
    "ext_multimodal_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS byte_len,
      |  CAST(16 + n_chars % 64 AS INT) AS width,
      |  CAST(16 + (n_chars * 7) % 64 AS INT) AS height,
      |  CAST(1 + n_chars % 8 AS INT) AS n_frames
      |FROM documents""".stripMargin) { (s, dir) =>
    Multimodal.synthesize(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        octet_length(col("media")).cast("long").as("byte_len"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.nFrames").as("n_frames"))
  }

  /** Frame sampling over the binary payload (every 2nd frame). */
  val extMultimodalFrames: Q = Q(
    "ext_multimodal_frames",
    """WITH m AS (
      |  SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |    CAST(1 + n_chars % 8 AS INT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, UNNEST(generate_series(0, n_frames - 1)) AS frame_idx, byte_len
      |  FROM m)
      |SELECT doc_id, frame_idx,
      |  GREATEST(0, LEAST(16, byte_len - frame_idx * 16)) AS frame_len
      |FROM f WHERE frame_idx % 2 = 0""".stripMargin) { (s, dir) =>
    Multimodal.sampleFrames(
        Multimodal.synthesize(Tables.load(s, dir, "documents")), everyK = 2)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame_bytes")).cast("long").as("frame_len"))
  }

  /** Stub decode → feature extraction via partition-batched mapPartitions.
    * No oracle (the decode is engine-side Scala); driver records a
    * rows-only check.
    */
  val extMultimodalFeatures: Q = Q.noOracle("ext_multimodal_features") { (s, dir) =>
    import s.implicits._
    implicit val spark = s
    val media = Multimodal.synthesize(Tables.load(s, dir, "documents"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeFeatures(media)
      .select(col("doc_id"), col("checksum"),
        floor(expr("aggregate(features, CAST(0 AS DOUBLE), (a, v) -> a + CAST(v AS DOUBLE))") * 1000d + 0.5d)
          .cast("long").as("feat_sum_mils"))
  }

  def all: Seq[Q] = Seq(extMultimodalMeta, extMultimodalFrames, extMultimodalFeatures)
}
