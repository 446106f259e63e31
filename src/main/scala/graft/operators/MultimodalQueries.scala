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

  /** Stub decode → feature extraction via partition-batched
    * mapPartitions. The decode pass emits, alongside the float feature
    * vector, an integer shadow (per-dim byte sums + rolling checksum)
    * that the oracle recomputes from the UTF-8 text bytes — so the
    * Scala-side batch plumbing is hash-checked end to end, not just
    * row-counted. (The float vector itself stays engine-side: float32
    * accumulation order is not expressible exactly in portable SQL.)
    */
  val extMultimodalFeatures: Q = Q(
    "ext_multimodal_features", {
      val dims = (0 until 8).map(d =>
        s"CAST(COALESCE(SUM(CASE WHEN (i - 1) % 8 = $d THEN ascii(cs[i]) END), 0) AS BIGINT) AS sum_$d")
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, '') AS cs,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
         |      (a, b) -> (a * 31 + b) % 1000000007) AS checksum
         |  FROM documents),
         |e AS (
         |  SELECT doc_id, checksum, cs,
         |    UNNEST(generate_series(1, LEN(cs))) AS i
         |  FROM t)
         |SELECT doc_id, checksum,
         |  ${dims.mkString(",\n  ")}
         |FROM e GROUP BY doc_id, checksum""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    implicit val spark = s
    val media = Multimodal.synthesize(Tables.load(s, dir, "documents"))
      .as[Multimodal.MediaRow]
    val dims = (0 until 8).map(d => col("byteSums")(d).as(s"sum_$d"))
    Multimodal.decodeFeatures(media)
      .select(col("doc_id") +: col("checksum") +: dims: _*)
  }

  def all: Seq[Q] = Seq(extMultimodalMeta, extMultimodalFrames, extMultimodalFeatures)
}
