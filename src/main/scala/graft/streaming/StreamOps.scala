package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming operator library: the streaming surface the
  * reference harness admits (SURVEY.md §2.C "Streaming semantics"),
  * re-expressed on Spark's incremental execution model.
  *
  * Reference semantics pinned by the fixture:
  *  - event-time watermark with 5s delay (test.sql:19) → `withWatermark`;
  *  - unbounded multi-aggregate GROUP BY with incremental updates
  *    (test.sql:47-60) → update-mode streaming aggregation;
  *  - mini-batch latency (test.sql:4-6) → micro-batch trigger interval;
  *  - `COUNT(DISTINCT)` in a streaming group-by (test.sql:51), which
  *    Spark's streaming aggregation rejects → exact two-stage form:
  *    watermarked `dropDuplicates` on (group keys ++ distinct col), then
  *    a count per group (SURVEY §7 hard part 1, option (a)).
  */
object StreamOps {

  /** Watermarked tumbling-window aggregate. Late rows beyond `delay` are
    * dropped by the watermark, matching Flink's late-row semantics.
    */
  def windowedAgg(
      df: DataFrame,
      eventTime: String,
      delay: String,
      windowDuration: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(eventTime, delay)
      .groupBy(keys :+ window(col(eventTime), windowDuration): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Exact streaming COUNT(DISTINCT distinctCol) GROUP BY keys.
    *
    * Spark's streaming agg rejects distinct aggregates; the exact,
    * scale-correct form is dedup-then-count: `dropDuplicates` keyed by
    * (keys ++ distinctCol) holds one state row per distinct combination
    * (bounded by the watermark), and the downstream count is an ordinary
    * incremental aggregation. Two shuffles on the same keys; state is
    * O(distinct), the minimum any exact implementation needs.
    */
  def streamingCountDistinct(
      df: DataFrame,
      eventTime: String,
      delay: String,
      keys: Seq[String],
      distinctCol: String,
      windowDuration: String = "1 minute"): DataFrame =
    df.withWatermark(eventTime, delay)
      // one state row per (keys, window, distinct value); the window
      // column carries event time, so state expires with the watermark
      .withColumn("window", window(col(eventTime), windowDuration))
      .dropDuplicates((keys :+ distinctCol) :+ "window")
      .groupBy(keys.map(col) :+ col("window"): _*)
      .agg(count(lit(1)).as("distinct_count"))

  /** Approximate variant: HLL-sketch count-distinct works directly in a
    * streaming agg (mergeable state, no dedup stage) — the cheap path at
    * scale when exactness is negotiable (SURVEY §7 hard part 1, (b)).
    */
  def approxCountDistinct(
      df: DataFrame,
      eventTime: String,
      delay: String,
      keys: Seq[Column],
      distinctCol: String,
      rsd: Double = 0.05,
      windowDuration: String = "1 minute"): DataFrame =
    df.withWatermark(eventTime, delay)
      .groupBy(keys :+ window(col(eventTime), windowDuration): _*)
      .agg(approx_count_distinct(distinctCol, rsd).as("approx_distinct_count"))

  /** Streaming exact dedup within the watermark horizon — state expires
    * once the watermark passes, so memory is bounded.
    */
  def dedupWithinWatermark(
      df: DataFrame,
      eventTime: String,
      delay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming incremental dedup: drop incoming docs whose fingerprint
    * already exists in the (static) corpus — the continuous-ingestion
    * face of [[graft.operators.Curation.extIncrementalDedup]]. A
    * stream-static left-anti join needs no state store at all: the
    * static side is broadcast or re-read per micro-batch, and the
    * stream never shuffles into state.
    */
  def incrementalDedup(
      incoming: DataFrame,
      corpusFingerprints: DataFrame,
      fpCol: String): DataFrame =
    incoming.join(
      corpusFingerprints.select(col(fpCol).as("__corpus_fp")),
      col(fpCol) === col("__corpus_fp"), "left_anti")

  /** LSH band keys over a MinHash signature array: one 32-bit key per
    * band, hashing the band's signature slice together with the band
    * index (so equal slices in different bands never collide). Shared by
    * the static index builder and the streaming probe side — both MUST
    * use the identical arithmetic.
    */
  private def bandKeysExpr(sigCol: String, bands: Int, rowsPerBand: Int): String =
    s"transform(sequence(0, ${bands - 1}), " +
      s"b -> hash(slice($sigCol, b * $rowsPerBand + 1, $rowsPerBand), b))"

  /** Static-side MinHash LSH index: one (band_key, corpus_id,
    * corpus_sig) row per band per corpus doc. Built once in batch and
    * joined by every micro-batch — at corpus scale this is the
    * parquet-backed index table a deployment maintains incrementally.
    */
  def minhashBandIndex(
      corpus: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    corpus.select(col(idCol).as("corpus_id"), col(sigCol).as("corpus_sig"))
      .select(col("corpus_id"), col("corpus_sig"),
        explode(expr(bandKeysExpr("corpus_sig", bands, rowsPerBand)))
          .as("band_key"))

  /** Streaming near-dup detection against a static corpus MinHash
    * index — the sketch-level face of [[incrementalDedup]]: incoming
    * docs explode to their LSH band keys and stream-static inner-join
    * the index (STATELESS — band collisions need no stream state);
    * signature agreement is confirmed natively on the joined row, and
    * multi-band duplicate hits collapse with
    * `dropDuplicatesWithinWatermark`, the only stateful step, bounded
    * by the watermark.
    *
    * Emits (doc, corpus doc, n_agree) candidate pairs with
    * `n_agree >= minAgree` of the signature's K minima agreeing.
    */
  def nearDupCandidates(
      incoming: DataFrame, idCol: String, sigCol: String,
      eventTime: String, delay: String,
      bandIndex: DataFrame,
      bands: Int, rowsPerBand: Int, minAgree: Int): DataFrame = {
    val agree = s"aggregate(zip_with($sigCol, corpus_sig, " +
      "(x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v)"
    incoming.withWatermark(eventTime, delay)
      .select(col(idCol), col(sigCol), col(eventTime),
        explode(expr(bandKeysExpr(sigCol, bands, rowsPerBand))).as("band_key"))
      .join(bandIndex, "band_key")
      .filter(col(idCol) =!= col("corpus_id"))
      .select(col(idCol), col("corpus_id"), col(eventTime),
        expr(agree).as("n_agree"))
      .filter(col("n_agree") >= minAgree)
      .dropDuplicatesWithinWatermark(idCol, "corpus_id")
  }

  /** Stream-stream interval join: right-side events within
    * `windowBeforeSec` seconds before each left event, on an equi key.
    * Both sides carry watermarks and the time-range condition bounds
    * exactly how long each side's state must be retained — the
    * Structured Streaming form of the reference's time-bounded join
    * surface (SURVEY §2.C joins). Column names must be disjoint across
    * sides (rename before calling), as in any stream-stream join.
    */
  def intervalJoin(
      left: DataFrame,
      leftTime: String,
      leftDelay: String,
      right: DataFrame,
      rightTime: String,
      rightDelay: String,
      leftKey: String,
      rightKey: String,
      windowBeforeSec: Long): DataFrame =
    left.withWatermark(leftTime, leftDelay)
      .join(
        right.withWatermark(rightTime, rightDelay),
        col(leftKey) === col(rightKey) &&
          col(rightTime) >= col(leftTime) -
            expr(s"INTERVAL $windowBeforeSec SECONDS") &&
          col(rightTime) < col(leftTime))

  /** Stream-stream window join (Flink 1.14+ window TVF join, streaming
    * analog of the batch q92 operator): rows of both streams that fall
    * in the SAME tumbling window and share an equi key pair up. The
    * window struct is part of the equi-join key, so Spark derives the
    * state bound from the watermark + window equality — each side
    * retains one window past the watermark, the same retention Flink's
    * window join maintains. Column names must be disjoint across sides
    * (rename before calling); the left window survives as `window`.
    * The raw time columns are consumed by the window (Spark allows at
    * most ONE event-time column per stream, and the window struct
    * inherits the watermark) — rows keep their window, not their
    * per-row timestamp.
    */
  def windowJoin(
      left: DataFrame,
      leftTime: String,
      leftDelay: String,
      right: DataFrame,
      rightTime: String,
      rightDelay: String,
      leftKey: String,
      rightKey: String,
      windowDuration: String): DataFrame = {
    val l = left.withWatermark(leftTime, leftDelay)
      .withColumn("window", window(col(leftTime), windowDuration))
      .drop(leftTime)
    val r = right.withWatermark(rightTime, rightDelay)
      .withColumn("r_window", window(col(rightTime), windowDuration))
      .drop(rightTime)
    l.join(r, col(leftKey) === col(rightKey) && col("window") === col("r_window"))
      .drop("r_window")
  }

  /** Session windows with an inactivity gap (streaming analog of the
    * batch gaps-and-islands operator in graft.operators.Events).
    */
  def sessionAgg(
      df: DataFrame,
      eventTime: String,
      delay: String,
      gap: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(eventTime, delay)
      .groupBy(keys :+ session_window(col(eventTime), gap): _*)
      .agg(aggs.head, aggs.tail: _*)
}
