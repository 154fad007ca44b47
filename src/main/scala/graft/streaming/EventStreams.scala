package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session accumulator for [[EventStreams.sessionize]]; top-level so
  * the state encoder codegen resolves it cleanly. */
case class SessionState(startMs: Long, lastMs: Long, n: Long)

/** Per-bucket membership state for [[EventStreams.nearDupCandidates]]. */
case class BucketState(ids: Seq[Long], lastMs: Long)

/** A streaming near-dup candidate: `doc_id` collided with prior `peer_id`
  * in minhash band `band`. */
case class DupCandidate(doc_id: Long, peer_id: Long, band: Int)

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The reference has no streaming
  * surface (SURVEY.md §2.3); these are the engine's additions, and each
  * transform is usable identically in batch mode — the batch query
  * `q9_events_window` in SparkEntry is the oracle-checked twin of
  * [[windowedCounts]].
  */
object EventStreams {

  /** Tumbling-window aggregation with a watermark: the canonical streaming
    * rollup. Works on a `readStream` or batch DataFrame alike. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), min("value").as("min_v"), max("value").as("max_v"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("min_v"), col("max_v"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, events: Long)

  /** Gap-based sessionization via flatMapGroupsWithState with an event-time
    * timeout. Event-time (not processing-time) makes the operator
    * deterministic and replayable, and avoids the continuous empty
    * micro-batches a processing-time timeout schedules.
    *
    * Emits each session exactly once, WHEN IT CLOSES — either because a
    * later event in some batch crossed the idle gap, or because the
    * watermark passed last-event + gap (timeout). flatMap, not map: a single
    * micro-batch can span several session boundaries for one user (bursty
    * or historical replay input), and a one-row-per-group operator would
    * silently discard every session but the last. Append-mode output,
    * session-for-session identical to [[sessionizeBatch]] once the
    * watermark has passed (spec: full-fixture streaming replay equals the
    * batch twin). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, evts, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n))
          } else {
            val times = evts.map(_.ts.getTime).toSeq.sorted
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, t, s.n + 1))
                case Some(s) => // gap crossed inside the batch: close + restart
                  closed += Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None => cur = Some(SessionState(t, t, 1))
              }
            }
            val s = cur.get
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup on event ids: state is bounded by the watermark
    * (dropDuplicatesWithinWatermark), so long-running pipelines don't
    * accumulate unbounded id state; in batch mode it degrades to a plain
    * dropDuplicates. */
  def dedupEvents(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
                  watermark: String = "1 hour"): DataFrame = {
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)
  }

  /** Streaming exact content dedup: drops rows whose text (byte-exact, via
    * the codegen'd built-in xxhash64) was already seen within the watermark
    * horizon. The streaming twin of `Dedup.exact`: state is one 64-bit hash
    * per distinct document in the horizon, so memory is bounded by
    * distinct-docs-per-window, not corpus size. Requires a `ts` column on
    * streams. (For order-insensitive near-dup dropping, hash with
    * `graft.functions.simhash64` instead — token-vote hashing makes word
    * permutations collide by design.) */
  def dedupByContent(docs: DataFrame, textCol: String,
                     watermark: String = "1 hour"): DataFrame = {
    val hashed = docs.withColumn("__content_h", xxhash64(col(textCol)))
    val out =
      if (docs.isStreaming)
        hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("__content_h")
      else hashed.dropDuplicates("__content_h")
    out.drop("__content_h")
  }

  /** Streaming banded-MinHash near-dup candidate detection: each arriving
    * document's band hashes key into stateful buckets
    * (flatMapGroupsWithState); a document colliding with prior bucket
    * members emits one [[DupCandidate]] per prior member. Downstream
    * verifies candidates (exact jaccard) in batch — state holds only ids
    * (bounded per bucket by `maxBucket`, expired by event-time timeout after
    * `ttl`), never document payloads, so state size is
    * O(buckets × maxBucket × 8 B) regardless of corpus size.
    *
    * Expects columns (doc_id: long, ts: timestamp, text: string). */
  def nearDupCandidates(docs: DataFrame, ngramWidth: Int, bandCount: Int,
                        bandSize: Int, lshSeed: Long, watermarkDelay: String = "10 seconds",
                        ttlMs: Long = 60 * 60 * 1000L, maxBucket: Int = 64): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val w = ngramWidth
    val banded = docs.select(col("doc_id").cast("long"), col("ts"), col("text"))
      .as[(Long, Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        if (text == null) Iterator.empty
        else {
          val bytes = text.getBytes("UTF-8")
          val set = graft.core.Shingles.fromTextUtf8(bytes, 0, bytes.length, w)
          val hs = graft.core.MinHashFamily(bandCount, bandSize, lshSeed).hash(set)
          hs.iterator.zipWithIndex.map { case (h, band) => (band, h, id, ts) }
        }
      }.toDF("band", "h", "doc_id", "ts")
    val src = if (banded.isStreaming) banded.withWatermark("ts", watermarkDelay) else banded
    src.as[(Int, Long, Long, Timestamp)]
      .groupByKey { case (band, h, _, _) => (band, h) }
      .flatMapGroupsWithState[BucketState, DupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(BucketState(Seq.empty, 0L))
            val newRows = rows.toSeq.sortBy(r => (r._4.getTime, r._3))
            val out = scala.collection.mutable.ArrayBuffer[DupCandidate]()
            var members = prev.ids
            var lastMs = prev.lastMs
            newRows.foreach { case (_, _, id, ts) =>
              members.foreach(p => if (p != id) out += DupCandidate(id, p, band))
              members = (members :+ id).takeRight(maxBucket)
              lastMs = math.max(lastMs, ts.getTime)
            }
            state.update(BucketState(members, lastMs))
            state.setTimeoutTimestamp(lastMs + ttlMs)
            out.iterator
          }
      }
  }

  /** Batch-mode sessionization with identical gap semantics, built on window
    * functions — the oracle twin of [[sessionize]] and the scalable batch
    * formulation (two shuffles: by user, then by (user, session)). */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMs / 1000, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("start"), max("ts").as("end"), count(lit(1)).as("events"))
  }
}
