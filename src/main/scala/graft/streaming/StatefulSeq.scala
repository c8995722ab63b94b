package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One keyed input row for [[SeqProcessor]]. */
final case class SeqIn(user_id: Long, event_id: Long, event_type: String, us: Long)

/** A sequence-numbered event: `seq` is the event's ordinal within its
  * user's event-time-ordered stream, `type_seq` the ordinal within the
  * (user, event_type) sub-stream. */
final case class SeqOut(user_id: Long, event_id: Long, seq: Long, type_seq: Long)

/** Streaming stable sequence numbering on the `transformWithState`
  * API (Spark 4's arbitrary-state processor; ABSENT in the reference,
  * SURVEY §2.10 — streaming is an engine extension; reference state
  * ceiling is the UI progress struct, main.rs:57-67).
  *
  * Assigns each event a dense ordinal per user (`seq`) and per
  * (user, event_type) (`type_seq`), continuing across micro-batches —
  * the streaming equivalent of `row_number()` over an unbounded
  * stream, which a training pipeline uses for stable example ids and
  * shard assignment as data keeps arriving.
  *
  * Why transformWithState rather than flatMapGroupsWithState (the API
  * [[EventStream.sessionize]] uses): typed per-key state SCHEMAS —
  * a ValueState for the user's running total plus a MapState keyed by
  * event_type — instead of one opaque state blob. The MapState matters
  * at scale: updating one type's counter writes one RocksDB key, not a
  * serialize-the-whole-map round trip, so per-key state can grow wide
  * (many event types) without making every update O(width).
  *
  * Ordering contract: within one micro-batch a key's rows are sorted
  * here by (us, event_id); across batches the file source delivers
  * files in order, so ordinals never regress. Requires the RocksDB
  * state store provider (the only provider implementing the
  * transformWithState state schema; [[StreamQueries]] sets it for the
  * duration of the run).
  */
class SeqProcessor extends StatefulProcessor[Long, SeqIn, SeqOut] {

  @transient private var total: ValueState[Long] = _
  @transient private var perType: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
    perType = getHandle.getMapState[String, Long](
      "perType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[SeqIn], timerValues: TimerValues): Iterator[SeqOut] = {
    // one user's batch slice fits comfortably in memory; sort restores
    // event-time order within the micro-batch
    val sorted = rows.toArray.sortBy(r => (r.us, r.event_id))
    var t = if (total.exists()) total.get() else 0L
    val out = sorted.map { r =>
      t += 1
      val ts = (if (perType.containsKey(r.event_type)) perType.getValue(r.event_type)
                else 0L) + 1
      perType.updateValue(r.event_type, ts)
      SeqOut(r.user_id, r.event_id, t, ts)
    }
    total.update(t)
    out.iterator
  }
}

object StatefulSeq {

  /** Sequence-number `events` (needs user_id, event_id, event_type and
    * a timestamp `ts`) per user via [[SeqProcessor]]. */
  def sequenceNumbers(events: DataFrame): Dataset[SeqOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[SeqIn]
      .groupByKey(_.user_id)
      .transformWithState(new SeqProcessor, TimeMode.None(), OutputMode.Append())
  }
}
