package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via `flatMapGroupsWithState` — the
  * escape hatch for semantics the built-in windowed aggregations can't
  * express. State is bounded: every key's state carries an event-time
  * timeout derived from the watermark, so a 100 TB/day stream holds state
  * only for the retention horizon, not forever.
  */
object StatefulOps {

  /** First-seen streaming dedup: emits the first occurrence of every key and
    * drops all later ones (within and across micro-batches) until the key's
    * state times out `retentionMs` past the key's LAST-SEEN event time. The
    * built-in `dropDuplicates` twin covers the common case; this form is the
    * template for richer dedup state (per-key counts, quotas, rolling
    * fingerprints) that the built-in cannot hold.
    *
    * The timeout is anchored to the key's own event time (state = max event
    * time seen, re-armed on every appearance) — anchoring to the CURRENT
    * watermark would stamp first-batch keys with the pre-data watermark
    * (epoch 0), so the first real watermark advance would expire them and
    * later duplicates would be re-emitted.
    *
    * Works in batch too (state starts empty per group ⇒ reduces to
    * first-per-key), which is what the spec uses as the semantic oracle.
    */
  def dedupeFirstSeen[K, T](
      events: Dataset[T],
      key: T => K,
      eventTimeMs: T => Long,
      retentionMs: Long)(implicit kEnc: Encoder[K], tEnc: Encoder[T]): Dataset[T] = {
    val streaming = events.isStreaming
    events.groupByKey(key)
      .flatMapGroupsWithState[Long, T](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // duplicates per key per batch are few — safe to materialize
            val buf = rows.toList
            // the EARLIEST occurrence by event time — the group iterator's
            // order is shuffle-arbitrary, so take(1) would emit a random
            // row (ties on event time pick arbitrarily among byte-equal
            // duplicates, the expected case)
            val out: Iterator[T] =
              if (state.exists || buf.isEmpty) Iterator.empty
              else Iterator.single(buf.minBy(eventTimeMs))
            val mark = math.max(
              state.getOption.getOrElse(Long.MinValue),
              if (buf.isEmpty) Long.MinValue else buf.map(eventTimeMs).max)
            state.update(mark)
            if (streaming) // Spark rejects timeouts at/below the watermark
              state.setTimeoutTimestamp(math.max(
                mark + retentionMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }(Encoders.scalaLong, tEnc)
  }
}
