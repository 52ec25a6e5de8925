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
    * state times out `retentionMs` past the watermark. The built-in
    * `dropDuplicates` twin covers the common case; this form is the template
    * for richer dedup state (per-key counts, quotas, rolling fingerprints)
    * that the built-in cannot hold.
    *
    * Works in batch too (state starts empty per group ⇒ reduces to
    * first-per-key), which is what the spec uses as the semantic oracle.
    */
  def dedupeFirstSeen[K, T](
      events: Dataset[T],
      key: T => K,
      retentionMs: Long)(implicit kEnc: Encoder[K], tEnc: Encoder[T]): Dataset[T] = {
    val streaming = events.isStreaming
    events.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key already emitted in an earlier batch
          } else {
            state.update(true)
            if (streaming) // batch runs have no watermark to time out against
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + retentionMs)
            rows.take(1)
          }
      }(Encoders.scalaBoolean, tEnc)
  }
}
