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

  /** Streaming strict-order funnel detection (CEP-lite): per key, match
    * stage0 → stage1 → stage2 with strictly increasing event time and emit
    * ONE completion record carrying the three matched timestamps — the
    * incremental form of the events_funnel_steps chain (t1 = first stage0,
    * t2 = first stage1 after t1, t3 = first stage2 after t2). State is one
    * tiny (t1, t2, done) record per key, expired `retentionMs` past the
    * key's last activity.
    *
    * Ordering contract: events are folded in event-time order WITHIN each
    * micro-batch (the group iterator's shuffle order is sorted first);
    * across batches the strict ts > state guards mean a late-arriving
    * earlier-stage event can only MISS a match, never fabricate an
    * out-of-order one. In batch mode the whole group is one sorted fold —
    * exactly the conditional-min chain, which is what the spec pins.
    */
  def funnelDetect[K, T](
      events: Dataset[T],
      key: T => K,
      eventTimeMs: T => Long,
      stageOf: T => Int,
      retentionMs: Long)(implicit
      kEnc: Encoder[K],
      tEnc: Encoder[T]): Dataset[(K, Long, Long, Long)] = {
    val streaming = events.isStreaming
    // tuple encoders, not a nested case class: janino's codegen for a
    // statefully-referenced inner case class fails to find its constructor
    val stateEnc: Encoder[(Long, Long, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean)
    val outEnc: Encoder[(K, Long, Long, Long)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    events.groupByKey(key)
      .flatMapGroupsWithState[(Long, Long, Boolean), (K, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: K, rows: Iterator[T], state: GroupState[(Long, Long, Boolean)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = rows.toList.sortBy(eventTimeMs)
            var (t1, t2, done) = state.getOption.getOrElse((0L, 0L, false))
            var hit: Option[(K, Long, Long, Long)] = None
            buf.foreach { ev =>
              val t = eventTimeMs(ev)
              stageOf(ev) match {
                case 0 if t1 == 0L => t1 = t
                case 1 if t1 != 0L && t2 == 0L && t > t1 => t2 = t
                case 2 if t2 != 0L && !done && t > t2 =>
                  done = true
                  hit = Some((k, t1, t2, t))
                case _ => ()
              }
            }
            state.update((t1, t2, done))
            if (streaming) { // Spark rejects timeouts at/below the watermark
              val last = if (buf.isEmpty) 0L else buf.map(eventTimeMs).max
              state.setTimeoutTimestamp(math.max(
                last + retentionMs, state.getCurrentWatermarkMs() + 1))
            }
            hit.iterator
          }
      }(stateEnc, outEnc)
  }

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
      retentionMs: Long,
      tieBreak: T => Long = (_: T) => 0L)(implicit
      kEnc: Encoder[K], tEnc: Encoder[T]): Dataset[T] = {
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
            // the EARLIEST occurrence by (event time, tieBreak) — the group
            // iterator's order is shuffle-arbitrary, so take(1) would emit
            // a random row; a unique tieBreak (e.g. an event id) makes the
            // pick total-ordered even when distinct rows share a timestamp
            val out: Iterator[T] =
              if (state.exists || buf.isEmpty) Iterator.empty
              else Iterator.single(buf.minBy(t => (eventTimeMs(t), tieBreak(t))))
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
