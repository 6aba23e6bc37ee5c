package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Exponentially-decayed per-key activity score on `transformWithState`
  * (SURVEY.md §2 B183) — the streaming "what's trending now" primitive: a
  * topic's score decays continuously with a configurable half-life and
  * bumps by 1 per event, so a topic needs sustained recent volume, not
  * historical bulk, to rank. The decay is applied lazily at event time
  * (score · 2^(−Δt/halfLife) before each bump) — no timer wheel, no
  * periodic refresh job; a key with no events costs nothing until read.
  *
  * This complements the batch-side B56 (`events_decay_score`): same decay
  * math, but here the state is the running score itself, carried across
  * micro-batches by the store and expired by TTL when a topic goes cold —
  * the O(live topics) state budget a 100 TB event stream needs (dead
  * topics are evicted by the store, not tracked forever).
  *
  * Emission is Update-mode: one refreshed (topic, score, lastMs) row per
  * touched key per micro-batch. Downstream a bounded `TopKBy` over the
  * emitted table gives the dashboard's top-N without a global sort.
  *
  * Determinism: within a batch, rows for one key are SORTED by event
  * time before folding — iterator order after groupByKey's shuffle is
  * not stable, and with the max(0, Δt) late-row clamp an out-of-order
  * pair inside one batch would otherwise fold to a different score than
  * the sorted order (the later event would never be decayed). Sorting
  * makes the score a pure function of the timestamp multiset, so any
  * replay from a checkpoint recomputes identical scores — the property
  * the spec pins against the closed form. Same in-batch-sort discipline
  * as Anomaly and Debounce.
  */
object Trending {

  /** Emitted after every batch that touches the key. */
  case class TopicScore(topic: String, score: Double, lastMs: Long, nEvents: Long)

  private class Processor(halfLifeMs: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, (String, Long), TopicScore] {
    @transient private var state: ValueState[(Double, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Double, Long, Long)](
        "decayed",
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong),
        ttl
      )

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues
    ): Iterator[TopicScore] = {
      var (score, lastMs, n) = Option(state.get()).getOrElse((0.0, Long.MinValue, 0L))
      // sort the batch slice by event time: fold order must not depend on
      // shuffle iterator order (see determinism note above). The slice is
      // one key's rows in one micro-batch — bounded, safe to materialize.
      rows.toSeq.sortBy(_._2).foreach { case (_, ms) =>
        // lazy decay: bring the score forward to this event's time, then
        // bump. A backwards timestamp (replayed/late row) decays by 0 —
        // max(0, Δt) — instead of inflating the score exponentially.
        if (lastMs != Long.MinValue) {
          val dt = math.max(0L, ms - lastMs)
          score *= math.pow(2.0, -dt.toDouble / halfLifeMs.toDouble)
        }
        score += 1.0
        lastMs = math.max(lastMs, ms)
        n += 1
      }
      state.update((score, lastMs, n))
      Iterator.single(TopicScore(key, score, lastMs, n))
    }
  }

  /** @param ds (topic, eventTimeMs) rows
    * @param halfLifeMs score halves after this much event-time inactivity
    */
  def perTopic(
      ds: Dataset[(String, Long)],
      halfLifeMs: Long,
      ttl: TTLConfig = TTLConfig.NONE
  ): Dataset[TopicScore] = {
    require(halfLifeMs > 0, s"halfLifeMs must be positive, got $halfLifeMs")
    implicit val outEnc: Encoder[TopicScore] = Encoders.product[TopicScore]
    implicit val keyEnc: Encoder[String]     = Encoders.STRING
    ds.groupByKey(_._1)
      .transformWithState(new Processor(halfLifeMs, ttl), TwsSupport.timeModeFor(ttl), OutputMode.Update())
  }
}
