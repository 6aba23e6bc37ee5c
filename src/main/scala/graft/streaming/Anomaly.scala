package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming z-score anomaly detection — the streaming counterpart of the
  * batch `events_anomaly` query (SURVEY.md §2 B23). The batch form scores
  * each hour against the WHOLE series' moments; a stream cannot see the
  * future, so this twin scores each record against the moments of
  * everything seen BEFORE it (prefix statistics) — the standard online
  * monitor semantics. A record is flagged when at least `minPrior` records
  * preceded it on its key and |x − μ_prior| ≥ threshold · σ_prior; every
  * record then folds into the state whether or not it was flagged.
  *
  * State per key is three numbers (n, Σx, Σx²) — O(keys) like the other
  * stateful operators; `ttl` expires idle keys. Within a micro-batch,
  * records are processed in (ts, order) order, so emission is independent
  * of in-batch arrival order (the Debounce/StatefulDedup contract);
  * records arriving late ACROSS batches are scored against the state as
  * of arrival — an online monitor's unavoidable trade-off, documented
  * rather than hidden.
  */
object Anomaly {

  /** (n, Σx, Σx²) prefix state. */
  case class Moments(n: Long, s1: Double, s2: Double)

  private class ZScoreProcessor[K, V](
      ts: V => Long,
      order: V => Long,
      value: V => Double,
      threshold: Double,
      minPrior: Int,
      ttl: TTLConfig
  ) extends StatefulProcessor[K, V, (V, Double)] {
    @transient private var moments: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      moments = getHandle.getValueState[Moments]("moments", Encoders.product[Moments], ttl)

    override def handleInputRows(key: K, rows: Iterator[V], timerValues: TimerValues): Iterator[(V, Double)] = {
      var m       = if (moments.exists()) moments.get() else Moments(0L, 0.0, 0.0)
      val flagged = Vector.newBuilder[(V, Double)]
      // identical prefix-moments arithmetic + (ts, order) in-batch
      // determinism to the fMGWS form below
      rows.toVector.sortBy(r => (ts(r), order(r))).foreach { r =>
        val x = value(r)
        if (m.n >= minPrior) {
          val mean = m.s1 / m.n
          val varP = m.s2 / m.n - mean * mean
          if (varP > 0.0) {
            val z = (x - mean) / math.sqrt(varP)
            if (math.abs(z) >= threshold) flagged += ((r, z))
          }
        }
        m = Moments(m.n + 1, m.s1 + x, m.s2 + x * x)
      }
      moments.update(m)
      flagged.result().iterator
    }
  }

  /** `zScore` on Spark 4's `transformWithState` — same prefix-moments
    * online-monitor semantics as the fMGWS form below, with the (n, Σx,
    * Σx²) record in a typed `ValueState[Moments]` and store-enforced TTL.
    * fMGWS is the deprecated path in Spark 4; TwsMigrationSpec proves
    * output parity under RocksDB.
    */
  def zScoreTws[K, V](
      ds: Dataset[V],
      key: V => K,
      ts: V => Long,
      order: V => Long,
      value: V => Double,
      threshold: Double = 3.0,
      minPrior: Int = 5,
      ttl: TTLConfig = TTLConfig.NONE
  )(implicit ke: Encoder[K], ve: Encoder[V], outEnc: Encoder[(V, Double)]): Dataset[(V, Double)] =
    ds.groupByKey(key)
      .transformWithState(
        new ZScoreProcessor[K, V](ts, order, value, threshold, minPrior, ttl),
        TwsSupport.timeModeFor(ttl),
        OutputMode.Append())

  /** Returns flagged records with their z-score. */
  def zScore[K, V](
      ds: Dataset[V],
      key: V => K,
      ts: V => Long,
      order: V => Long,
      value: V => Double,
      threshold: Double = 3.0,
      minPrior: Int = 5,
      ttl: Option[java.time.Duration] = None
  )(implicit
      ke: Encoder[K],
      ve: Encoder[V],
      outEnc: Encoder[(V, Double)]
  ): Dataset[(V, Double)] = {
    implicit val stateEnc: Encoder[Moments] = Encoders.product[Moments]
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    ds.groupByKey(key)
      .flatMapGroupsWithState[Moments, (V, Double)](OutputMode.Append, timeout) {
        (_: K, records: Iterator[V], state: GroupState[Moments]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var m       = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
            val flagged = Vector.newBuilder[(V, Double)]
            records.toVector.sortBy(r => (ts(r), order(r))).foreach { r =>
              val x = value(r)
              if (m.n >= minPrior) {
                val mean = m.s1 / m.n
                val varP = m.s2 / m.n - mean * mean
                if (varP > 0.0) {
                  val z = (x - mean) / math.sqrt(varP)
                  if (math.abs(z) >= threshold) flagged += ((r, z))
                }
              }
              m = Moments(m.n + 1, m.s1 + x, m.s2 + x * x)
            }
            state.update(m)
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            flagged.result().iterator
          }
      }
  }
}
