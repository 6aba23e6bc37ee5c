package graft.streaming

import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}

/** Shared plumbing for the transformWithState operators. */
private[streaming] object TwsSupport {

  /** TTL state requires the processing-time mode — `TimeMode.None` with
    * a TTL throws at state registration. Every operator that exposes a
    * `ttl` parameter derives its mode here so "TTL-expirable" is true by
    * construction, not just by docstring.
    */
  def timeModeFor(ttl: TTLConfig): TimeMode =
    if (ttl == null || ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
}
