package org.apache.spark

/** Bounded drain of the async listener bus (`listenerBus` is
  * private[spark], hence this one-object bridge — the same pattern as
  * [[org.apache.spark.sql.classic.GraftColumnBridge]]).
  *
  * The bench snapshots per-run stage/shuffle totals from a
  * SparkListener to make "same plan, noisy box" a MECHANICAL check
  * (SURVEY §6's barrier-band adjudication): a snapshot taken right
  * after an action returns can miss completion events still queued on
  * the bus, which would smear one run's stages into the next. One
  * bounded wait after each timed run keeps the counters aligned.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => }
}
