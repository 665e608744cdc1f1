package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of frames persisted INTERNALLY by graft operators
  * (Dedup.nearDupPairs' canonical groups, Scale.globalRowNumber's sorted
  * frame). Spark's CacheManager pins persisted frames for the session
  * lifetime, so long-running processes (ConfigConsumer, query loops) call
  * [[release]] between units of work. Releasing is always safe — an
  * unpersisted frame recomputes, results never change.
  */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def register(df: DataFrame): Unit = live.add(df)

  def release(): Unit = {
    var df = live.poll()
    while (df != null) { df.unpersist(false); df = live.poll() }
  }
}
