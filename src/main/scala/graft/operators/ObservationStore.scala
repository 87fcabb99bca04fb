package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped latest-observation store — the shared retention
  * backing for `Dataset.observe` metrics harvested by a
  * QueryExecutionListener ([[HotBuckets]]' guard metrics,
  * [[graft.TrainingPipeline]]'s stage counts).
  *
  * Semantics: per session (weak keys — the store must not pin a
  * stopped session in a long-lived JVM), the LATEST value per key;
  * only a same-key record supersedes an entry, so `latest` returning
  * `None` genuinely means "no such observation completed in this
  * session" rather than "evicted by unrelated traffic". `maxKeys`
  * bounds DISTINCT keys per session (a safety net for dynamically
  * generated keys — call-site string literals never reach it); past
  * the bound the least-recently-recorded key is evicted.
  */
private[graft] final class ObservationStore[V](maxKeys: Int = 512) {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.LinkedHashMap[String, V]]()

  def record(spark: SparkSession, key: String, v: V): Unit = synchronized {
    val m = bySession.computeIfAbsent(spark,
      _ => new java.util.LinkedHashMap[String, V](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, V]): Boolean = size() > maxKeys
      })
    // remove-then-put: LinkedHashMap(accessOrder = false) keeps a
    // re-put key in its old slot, so without the remove a hot key
    // would age toward eviction while colder keys survived
    m.remove(key)
    m.put(key, v)
    ()
  }

  def latest(spark: SparkSession, key: String): Option[V] = synchronized {
    // containsKey, not get-and-null-check: V may be a primitive whose
    // boxed null would unbox to a zero value silently
    Option(bySession.get(spark)).filter(_.containsKey(key)).map(_.get(key))
  }
}

/** One-registration-per-session helper for QueryExecutionListeners
  * (weak-keyed, like the store: registration must not pin sessions). */
private[graft] final class ListenerOnce {
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def ensure(spark: SparkSession)(
      mk: => org.apache.spark.sql.util.QueryExecutionListener): Unit =
    if (registered.add(spark)) spark.listenerManager.register(mk)
}
