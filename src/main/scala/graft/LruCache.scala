package graft

/** Tiny synchronized access-ordered LRU used by the prepared fast
  * paths' plan caches (point-read scans, DML discovery scans).
  *
  * `compute` runs OUTSIDE the lock on purpose: a racing duplicate build
  * is benign — both values are equivalent compiled plans over immutable
  * files — and far cheaper than holding a monitor across Spark physical
  * planning.
  */
private[graft] final class LruCache[K, V](max: Int) {
  private val m = new java.util.LinkedHashMap[K, V](max + 8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = size() > max
  }

  def getOrElseUpdate(key: K)(compute: => V): V =
    synchronized(Option(m.get(key))) match {
      case Some(v) => v
      case None =>
        val v = compute
        synchronized(m.put(key, v))
        v
    }

  /** Drop every entry whose key matches `p` — used when a prepared
    * statement closes to release its cached physical scans.
    */
  def removeIf(p: K => Boolean): Unit = synchronized {
    val it = m.keySet().iterator()
    while (it.hasNext) if (p(it.next())) it.remove()
  }
}
