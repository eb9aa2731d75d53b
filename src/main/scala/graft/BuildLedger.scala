package graft

/** Process-wide ledger of ONE-TIME BUILD work (VERDICT r20 item 4 /
  * r21 item 2): persisted-index builds (IVF/PQ/gram/funnel/knn-graph),
  * sharedLeafFrame computes and other build-once-read-many steps
  * record their wall seconds here, keyed by what was built. Bench
  * drains the ledger into its detail artifact and stamps a separate
  * `{"metric":"build",...}` stdout line BEFORE the total line — so the
  * per-query steady-state numbers are verifiably READS: everything
  * one-time is accounted for on its own line instead of hiding in the
  * untimed settling sweep.
  *
  * Accounting only — never on a result path, never persisted.
  */
object BuildLedger {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `f`, charging its wall time to `key` (accumulating: a key
    * rebuilt twice records the sum — a rebuild is build work too).
    */
  private[graft] def timed[A](key: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      entries.merge(key, dt, (a, b) => a + b)
    }
  }

  def snapshot(): Seq[(String, Double)] = {
    import scala.jdk.CollectionConverters._
    entries.asScala.toSeq.map { case (k, v) => (k, v.doubleValue) }
      .sortBy(-_._2)
  }

  def reset(): Unit = entries.clear()
}
