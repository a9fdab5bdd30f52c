package graft

/** Registry + timing for the library's session-scoped memos (the
  * build-an-index-once intermediates: near-dup pair set, CC labels,
  * trained coarse centroids, PQ index, the two rollup checkpoints).
  *
  * Round-10 verdict finding: those memos are populated during the
  * bench's UNTIMED warmup run, so the full candidates→verify→CC /
  * quantizer-training cost appeared in NO recorded number — the
  * dedup-family totals were silently reuse-path measurements. The memos
  * themselves are the production-honest shape (Pipeline.scala shares
  * the same intermediates, and at 100 TB these artifacts are persisted
  * once and fanned out), so the fix is VISIBILITY, not removal: every
  * memo population routes through [[timed]], and [[graft.Bench]] emits
  * the per-memo cold-path seconds as a `memo_populate` map whose sum
  * counts toward the bench total.
  *
  * Timing is nesting-aware: populating the CC-label memo triggers the
  * pair-set memo first, and a naive wall-clock would bill those seconds
  * twice. A thread-local stack of child-time accumulators subtracts
  * each nested population from its parent, so the reported numbers are
  * exclusive and sum to true wall-clock. (Memo population is
  * single-threaded per key under ConcurrentHashMap's per-bin lock; the
  * thread-local is only defensive isolation across concurrent keys.) */
object Memos {
  private val times =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()
  private val registered =
    scala.collection.mutable.ArrayBuffer[java.util.Map[_, _]]()

  /** Track a memo map so [[clearAll]] can drop every session memo. */
  def register[K, V](m: java.util.concurrent.ConcurrentHashMap[K, V])
      : java.util.concurrent.ConcurrentHashMap[K, V] =
    synchronized { registered += m; m }

  private val childTime = new ThreadLocal[List[Double]] {
    override def initialValue(): List[Double] = Nil
  }

  /** Run `f` (a memo's cold-path population) and record its EXCLUSIVE
    * wall-clock seconds under `name`, subtracting nested [[timed]]
    * spans. Repeated populations of one name (different dirs, a cleared
    * memo) accumulate. */
  def timed[T](name: String)(f: => T): T = {
    childTime.set(0.0 :: childTime.get)
    val t0 = System.nanoTime()
    try f
    finally {
      val elapsed = (System.nanoTime() - t0) / 1e9
      val children = childTime.get.head
      childTime.set(childTime.get.tail)
      times.merge(name, elapsed - children, (a: Double, b: Double) => a + b)
      childTime.get match {
        case h :: t => childTime.set((h + elapsed) :: t)
        case Nil    => ()
      }
    }
  }

  /** Per-memo exclusive population seconds recorded so far. */
  def populateSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    times.asScala.toMap
  }

  /** Drop every registered memo AND the timing record — returns the
    * library to its cold state (used by specs and available to the
    * bench's cold-path mode). */
  def clearAll(): Unit = synchronized {
    registered.foreach(_.clear())
    times.clear()
  }
}
