package graft

/** Driver-side helper for overlapping INDEPENDENT Spark jobs (guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside
  * one application — actions are only sequential because driver code
  * calls them sequentially. Submitting independent actions from a small
  * thread pool lets the next job's tasks back-fill executor cores freed
  * by the current job's straggler tail, which on a 32-core local master
  * is the difference between paying k× the per-job latency and ~1×.
  *
  * Used where a query path runs a FIXED, SMALL set of independent
  * actions (per-column sort selections, per-slice state writes). The
  * work stays deterministic — only the scheduling changes; outputs are
  * collected back in input order.
  */
object Concurrency {

  /** Run `f` over `items` on up to `maxThreads` driver threads, return
    * results in input order. Exceptions propagate (first failure wins);
    * every task is awaited before returning so no job leaks past the
    * call. For `items.size <= 1` runs inline — no pool, no overhead.
    */
  def inParallel[A, B](items: Seq[A], maxThreads: Int = 8)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(items.size, maxThreads))
    try {
      val futures = items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          override def call(): B = f(a)
        })
      }
      // get() rethrows the task's exception (wrapped); unwrap the cause
      // so callers see the original error, not ExecutionException.
      futures.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
