package graft.util

/** Run INDEPENDENT side-effect stages concurrently (optimization guide
  * §2.6 — Spark's scheduler happily runs several jobs at once; actions
  * are only sequential because driver code calls them sequentially).
  * Stages must touch DISJOINT outputs and read only materialized or
  * immutable inputs, so results equal the sequential composition by
  * construction. Stages submit in order and FIFO scheduling gives the
  * first-submitted job resources first — put the critical path first.
  * The first failure propagates with its original exception (a failed
  * stage must surface exactly as it would sequentially). */
private[graft] object Par {
  def inParallel(stages: (() => Unit)*): Unit = {
    if (stages.isEmpty) return
    if (stages.size == 1) { stages.head.apply(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(stages.size)
    try {
      val futs = stages.map(f => pool.submit(
        new java.util.concurrent.Callable[Unit] { def call(): Unit = f() }))
      futs.foreach { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }
    } finally pool.shutdown()
  }
}
