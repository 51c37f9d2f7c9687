package graft.ops

/** Concurrent INDEPENDENT Spark actions from driver threads — the
  * optimization guide's §2.6 "overlap independent jobs" recipe, scoped
  * to multi-leg operators (recall sweeps, per-band model fits) whose
  * legs are separate actions with no data dependency.
  *
  * Why this is safe and result-identical: Spark's scheduler runs
  * concurrently submitted jobs FIFO, each leg computes exactly the
  * frame it would compute sequentially (the legs share nothing but
  * OpCache holders, whose lazy-val build is monitor-serialized), and
  * the caller receives results in INPUT order — so the operator's
  * output is bit-identical to the sequential composition, only the
  * idle tail of each leg's stages is back-filled by the next leg's
  * tasks. At cluster scale the same overlap fills executors freed by a
  * leg's straggler tail; the pool is bounded so at most [[MaxLegs]]
  * jobs compete.
  *
  * IMPORTANT caller contract: any memoized single-build structure the
  * legs SHARE (kmMemo model fits, OpCache frames) must be forced
  * BEFORE forking — TrieMap.getOrElseUpdate evaluates its builder
  * outside the map's lock, so concurrent first-callers would each run
  * the build (identical results, wasted cluster time).
  */
private[ops] object Par {
  private val MaxLegs = 4

  /** Map `f` over `xs` with up to [[MaxLegs]] legs in flight; results
    * in input order; first failure rethrows after the pool drains. */
  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.lengthCompare(1) <= 0) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(MaxLegs, xs.length))
    try {
      val futures = xs.map(x => pool.submit(
        new java.util.concurrent.Callable[B] { def call(): B = f(x) }))
      futures.map { fu =>
        try fu.get()
        catch { // unwrap so callers see the leg's own exception type
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }
}
