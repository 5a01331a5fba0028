package graft.ops

/** Concurrent execution of INDEPENDENT per-tier store operations —
  * the optimization guide's "overlap independent jobs" (§2.6) applied
  * to the transaction layer. Spark's scheduler happily runs several
  * jobs at once inside one application; the quad's tier operations
  * (four stores, four disjoint directories, no cross-reads during a
  * transaction) were only sequential because the coordinator called
  * them sequentially. Overlapping them backfills the executor slots
  * each tier's job tail leaves idle — and, just as importantly at any
  * scale, overlaps the driver-side planning + staging + manifest-flip
  * latency of one tier with the task execution of the others (each
  * tier op is a chain of many small jobs separated by driver work, so
  * a sequential coordinator leaves the cluster idle between them).
  *
  * Semantics are preserved, not approximated: each task is the same
  * tier operation with the same arguments over its own directory, and
  * the transaction layer's replay contract is PER-TIER (`_applied`
  * batch witnesses, atomic manifest flips) — a coordinator crash that
  * leaves an arbitrary SUBSET of tiers committed converges on replay
  * exactly as the prefix a sequential coordinator leaves, because
  * convergence never depended on tier order (each tier independently
  * no-ops or folds by its own witness; CorpusStoreSpec fabricates the
  * partial-fold crash). ALL tasks are awaited before the first
  * failure (in argument order) is rethrown, so no background tier
  * write ever outlives the coordinator call.
  *
  * Plain threads rather than a shared pool: Spark's job-group /
  * job-description properties live in inheritable thread-locals, and
  * a fresh thread per call inherits the calling transaction's —
  * a cached pool thread would leak the FIRST caller's labels into
  * every later transaction's jobs.
  */
private[graft] object TierPar {
  private def runAll(tasks: Seq[() => Any]): IndexedSeq[Any] = {
    if (tasks.sizeIs <= 1) return tasks.map(_()).toIndexedSeq
    val results = new Array[Either[Throwable, Any]](tasks.size)
    val threads = tasks.zipWithIndex.map { case (t, i) =>
      new Thread(() => {
        results(i) = try Right(t())
        catch { case e: Throwable => Left(e) }
      }, s"graft-tier-$i")
    }
    threads.foreach { th => th.setDaemon(true); th.start() }
    threads.foreach(_.join())
    results.foreach { case Left(e) => throw e case _ => }
    results.map(_.toOption.get).toIndexedSeq
  }

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val r = runAll(Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val r = runAll(Seq(() => a, () => b, () => c))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }

  def par4[A, B, C, D](a: => A, b: => B, c: => C, d: => D)
      : (A, B, C, D) = {
    val r = runAll(Seq(() => a, () => b, () => c, () => d))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C],
      r(3).asInstanceOf[D])
  }
}
