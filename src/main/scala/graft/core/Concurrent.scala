package graft.core

/** Concurrent driver actions (optimization guide §2.6 "overlap independent
  * jobs"): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls them
  * sequentially. When two eager materializations are INDEPENDENT (e.g. the
  * two sides of a cross-corpus dedup each tokenizing their own corpus),
  * running them from two threads lets the second job's tasks back-fill the
  * executor slots the first job's straggler tail frees, instead of leaving
  * the cluster idle through two sequential tails.
  */
object Concurrent {

  /** Evaluate `fa` and `fb` concurrently (fb on a daemon thread, fa on the
    * caller's thread) and return both results. Both computations always run
    * to completion before this returns — a failure in one side is rethrown
    * only after the other side has finished, so no job is left mutating
    * state behind the caller's back. The first failure (fa's preferred)
    * propagates.
    */
  def both[A, B](fa: => A, fb: => B): (A, B) = {
    val bBox = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, B]]()
    val t = new Thread(() => bBox.set(
      try Right(fb) catch { case e: Throwable => Left(e) }), "graft-concurrent-b")
    t.setDaemon(true)
    t.start()
    val aRes = try Right(fa) catch { case e: Throwable => Left(e) }
    t.join()
    (aRes, bBox.get()) match {
      case (Right(a), Right(b)) => (a, b)
      case (Left(e), _)         => throw e
      case (_, Left(e))         => throw e
    }
  }
}
