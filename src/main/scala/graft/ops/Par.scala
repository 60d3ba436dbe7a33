package graft.ops

import java.util.concurrent.{Callable, ExecutionException, Executors}

import org.apache.spark.sql.SparkSession

/** Overlap independent job-launching computations from driver threads.
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are sequential only because one driver thread
  * calls them sequentially (optimization guide §2.6). The composed
  * multimodal gates run an EAGER connected-components fixpoint per
  * modality (each round a localCheckpoint job + a convergence probe), so
  * three independent modality branches serialize ~6-10 small jobs each
  * for no reason. Running each branch on its own driver thread overlaps
  * those rounds; with default FIFO scheduling the later branches' tasks
  * back-fill executors the earlier branches' straggler tails leave idle —
  * on a cluster exactly as on local[N].
  *
  * Determinism: each branch's result is a pure function of its inputs
  * (the CC fixpoint converges to the same labeling under any scheduling),
  * so composed-query output is unchanged — the oracle gate re-proves it.
  *
  * Thread-safety notes for callers: [[CacheRegistry]] is a concurrent
  * queue (safe to register from branches); `SparkSession` supports
  * concurrent job submission; job-description/group properties are
  * thread-local and inherited at thread creation.
  */
object Par {

  /** Run the thunks concurrently, one driver thread each (callers pass
    * 2-3 branches — the guide's "2-3 jobs in flight is plenty"), and
    * return their results in order. The active session is propagated to
    * each worker thread so any session-dependent resolution inside a
    * branch sees the caller's session. Failures rethrow the branch's own
    * exception after all branches settle.
    */
  def run[A](session: SparkSession)(thunks: (() => A)*): Seq[A] = {
    if (thunks.lengthCompare(1) <= 0) return thunks.map(t => t()).toSeq
    val pool = Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new Callable[A] {
          def call(): A = {
            SparkSession.setActiveSession(session)
            t()
          }
        })
      }
      futs.map { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }.toSeq
    } finally pool.shutdown()
  }
}
