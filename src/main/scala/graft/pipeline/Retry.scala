package graft.pipeline

import scala.util.control.NonFatal

/** Bounded task retry — the reference DAG's operational contract
  * (`default_args` retries/retry_delay, /root/reference/dags/
  * extract.py:178-183): a failed task re-executes up to `attempts`
  * total tries with a fixed delay between them; exhausted retries
  * rethrow the last failure to the scheduler. `onRetry` runs before
  * every re-attempt — the hook where a stage restores idempotence
  * (sweep partial output) before running again.
  */
object Retry {

  def apply[T](name: String, attempts: Int, delayMs: Long = 0L,
               onRetry: () => Unit = () => ())(body: => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var tried = 0
    while (true) {
      try return body
      catch {
        case NonFatal(e) =>
          tried += 1
          if (tried >= attempts) throw e
          if (delayMs > 0) Thread.sleep(delayMs)
          onRetry()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Airflow `catchup` batch selection (extract.py:196-197,
    * `catchup=False`): given the pending batch backlog in schedule
    * order, `catchup = true` replays every missed interval;
    * `catchup = false` runs only the LATEST pending batch — the
    * no-backfill deployment behavior the reference chose. Batches at
    * or before `lastRun` are already done and never re-selected.
    */
  def selectBatches[A](pending: Seq[(java.sql.Timestamp, A)],
                       lastRun: Option[java.sql.Timestamp],
                       catchup: Boolean): Seq[(java.sql.Timestamp, A)] = {
    val todo = pending.filter { case (ts, _) =>
      lastRun.forall(lr => ts.after(lr)) }
    if (catchup || todo.isEmpty) todo else Seq(todo.maxBy(_._1.getTime))
  }
}
