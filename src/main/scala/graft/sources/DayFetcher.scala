package graft.sources

import java.sql.Date

import scala.concurrent.{ExecutionContext, TimeoutException}
import scala.concurrent.duration.{Duration, DurationInt}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.MaterializedDay

/** Per-date fetch contract for the S1 day source — the engine-side shape of
  * the reference's network scraper (reference _utils.py:81-129
  * MyfitnesspalClientAdapter). Implementations are Serializable because
  * [[DayFetcher.fetchDays]] runs them on EXECUTORS, one partition of dates
  * each — the per-date fan-out the reference expresses as `task.map` becomes
  * data parallelism, with no driver-side iteration.
  */
trait DayFetcher extends Serializable {
  /** Fetch one day document. Throw on failure — retry policy is layered on
    * by [[RetryingFetcher]], not implemented per source. */
  def fetch(username: String, date: Date): MaterializedDay
}

/** The reference's flaky-network retry contract (reference tasks.py:339:
  * `@task(timeout=15, max_retries=5, retry_delay=timedelta(seconds=15))`)
  * as a composable wrapper: each attempt is bounded by `timeout`, a failed
  * or timed-out attempt is retried up to `maxRetries` times with
  * `retryDelay` between attempts, and exhaustion rethrows the last failure.
  *
  * `sleeper` is injectable so failure-injection specs don't serve real
  * delays; the default sleeps the executor task thread (correct under
  * Spark — blocking a task slot is how per-record backoff must behave; an
  * async scheduler would let one partition flood the flaky remote).
  */
final class RetryingFetcher(
    underlying: DayFetcher,
    timeout: Duration = 15.seconds,
    maxRetries: Int = 5,
    retryDelay: Duration = 15.seconds,
    sleeper: Long => Unit = Thread.sleep) extends DayFetcher {

  require(maxRetries >= 0, s"maxRetries $maxRetries < 0")

  override def fetch(username: String, date: Date): MaterializedDay = {
    var lastFailure: Throwable = null
    var attempt = 0
    while (attempt <= maxRetries) {
      if (attempt > 0 && retryDelay.toMillis > 0) sleeper(retryDelay.toMillis)
      // The attempt runs on a separate thread so a hung remote call is
      // bounded by `timeout` (the reference's task-level timeout=15). On
      // timeout the attempt is cancelled WITH interruption — without it,
      // each timed-out attempt would strand a live thread (and its socket)
      // in the cached pool forever. A fetch blocked in non-interruptible
      // I/O can still linger; interruption is best effort, but the common
      // blocking calls (sockets with timeouts, sleeps, locks) do unwind.
      val task = new java.util.concurrent.FutureTask[MaterializedDay](
        () => underlying.fetch(username, date))
      RetryingFetcher.fetchPool.execute(task)
      try {
        return task.get(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          task.cancel(true) // interrupt the attempt thread
          lastFailure = new TimeoutException(
            s"day fetch for ($username, $date) exceeded $timeout " +
              s"(attempt ${attempt + 1}/${maxRetries + 1})")
        case e: java.util.concurrent.ExecutionException =>
          lastFailure = e.getCause
        case scala.util.control.NonFatal(e) => lastFailure = e
      }
      attempt += 1
    }
    throw lastFailure
  }
}

object RetryingFetcher {
  /** Daemon pool for timeout-bounded fetch attempts (cached: idle threads
    * die, a busy executor core keeps one warm). */
  private lazy val fetchPool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "day-fetch")
        t.setDaemon(true)
        t
      }))
}

object DayFetcherOps {
  /** Fan a date range out across the cluster and fetch each day: dates
    * become a Dataset partitioned over the executors, and each partition
    * drives its fetcher serially (the remote rate-limits per connection —
    * parallelism is the number of partitions, the knob the reference turns
    * with its mapped task concurrency). */
  def fetchDays(spark: SparkSession, username: String, dates: Seq[Date],
                fetcher: DayFetcher,
                parallelism: Int = 8): Dataset[MaterializedDay] = {
    import spark.implicits._
    val dateStrs = dates.map(_.toString)
    spark.createDataset(dateStrs)
      .repartition(math.min(parallelism, math.max(dates.size, 1)))
      .mapPartitions(_.map(d => fetcher.fetch(username, Date.valueOf(d))))
  }
}
