package graft

import java.sql.Date
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration.DurationInt

import graft.model.MaterializedDay
import graft.sources.{DayFetcher, DayFetcherOps, RetryingFetcher}

/** Failure injection for the retrying day-fetcher (reference tasks.py:339:
  * timeout=15, max_retries=5, retry_delay=15s). */
class DayFetcherSpec extends SparkSpec {

  private def day(date: Date) = Fixtures.fakeDays.head.copy(date = date)
  private val d1 = Date.valueOf("2021-01-01")

  private class FlakyFetcher(failures: Int) extends DayFetcher {
    val calls = new AtomicInteger(0)
    override def fetch(username: String, date: Date): MaterializedDay = {
      if (calls.incrementAndGet() <= failures)
        throw new java.io.IOException(s"injected failure ${calls.get()}")
      day(date)
    }
  }

  test("retry-then-succeed: transient failures are absorbed, delays served") {
    val inner = new FlakyFetcher(failures = 2)
    val delays = Seq.newBuilder[Long]
    val f = new RetryingFetcher(inner, timeout = 5.seconds, maxRetries = 5,
      retryDelay = 15.seconds, sleeper = delays += _)
    val got = f.fetch(Fixtures.user, d1)
    assert(got == day(d1))
    assert(inner.calls.get() == 3) // 2 failures + 1 success
    assert(delays.result() == Seq(15000L, 15000L)) // delay before each retry
  }

  test("exhausted retries rethrow the last failure after maxRetries+1 attempts") {
    val inner = new FlakyFetcher(failures = 100)
    val f = new RetryingFetcher(inner, timeout = 5.seconds, maxRetries = 5,
      retryDelay = 15.seconds, sleeper = _ => ())
    val e = intercept[java.io.IOException](f.fetch(Fixtures.user, d1))
    assert(e.getMessage == "injected failure 6") // 1 + 5 retries
    assert(inner.calls.get() == 6)
  }

  test("hung fetch is abandoned at the timeout and retried") {
    val hangs = new AtomicInteger(0)
    val inner = new DayFetcher {
      override def fetch(username: String, date: Date): MaterializedDay = {
        if (hangs.incrementAndGet() == 1) Thread.sleep(60000) // first call hangs
        day(date)
      }
    }
    val f = new RetryingFetcher(inner, timeout = 300.millis, maxRetries = 2,
      retryDelay = 1.second, sleeper = _ => ())
    val got = f.fetch(Fixtures.user, d1)
    assert(got == day(d1))
    assert(hangs.get() == 2) // timed-out attempt + successful retry
  }

  test("fetchDays distributes the date fan-out and lands typed days") {
    val dates = (1 to 9).map(i => Date.valueOf(f"2021-01-$i%02d"))
    val template = day(d1) // local value — the closure must not capture the spec
    val fetcher = new DayFetcher { // stateless — serialized to executors
      override def fetch(username: String, date: Date): MaterializedDay =
        template.copy(date = date, username = username)
    }
    val got = DayFetcherOps.fetchDays(spark, Fixtures.user, dates,
      new RetryingFetcher(fetcher, timeout = 5.seconds, maxRetries = 1,
        retryDelay = 0.seconds))
      .collect()
    assert(got.length == 9)
    assert(got.map(_.date.toString).sorted.toSeq ==
      dates.map(_.toString).sorted)
    assert(got.forall(_.username == Fixtures.user))
  }
}
