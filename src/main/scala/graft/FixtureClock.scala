package graft

/** Wall-clock accumulator separating FIXTURE-BUILD time from operator
  * time inside the protocol query keys (round 12 — VERDICT r11 item 7):
  * q163/q169/q170/q171/q173 construct a multi-merge store INSIDE the
  * query function (the protocol IS the operator under test), which put
  * ~24 s of store construction into the bench's timed region and
  * diluted its regression signal — the per-key seconds mostly measured
  * fixture setup, not the incremental-maintenance operator. Those keys
  * wrap their build phase (initial bulk merge + first refresh) in
  * `timed`; `Bench` drains the accumulator after every timed round and
  * reports per-key OPERATOR time (round minus fixture) in `queries`,
  * with the fixture medians published beside them in `fixtures`.
  * Verify never reads the clock — correctness runs the whole protocol
  * regardless.
  *
  * Thread-confined by usage (Bench runs keys sequentially on the
  * driver and the wrapped phases are driver-blocking actions); the
  * AtomicLong is cheap insurance, not a concurrency claim. */
object FixtureClock {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)

  def timed[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally { acc.addAndGet(System.nanoTime() - t0); () }
  }

  /** Seconds accumulated since the last drain; resets to zero. */
  def drainSeconds(): Double = acc.getAndSet(0L) / 1e9
}
