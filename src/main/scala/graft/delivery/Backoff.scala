package graft.delivery

/** Retry-delay schedule (reference `src/cdc_webhook.c:103-109`):
  * LINEAR → constant `interval` seconds; EXPONENTIAL → `interval * 2^n`
  * seconds with n starting at 0 (bit-shift in the reference, `:108`).
  * With interval=2: LINEAR 2,2,2…; EXPONENTIAL 2,4,8,… */
object Backoff {
  def delaySeconds(strategy: String, intervalSeconds: Int, retryIndex: Int): Long =
    strategy match {
      case "LINEAR"      => intervalSeconds.toLong
      case "EXPONENTIAL" => intervalSeconds.toLong * (1L << retryIndex)
      case other => throw new IllegalArgumentException(s"unknown backoff: $other")
    }

  def delayMs(strategy: String, intervalSeconds: Int, retryIndex: Int): Long =
    delaySeconds(strategy, intervalSeconds, retryIndex) * 1000L

  /** Full schedule for `retryNumber` retries (the sleeps between the
    * `retryNumber + 1` total attempts, `src/cdc_webhook.c:178`). */
  def schedule(strategy: String, intervalSeconds: Int, retryNumber: Int): Seq[Long] =
    (0 until retryNumber).map(delaySeconds(strategy, intervalSeconds, _))
}
