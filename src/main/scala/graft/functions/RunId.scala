package graft.functions

import java.security.SecureRandom

/** Time-sortable 63-bit run-id generator.
  *
  * The reference derives run ids as `uuid7().int >> 65` (timedb/write.py:58-65):
  * the top 63 bits of a UUIDv7, i.e. 48 bits of unix-millis followed by
  * 15 random bits, so ids are time-ordered and fit a signed 64-bit integer.
  * We construct the same layout directly: `millis(48) ‖ random(15)`.
  */
object RunId {
  private val rng = new SecureRandom()

  def next(): Long = next(System.currentTimeMillis())

  def next(epochMillis: Long): Long = {
    val millis48 = epochMillis & 0xFFFFFFFFFFFFL
    val rand15 = rng.nextInt(1 << 15).toLong
    (millis48 << 15) | rand15
  }
}
