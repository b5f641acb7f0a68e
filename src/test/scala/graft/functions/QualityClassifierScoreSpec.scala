package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the native scorer's static loops — the cases Spark-level
  * specs cannot reach: invalid-UTF-8 byte strings that still satisfy the
  * byte-path precondition (numBytes == numChars) must bypass the shared
  * trigram memo, because masking a continuation byte into a 7-bit key
  * would collide with a real ASCII trigram and poison the process-global
  * cache for every later document in the JVM. */
class QualityClassifierScoreSpec extends AnyFunSuite {

  private def md5Bucket(bytes: Array[Byte], dim: Int): Int = {
    val h = MessageDigest.getInstance("MD5").digest(bytes)
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim
  }

  test("invalid-UTF-8 byte paths never poison the shared trigram memo") {
    // a dim no other test uses => this test owns its global cache
    val dim = 517
    val weights = Array.tabulate(dim)(b => (b * 13 + 1).toLong)
    val cache = QualityClassifierScore.cacheFor(3, dim)
    assert(cache != null)
    // 0xB1 is a standalone continuation byte: UTF8String counts it as one
    // char, so [0xB1, '2', '3'] takes the BYTE path — and 0xB1 & 0x7f ==
    // '1', so under a masked key it would alias the genuine trigram "123"
    val badBytes = Array(0xB1.toByte, '2'.toByte, '3'.toByte)
    val bad = UTF8String.fromBytes(badBytes)
    assert(bad.numBytes == bad.numChars, "precondition: byte path taken")
    // score the malformed string FIRST (the poisoning order)
    val badSum = QualityClassifierScore.byteLoop(bad, weights, 3, cache)
    val goodSum = QualityClassifierScore.byteLoop(
      UTF8String.fromString("123"), weights, 3, cache)
    assert(badSum == weights(md5Bucket(badBytes, dim)),
      "the malformed trigram scores its own raw-byte md5 bucket")
    assert(goodSum == weights(md5Bucket("123".getBytes("UTF-8"), dim)),
      "the real trigram must be unaffected by the earlier malformed scan")
  }

  test("byte loop and char loop agree on pure-ASCII input (memo on and off)") {
    val dim = 519 // own cache again
    val weights = Array.tabulate(dim)(b => (b * 7 - 300).toLong)
    val s = "the quick brown fox"
    val viaBytes = QualityClassifierScore.byteLoop(
      UTF8String.fromString(s), weights, 3, QualityClassifierScore.cacheFor(3, dim))
    val viaChars = QualityClassifierScore.charLoop(s, weights, 3, null)
    assert(viaBytes == viaChars)
  }
}
