package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The r20 write-path fast path hashes a long-backed value's decimal ASCII
  * image from a reusable buffer instead of materializing the canonical
  * String per field per row. Sketches from both feeds MUST stay mergeable:
  * hllAddLong(v) must leave the register in exactly the state
  * hllAdd(v.toString) would — same bytes, same hash, same register slot —
  * or per-file NDV sketches silently diverge between write paths. */
class HllCodecSpec extends AnyFunSuite {
  private def regString(vs: Seq[Long]): Array[Byte] = {
    val r = new Array[Byte](GraftKvSink.HllM)
    vs.foreach(v => GraftKvSink.hllAdd(r, v.toString))
    r
  }
  private def regLong(vs: Seq[Long]): Array[Byte] = {
    val r = new Array[Byte](GraftKvSink.HllM)
    val buf = new Array[Byte](20)
    vs.foreach(v => GraftKvSink.hllAddLong(r, v, buf))
    r
  }

  test("hllAddLong register-identical to string feed across the value range") {
    val vs: Seq[Long] = Seq(0L, 1L, -1L, 7L, -7L, 10L, 99L, -100L, 1234567L,
      -987654321L, Long.MaxValue, Long.MinValue, Long.MinValue + 1,
      1000000007L, -62135596800000000L) ++ (-50L to 50L) ++
      (1 to 200).map(i => i * 987654321L - 400L * i * i)
    assert(java.util.Arrays.equals(regString(vs), regLong(vs)))
  }

  test("hllAddLong returns the UTF-8 byte length of the canonical image") {
    val buf = new Array[Byte](20)
    Seq(0L, 5L, -5L, 42L, -12345L, Long.MaxValue, Long.MinValue).foreach { v =>
      val r = new Array[Byte](GraftKvSink.HllM)
      assert(GraftKvSink.hllAddLong(r, v, buf) == v.toString.length,
        s"length mismatch for $v")
    }
  }
}
