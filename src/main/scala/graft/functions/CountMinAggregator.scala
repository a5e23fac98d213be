package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch buffer: `d · w` cell counts (row-major) plus the
  * processed-element count.
  */
case class CMSBuf(cells: Array[Long], total: Long)

/** Typed Count-Min sketch — the fixed-memory, mergeable point-query
  * counter (Cormode & Muthukrishnan, J. Algorithms 2005) that complements
  * [[MisraGriesAggregator]]: MG answers "WHICH keys are heavy" with
  * merge-order-dependent estimates, CMS answers "how often did key x
  * occur" for ANY x with `d · w` longs regardless of stream size — and,
  * unlike MG, its estimates are DETERMINISTIC under any partition/merge
  * order, because every cell is a pure sum of indicator counts
  * (order-independent integer math). That is why [[graft.operators
  * .TextAnalysisOps.cmsProfile]] can hash-gate raw estimates against a
  * relational DuckDB replay, where the MG gate (q78) must emit exact
  * recounts.
  *
  * Guarantees: est(x) ≥ true(x) always (never undercounts); the
  * overestimate bound est(x) ≤ true(x) + εN holds with probability
  * 1 − δ (ε = e/w, δ = e^−d) — probabilistic, so the library gate pins
  * the deterministic side and the spec exercises collision-heavy
  * configurations structurally.
  *
  * Hashing: row i maps x to bucket `hex3(md5(x || "_" || i)) mod w`
  * (first three hex digits of the md5) — md5 is the one cross-engine
  * hash (the q80/q83 recipe), so the exact same bucket function is
  * expressible as a Catalyst column and as DuckDB SQL.
  */
class CountMinAggregator(d: Int, w: Int)
    extends Aggregator[String, CMSBuf, CMSBuf] {
  require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
  // the bucket decode yields 12 bits (0..4095): w > 4096 leaves cells
  // unreachable, and a non-divisor w biases low buckets (pigeonhole over
  // the 2^12 range) — breaking the eps = e/w bound silently
  require(w >= 2 && w <= 4096 && 4096 % w == 0,
    s"w must be a divisor of 4096 in [2, 4096], got $w")

  override def zero: CMSBuf = CMSBuf(new Array[Long](d * w), 0L)

  override def reduce(b: CMSBuf, tok: String): CMSBuf = {
    val md = CountMinAggregator.threadDigest.get()
    var i = 0
    while (i < d) {
      b.cells(i * w + CountMinAggregator.bucket(md, tok, i, w)) += 1L
      i += 1
    }
    CMSBuf(b.cells, b.total + 1L)
  }

  override def merge(a: CMSBuf, b: CMSBuf): CMSBuf = {
    val out = new Array[Long](d * w)
    var i = 0
    while (i < d * w) { out(i) = a.cells(i) + b.cells(i); i += 1 }
    CMSBuf(out, a.total + b.total)
  }

  override def finish(r: CMSBuf): CMSBuf = r

  override def bufferEncoder: Encoder[CMSBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[CMSBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object CountMinAggregator {
  /** One digest per thread — reduce runs once per corpus token, and a
    * per-row getInstance allocation is measurable on the sketch's one
    * hot path. bucket() resets before every use, so reuse is safe.
    */
  private val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Row-i bucket of `tok`: decode the first three hex digits of
    * md5(tok || "_" || i) — identical to the `instr('0123456789abcdef',
    * substr(md5(…), j, 1)) - 1` SQL decode — then mod w.
    */
  private[functions] def bucket(md: MessageDigest, tok: String, i: Int,
      w: Int): Int = {
    md.reset()
    val dig = md.digest((tok + "_" + i).getBytes(StandardCharsets.UTF_8))
    // first three hex chars = high nibble of byte 0, low nibble of byte
    // 0, high nibble of byte 1 — value in [0, 4095]
    val hex3 = ((dig(0) & 0xff) << 4) | ((dig(1) & 0xf0) >>> 4)
    hex3 % w
  }

  /** Bucket function exposed for specs (fresh digest per call). */
  private[graft] def bucketOf(tok: String, i: Int, w: Int): Int =
    bucket(MessageDigest.getInstance("MD5"), tok, i, w)
}
