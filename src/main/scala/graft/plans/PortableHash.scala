package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-portable 60-bit hash: the value of the FIRST 15 hex chars of
  * md5(bytes) — i.e. the top 60 bits of the digest read big-endian. Always
  * non-negative and < 2^60, so it is BIGINT-safe (no sign traps) in every
  * SQL engine.
  *
  * Three bit-identical twins, pinned against each other in PortableHashSpec:
  *   - this kernel (driver-side weight precomputation + codegen hot loops),
  *   - the Spark Column `conv(substring(md5(c), 1, 15), 16, 10)::long`
  *     ([[graft.functions.PortableHash.md5Head60]]),
  *   - DuckDB `('0x' || substr(md5(c), 1, 15))::BIGINT`.
  *
  * This is what the portable-mode operators (simhash near-dup, hyperplane
  * LSH, IVF seeding) derive their bits/weights/seeds from, so the driver's
  * DuckDB oracle can hash-match queries whose default mode uses xxhash64 —
  * a hash other engines don't ship. The xxhash64 default stays the scale
  * path (no MD5 per token); portable mode exists to make correctness
  * externally checkable, and its results are exactly as valid (any fixed
  * 60-bit hash family gives the same recall guarantees).
  */
object PortableHashKernel {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-thread direct-mapped memo for the UTF8String entry point (the
    * per-token hot path in SimHash64 portable mode). Token frequencies are
    * Zipfian, so a small cache absorbs most MD5 work — the xxhash64 slot
    * probe is ~20× cheaper than a digest. Keys are defensively cloned:
    * the input UTF8String may view a buffer Spark reuses across rows.
    *
    * Sizing: slots × ≤256 B keys pins up to ~8 MB per task thread for the
    * JVM lifetime (~256 MB across 32 threads at the default 32k slots) —
    * fine on this box's 128 GiB, a real reservation on small executors.
    * `-Dgraft.portableHash.memoSlots=N` (read once at class load, rounded
    * DOWN to a power of two, clamped to [1, 2^24]) trades hit rate for
    * heap; Zipfian token mixes lose little even at 2^13. */
  private[graft] def memoSlots(prop: Option[String]): Int = {
    val requested = prop.flatMap(_.trim.toIntOption)
      .filter(n => n >= 1 && n <= (1 << 24))
      .getOrElse(1 << 15)
    Integer.highestOneBit(requested)
  }
  private val memoMask =
    memoSlots(sys.props.get("graft.portableHash.memoSlots")) - 1
  private final class Memo(
      val keys: Array[UTF8String] = new Array[UTF8String](memoMask + 1),
      val vals: Array[Long] = new Array[Long](memoMask + 1))
  private val memos = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo()
  }

  def md5Head60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    // first 8 bytes big-endian = first 16 hex chars; >>> 4 drops the 16th
    val first16 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    first16 >>> 4
  }

  def md5Head60(s: String): Long = md5Head60(s.getBytes("UTF-8"))

  /** Keys above this size are hashed but never stored: the memo pins its
    * keys for the thread's lifetime, so without a bound a pathological
    * corpus (megabyte "tokens" with no separator) could pin slots × token
    * bytes of heap per thread. Natural-language tokens — the entire point
    * of the cache — are far below it. */
  private val memoMaxKeyBytes = 256

  def md5Head60(u: UTF8String): Long = {
    val m = memos.get()
    val slot = (org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUTF8String(u, 0L) & memoMask).toInt
    val k = m.keys(slot)
    if (k != null && k.equals(u)) m.vals(slot)
    else {
      val b = u.getBytes
      val v = md5Head60(b)
      // UTF8String.clone()/getBytes() return the CALLER'S array when the
      // string spans it whole — copyOf guarantees a private key copy
      // (PortableHashSpec's engineered slot collision catches sharing)
      if (b.length <= memoMaxKeyBytes) {
        m.keys(slot) = UTF8String.fromBytes(java.util.Arrays.copyOf(b, b.length))
        m.vals(slot) = v
      }
      v
    }
  }

  /** Signed recentering into [-1000002, 1000002] — the portable twin of the
    * `xxhash64 % 1000003` weight recipe. xxhash64 longs are full-range so %
    * keeps their sign; md5Head60 is non-negative, so without recentering
    * every hyperplane weight would be positive and all planes would crowd
    * one orthant (pairwise plane angles ~60° instead of ~90°, degrading
    * LSH recall). DuckDB twin: `h % 2000005 - 1000002`. */
  def md5Signed(s: String): Long = (md5Head60(s) % 2000005L) - 1000002L
}
