package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregate surface (SURVEY.md §2.10): the reference's
  * `AggregateFunction[T, ACC]` contract (AggregateFunction.scala:97 —
  * createAccumulator/accumulate/merge/getValue) maps to
  * `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]`. The
  * `retract` method has no Spark analog and is not needed: Structured
  * Streaming recomputes incremental state per key instead of retracting
  * emitted rows.
  *
  * [[MultisetAgg]] reproduces the reference's COLLECT multiset aggregate
  * (CollectAggFunction.scala — SQL COLLECT returns MULTISET, backed by a
  * value→count map). [[WeightedAvgAgg]] is the reference documentation's
  * canonical UDAGG example.
  */
object Udafs {

  /** SQL COLLECT: multiset of ints as a value→count map. Boxed input:
    * a primitive-Int Aggregator silently UNBOXES a NULL row to 0 and
    * counts it (found by the adversarial-fixture check — a NULL
    * quantity minted a phantom '0:1' entry); SQL aggregates skip NULL
    * inputs, as every other aggregator in this file already does. */
  class MultisetAgg
      extends Aggregator[java.lang.Integer, Map[Int, Int], Map[Int, Int]] {
    def zero: Map[Int, Int] = Map.empty
    def reduce(b: Map[Int, Int], a: java.lang.Integer): Map[Int, Int] =
      if (a == null) b else b.updated(a.intValue,
        b.getOrElse(a.intValue, 0) + 1)
    def merge(x: Map[Int, Int], y: Map[Int, Int]): Map[Int, Int] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0) + v) }
    def finish(b: Map[Int, Int]): Map[Int, Int] = b
    def bufferEncoder: Encoder[Map[Int, Int]] = Encoders.kryo[Map[Int, Int]]
    def outputEncoder: Encoder[Map[Int, Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  case class WeightedIn(value: Double, weight: Double)
  case class WeightedBuf(sum: Double, wsum: Double)

  /** Weighted average — the UDAGG example from the reference docs. */
  class WeightedAvgAgg extends Aggregator[WeightedIn, WeightedBuf, Double] {
    def zero: WeightedBuf = WeightedBuf(0.0, 0.0)
    def reduce(b: WeightedBuf, a: WeightedIn): WeightedBuf =
      WeightedBuf(b.sum + a.value * a.weight, b.wsum + a.weight)
    def merge(x: WeightedBuf, y: WeightedBuf): WeightedBuf =
      WeightedBuf(x.sum + y.sum, x.wsum + y.wsum)
    def finish(b: WeightedBuf): Double =
      if (b.wsum == 0.0) 0.0 else b.sum / b.wsum
    def bufferEncoder: Encoder[WeightedBuf] = Encoders.product[WeightedBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Mergeable HyperLogLog sketch over strings — the 100 TB
    * distinct-count primitive a training-data pipeline needs (beyond the
    * reference; Spark's built-in approx_count_distinct also uses HLL++
    * but its sketch is not exposed as a REUSABLE value). The accumulator
    * IS the sketch: 2^p max-rank registers fed by xxhash64, so partial
    * sketches from different days/shards/tables merge by register-max —
    * the property that lets 100 TB of per-partition sketches roll up
    * through any aggregation tree. Standard error ≈ 1.04/sqrt(2^p)
    * (~1.6% at the default p=12, 4 KiB per sketch); small cardinalities
    * use linear counting, per the HLL paper. */
  class HllAgg(p: Int = 12) extends Aggregator[String, Array[Byte], Long] {
    private val m = 1 << p

    def zero: Array[Byte] = new Array[Byte](m)

    def reduce(regs: Array[Byte], v: String): Array[Byte] = {
      if (v != null) {
        val bytes = v.getBytes("UTF-8")
        def h32(seed: Int): Long = org.apache.spark.unsafe.hash
          .Murmur3_x86_32.hashUnsafeBytes2(bytes,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, seed).toLong
        val h = (h32(42) << 32) | (h32(7) & 0xFFFFFFFFL)
        val idx = (h >>> (64 - p)).toInt
        val rank = (java.lang.Long.numberOfLeadingZeros((h << p) | 1L) + 1)
          .min(64 - p)
        if (rank > regs(idx)) regs(idx) = rank.toByte
      }
      regs
    }

    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }

    def finish(regs: Array[Byte]): Long = {
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / m)
      }
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += 1.0 / (1L << regs(i))
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / invSum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      math.round(est)
    }

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Mergeable KMV (k-minimum-values / bottom-k theta) distinct sketch
    * over strings — the DETERMINISTIC companion to [[HllAgg]]: values
    * hash through the same md5 60-bit prefix as the MinHash/SimHash
    * expressions, so the estimate is bit-replicable in the DuckDB oracle
    * (qs10), unlike HLL's murmur registers. The accumulator is the k
    * smallest distinct hashes, merged by union-and-trim — the same
    * any-aggregation-tree rollup property as HLL (512 B per sketch at
    * k=64). Estimate: exact count below k; else floor((k-1) · 2^60 /
    * h_k) — the classic KMV estimator (Bar-Yossef et al. 2002), relative
    * error ≈ 1/sqrt(k-2) (~13% at k=64). Bottom-k sketches additionally
    * support set operations (union = merge; intersection via the theta
    * framework), which register sketches cannot express exactly. */
  /** The md5 60-bit prefix shared by the sketch UDAFs ([[KmvAgg]],
    * [[KllAgg]]) and the MinHash/SimHash expressions — rendered
    * bit-identically in DuckDB as a hex-nibble positional sum (qs10/qs11
    * oracles). */
  // one digest per thread, reset per call: getInstance does a provider
  // lookup + allocation, and hash60 sits in the per-ROW reduce path of
  // five sketch aggregators (review r16 — the sibling expressions
  // already reuse one digest per eval)
  private[functions] val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private[functions] def hash60(v: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(v.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    (h << 4) | ((d(7) & 0xF0L) >> 4)
  }

  class KmvAgg(k: Int = 64) extends Aggregator[String, Array[Long], Long] {
    def zero: Array[Long] = Array.empty[Long]

    private def hash60(v: String): Long = Udafs.hash60(v)

    def reduce(buf: Array[Long], v: String): Array[Long] = {
      if (v == null) return buf
      val h = hash60(v)
      val i = java.util.Arrays.binarySearch(buf, h)
      if (i >= 0) buf // already present
      else {
        val at = -i - 1
        if (at >= k) buf // larger than the current k minima
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, at)
          out(at) = h
          System.arraycopy(buf, at, out, at + 1, n - at - 1)
          out
        }
      }
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.isEmpty) return y
      if (y.isEmpty) return x
      val out = new Array[Long](math.min(x.length + y.length, k))
      var (i, j, n) = (0, 0, 0)
      var last = Long.MinValue
      while (n < out.length && (i < x.length || j < y.length)) {
        val v =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) {
            val v = x(i); i += 1; v
          } else { val v = y(j); j += 1; v }
        if (v != last) { out(n) = v; n = n + 1; last = v }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else math.floor((k - 1).toDouble * 1152921504606846976.0 /* 2^60 */
        / buf(k - 1).toDouble).toLong

    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[KmvAgg]] finishing to the RAW sketch (the sorted bottom-k hash
    * array) instead of the distinct estimate — the input to the theta
    * set-operation finishers below (`graft_kmv_intersect`/`_diff`). */
  class KmvSketchAgg(k: Int = 64)
      extends Aggregator[String, Array[Long], Array[Long]] {
    private val inner = new KmvAgg(k)
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], v: String): Array[Long] = inner.reduce(buf, v)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  private val Theta60 = 1L << 60

  /** The sketch's exclusive hash threshold: everything below it is
    * retained. A sketch still below k holds EVERY distinct hash, so its
    * threshold is the full 2^60 range (estimates become exact). */
  private def thetaOf(s: Array[Long], k: Int): Long =
    if (s.length < k) Theta60 else s(k - 1)

  /** Theta-framework intersection estimate over two bottom-k sketches
    * (the set operation the scaladoc above advertises and register
    * sketches like HLL cannot express exactly): restrict both sketches
    * to the SHARED threshold theta = min(theta_a, theta_b) — below it
    * each sketch holds every distinct hash of its set — count the common
    * hashes, and scale by the sampled fraction: floor(c * 2^60 / theta),
    * computed in BigInt so the oracle replicates it with HUGEINT
    * division (both truncate toward zero; operands positive => floor).
    * When both sketches are exact (< k values) theta = 2^60 and the
    * result is the exact distinct intersection. Relative error follows
    * the theta-sketch bound ~1/sqrt(k-1) on the sampled regime. */
  def kmvIntersect(a: Array[Long], b: Array[Long], k: Int = 64): Long = {
    val theta = math.min(thetaOf(a, k), thetaOf(b, k))
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && j < b.length && a(i) < theta && b(j) < theta) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    (BigInt(c) * BigInt(Theta60) / BigInt(theta)).toLong
  }

  /** Theta-framework difference estimate |A \ B| — same restriction to
    * the shared theta, counting a-hashes with NO match in b. Membership
    * is decidable because any B-hash below theta <= theta_b is
    * necessarily IN b's bottom-k. */
  def kmvDiff(a: Array[Long], b: Array[Long], k: Int = 64): Long = {
    val theta = math.min(thetaOf(a, k), thetaOf(b, k))
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && a(i) < theta) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) c += 1
      i += 1
    }
    (BigInt(c) * BigInt(Theta60) / BigInt(theta)).toLong
  }

  /** Union estimate: bottom-k sketches merge EXACTLY (union-and-trim),
    * so this is just merge + the [[KmvAgg]] estimator — and satisfies
    * `graft_kmv_union(a, b) == graft_kmv(A ++ B)` bit-for-bit (the
    * mergeability property the per-shard rollup relies on). */
  def kmvUnion(a: Array[Long], b: Array[Long], k: Int = 64): Long = {
    val agg = new KmvAgg(k)
    agg.finish(agg.merge(a.clone(), b))
  }

  /** Jaccard similarity estimate |A∩B| / |A∪B| from two bottom-k
    * sketches: both counts restricted to the shared theta (integer
    * counts, one double division — deterministic cross-engine). NaN-free:
    * two empty sets have similarity 0. */
  def kmvJaccard(a: Array[Long], b: Array[Long], k: Int = 64): Double = {
    val theta = math.min(thetaOf(a, k), thetaOf(b, k))
    var i = 0; var j = 0; var inter = 0L; var union = 0L
    while ((i < a.length && a(i) < theta) || (j < b.length && b(j) < theta)) {
      val ai = if (i < a.length && a(i) < theta) a(i) else Long.MaxValue
      val bj = if (j < b.length && b(j) < theta) b(j) else Long.MaxValue
      union += 1
      if (ai == bj) { inter += 1; i += 1; j += 1 }
      else if (ai < bj) i += 1
      else j += 1
    }
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }

  /** Input row for [[KllAgg]]: a row-unique id (the sampling key) and
    * the measured value. */
  /** Boxed value (adversarial-fixture check): a primitive field made
    * the udaf input conversion coerce a schema-legal NULL metric to
    * 0.0 and sketch a phantom sample row; SQL quantile aggregates skip
    * NULL inputs. */
  final case class KllIn(id: String, v: java.lang.Double)

  /** Mergeable QUANTILE sketch — the third seat in the 100 TB dashboard
    * trio (distinct = [[HllAgg]]/[[KmvAgg]], quantile = this), filled by
    * a deterministic bottom-k-by-hash ROW SAMPLE rather than a
    * randomized KLL compactor. Construction: hash each row's unique id
    * through the same md5 60-bit prefix as [[KmvAgg]]; the sketch is the
    * k rows with the smallest hashes, carrying their values — a uniform
    * sample whose membership is a pure function of the data. Merge =
    * union-and-trim (commutative, associative, idempotent), so the
    * sketch rolls up through ANY aggregation tree bit-identically;
    * finish returns the sampled values ASCENDING, and rank r of n
    * estimates quantile r/n with error O(1/sqrt(k)) (~12% rank error at
    * k=64, the classic bottom-k sampling bound).
    *
    * Why not a true KLL (Karnin-Lang-Liberty 2016)? Its compactors are
    * randomized AND order-dependent: the result varies with Spark's
    * partial-aggregation merge order, which no cross-engine hash gate
    * can verify. The hash-sample trades a constant factor of space for
    * determinism — the same trade [[KmvAgg]] makes vs HLL — and is
    * bit-replicable in DuckDB (qs11: hex-nibble hash, bottom-k by hash,
    * rank over the sample). Hash ties (60-bit collisions) keep the
    * smaller value, so both engines resolve them identically. */
  class KllAgg(k: Int = 64)
      extends Aggregator[KllIn, (Array[Long], Array[Double]), Array[Double]] {
    def zero: (Array[Long], Array[Double]) =
      (Array.empty[Long], Array.empty[Double])

    def reduce(buf: (Array[Long], Array[Double]), in: KllIn):
        (Array[Long], Array[Double]) = {
      if (in == null || in.id == null || in.v == null) return buf
      val (hs, vs) = buf
      val h = hash60(in.id)
      val i = java.util.Arrays.binarySearch(hs, h)
      if (i >= 0) {
        if (in.v < vs(i)) { // collision: keep the smaller value
          val v2 = vs.clone(); v2(i) = in.v; (hs, v2)
        } else buf
      } else {
        val at = -i - 1
        if (at >= k) buf
        else {
          val n = math.min(hs.length + 1, k)
          val h2 = new Array[Long](n); val v2 = new Array[Double](n)
          System.arraycopy(hs, 0, h2, 0, at)
          System.arraycopy(vs, 0, v2, 0, at)
          h2(at) = h; v2(at) = in.v
          System.arraycopy(hs, at, h2, at + 1, n - at - 1)
          System.arraycopy(vs, at, v2, at + 1, n - at - 1)
          (h2, v2)
        }
      }
    }

    def merge(x: (Array[Long], Array[Double]),
        y: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
      if (x._1.isEmpty) return y
      if (y._1.isEmpty) return x
      val n = math.min(x._1.length + y._1.length, k)
      val h2 = new Array[Long](n); val v2 = new Array[Double](n)
      var (i, j, m) = (0, 0, 0)
      while (m < n && (i < x._1.length || j < y._1.length)) {
        // three-way: smaller hash first; equal hashes fuse to min value
        if (j >= y._1.length ||
          (i < x._1.length && x._1(i) < y._1(j))) {
          h2(m) = x._1(i); v2(m) = x._2(i); i += 1; m += 1
        } else if (i >= x._1.length || y._1(j) < x._1(i)) {
          h2(m) = y._1(j); v2(m) = y._2(j); j += 1; m += 1
        } else {
          h2(m) = x._1(i); v2(m) = math.min(x._2(i), y._2(j))
          i += 1; j += 1; m += 1
        }
      }
      if (m == n) (h2, v2)
      else (java.util.Arrays.copyOf(h2, m), java.util.Arrays.copyOf(v2, m))
    }

    def finish(buf: (Array[Long], Array[Double])): Array[Double] = {
      val out = buf._2.clone()
      java.util.Arrays.sort(out)
      out
    }

    def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Count-Min sketch geometry: d independent hash rows of w counters.
    * w=512 bounds the overestimate by ~2n/w (n = stream length); d=4
    * drives the failure probability to e^-4. 4 KiB of longs per sketch —
    * the same footprint class as [[HllAgg]]. */
  val CmsW = 512
  val CmsD = 4
  // pairwise-independent family h_j(x) = ((a_j*x + b_j) mod p) mod w over
  // the Mersenne prime p = 2^31-1 (Carter-Wegman). The coefficients are
  // plain integer literals so the oracle can restate the family in SQL.
  private val CmsP = 2147483647L
  private val CmsA = Array(1103515245L, 1299709L, 104729L, 97L)
  private val CmsB = Array(12345L, 7919L, 271L, 31L)

  /** Bucket of value `x` in hash row `j` — pure long arithmetic (both
    * factors < p < 2^31, so a_j * (x mod p) cannot overflow a long),
    * restatable verbatim in any SQL engine for cross-checking. */
  def cmsPos(x: Long, j: Int): Int = {
    val xm = ((x % CmsP) + CmsP) % CmsP
    (((CmsA(j) * xm + CmsB(j)) % CmsP) % CmsW).toInt
  }

  /** Mergeable Count-Min FREQUENCY sketch over longs — the fourth seat in
    * the 100 TB sketch family (distinct = [[HllAgg]]/[[KmvAgg]], quantile
    * = [[KllAgg]], frequency = this; Cormode-Muthukrishnan 2005). The
    * accumulator is the d×w counter matrix flattened row-major; update
    * increments one counter per hash row, merge is ELEMENTWISE SUM —
    * counters are plain sums, so the sketch is commutative, associative,
    * and ORDER-INDEPENDENT (bit-identical under any aggregation tree,
    * unlike SpaceSaving/Misra-Gries heavy-hitter summaries whose evictions
    * depend on arrival order — that is why this seat is CMS). Point
    * estimate = min over the d counters ([[cmsEst]]); always an
    * overestimate, error ≤ 2n/w with probability 1 - e^-d. At 100 TB:
    * each executor sketches its partitions locally, 4 KiB partials merge
    * through the partial-agg tree, and frequency questions ("how often
    * does this token/URL/domain appear?") answer without a re-scan. */
  class CmsAgg extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](CmsW * CmsD)
    def reduce(buf: Array[Long], x: java.lang.Long): Array[Long] = {
      if (x != null) {
        var j = 0
        while (j < CmsD) { buf(j * CmsW + cmsPos(x, j)) += 1L; j += 1 }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** String-keyed CMS: tokens/URLs/domains hash through the same md5
    * 60-bit prefix as the KMV/KLL sketches ([[hash60]] — bit-replicable
    * in SQL as the hex-nibble positional sum the qs10/qs11 oracles use),
    * then land in the long family's buckets. One sketch answers "how
    * often does this token appear in the corpus?" at 100 TB without the
    * full token groupBy. */
  class CmsStrAgg extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](CmsW * CmsD)
    def reduce(buf: Array[Long], s: String): Array[Long] = {
      if (s != null) {
        val x = hash60(s)
        var j = 0
        while (j < CmsD) { buf(j * CmsW + cmsPos(x, j)) += 1L; j += 1 }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** [[cmsEst]] for a string key (the [[CmsStrAgg]] hash path). */
  def cmsEstStr(sk: Array[Long], key: String): Long =
    cmsEst(sk, hash60(key))

  /** CMS point estimate: min over the d hash rows' counters for `key`.
    * Operates on an already-aggregated 4 KiB sketch value (the same
    * finisher posture as the KMV set algebra above). */
  def cmsEst(sk: Array[Long], key: Long): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < CmsD) {
      val c = sk(j * CmsW + cmsPos(key, j))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Bloom-filter geometry: 2^20 bits (16384 longs = 128 KiB) × the
    * [[CmsD]] Carter-Wegman hash rows over the md5 60-bit prefix — every
    * constant restatable in SQL (the qs14/qt9 oracle idiom), so
    * MEMBERSHIP answers are bit-replicable cross-engine. At ~50k keys
    * the false-positive rate is ~1e-4; size m to the expected key count
    * at real scale (ENGINE.md). */
  val BloomBits = 1 << 20
  private val BloomWords = BloomBits / 64

  /** Bit position of key-hash `x` in hash row `j`. */
  def bloomPos(x: Long, j: Int): Int = {
    val xm = ((x % CmsP) + CmsP) % CmsP
    (((CmsA(j) * xm + CmsB(j)) % CmsP) % BloomBits).toInt
  }

  /** Mergeable BLOOM FILTER over string keys — the fifth sketch seat
    * (membership; distinct = [[HllAgg]]/[[KmvAgg]], quantile =
    * [[KllAgg]], frequency = [[CmsAgg]]). The accumulator is the bit
    * array as packed longs; merge is elementwise OR — commutative,
    * associative, idempotent, so the filter is bit-identical under any
    * aggregation tree. The 100 TB shape: sketch the HISTORICAL corpus's
    * fingerprints once (a 128 KiB value that merges through the
    * partial-agg tree), broadcast it, and gate each INCOMING document
    * map-side — "definitely new" documents skip the expensive exact
    * anti-join entirely; only the ~fpp false-positive slice needs the
    * confirm lookup. */
  class BloomAgg extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](BloomWords)
    def reduce(buf: Array[Long], s: String): Array[Long] = {
      if (s != null) {
        val x = hash60(s)
        var j = 0
        while (j < CmsD) {
          val p = bloomPos(x, j)
          buf(p >> 6) |= 1L << (p & 63)
          j += 1
        }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Fresh all-zero filter (the keyed-state form of [[BloomAgg.zero]]). */
  def bloomEmpty(): Array[Long] = new Array[Long](BloomWords)

  /** In-place single-key insert — the keyed-state form of
    * [[BloomAgg.reduce]] (StreamOps.bloomGate keeps one filter per
    * shard in streaming state and inserts arriving fingerprints). */
  def bloomAdd(buf: Array[Long], s: String): Unit = {
    val x = hash60(s)
    var j = 0
    while (j < CmsD) {
      val p = bloomPos(x, j)
      buf(p >> 6) |= 1L << (p & 63)
      j += 1
    }
  }

  /** Deterministic shard of a key (same hash family as the filter): a
    * fingerprint always routes to the same shard, so its shard's filter
    * has seen every prior copy of it — no false negatives across
    * shards, and strictly FEWER false positives than one shared filter
    * (each filter holds only its shard's keys). */
  def bloomShard(s: String, shards: Int): Int =
    math.floorMod(hash60(s), shards.toLong).toInt

  /** Bloom membership over an already-aggregated filter value: true iff
    * all [[CmsD]] bit positions of the key are set (no false negatives;
    * false positives at the geometry's fpp). */
  def bloomContains(sk: Array[Long], s: String): Boolean = {
    val x = hash60(s)
    var j = 0
    while (j < CmsD) {
      val p = bloomPos(x, j)
      if ((sk(p >> 6) & (1L << (p & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** Deterministic per-group RESERVOIR as a partial aggregate — the
    * 100 TB path for qp12's bottom-k-by-hash sample: each partition
    * keeps its k smallest (md5(salt||id), id) pairs, partials merge by
    * sorted union-and-trim through ANY aggregation tree (commutative,
    * associative, idempotent — the KMV/KLL construction carrying the id
    * as payload), so the corpus never sorts and the shuffle moves only
    * k-row partials per group. finish returns the ids in hash-rank
    * order; ordering matches the window formulation exactly (full
    * 32-hex md5, ties by id), which ReservoirSpec pins against qp12. */
  class ReservoirAgg(k: Int = 8, salt: String = "rsv|")
      extends Aggregator[String, Array[(String, String)], Array[String]] {
    private def hex(id: String): String = {
      // per-thread digest + the shared allocation-free hex encoder —
      // this sits in the per-row reduce path (review r16)
      val md = Udafs.md5Local.get()
      md.reset()
      MinHashBands.toHex(md.digest((salt + id).getBytes("UTF-8")))
    }
    def zero: Array[(String, String)] = Array.empty
    def reduce(buf: Array[(String, String)],
        id: String): Array[(String, String)] = {
      if (id == null) return buf
      merge(buf, Array((hex(id), id)))
    }
    def merge(x: Array[(String, String)],
        y: Array[(String, String)]): Array[(String, String)] = {
      if (y.isEmpty) return x
      if (x.isEmpty) return y
      val out = new scala.collection.mutable.ArrayBuffer[(String, String)](k)
      var (i, j) = (0, 0)
      while (out.length < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length &&
          implicitly[Ordering[(String, String)]].lteq(x(i), y(j)))
        val nxt = if (takeX) { i += 1; x(i - 1) } else { j += 1; y(j - 1) }
        // idempotent union: drop exact duplicates (same id seen twice)
        if (out.isEmpty || out.last != nxt) out += nxt
      }
      out.toArray
    }
    def finish(buf: Array[(String, String)]): Array[String] = buf.map(_._2)
    def bufferEncoder: Encoder[Array[(String, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Register as SQL-callable UDAFs (TableEnvironment.registerFunction
    * equivalent). Idempotent per session — repeated calls (one per query
    * in Bench/Verify) would otherwise log a `replaced a previously
    * registered function` warning each time. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_multiset")))
      return
    spark.udf.register("graft_multiset", udaf(new MultisetAgg, Encoders.INT))
    spark.udf.register("graft_weighted_avg",
      udaf(new WeightedAvgAgg, Encoders.product[WeightedIn]))
    spark.udf.register("graft_hll", udaf(new HllAgg, Encoders.STRING))
    spark.udf.register("graft_kmv", udaf(new KmvAgg, Encoders.STRING))
    spark.udf.register("graft_kmv_sketch",
      udaf(new KmvSketchAgg, Encoders.STRING))
    spark.udf.register("graft_kmv_intersect",
      (a: Seq[Long], b: Seq[Long]) =>
        kmvIntersect(a.toArray, b.toArray))
    spark.udf.register("graft_kmv_diff",
      (a: Seq[Long], b: Seq[Long]) => kmvDiff(a.toArray, b.toArray))
    spark.udf.register("graft_kmv_union",
      (a: Seq[Long], b: Seq[Long]) => kmvUnion(a.toArray, b.toArray))
    spark.udf.register("graft_kmv_jaccard",
      (a: Seq[Long], b: Seq[Long]) => kmvJaccard(a.toArray, b.toArray))
    spark.udf.register("graft_kll",
      udaf(new KllAgg, Encoders.product[KllIn]))
    spark.udf.register("graft_cms",
      udaf(new CmsAgg, Encoders.LONG))
    spark.udf.register("graft_cms_est",
      (sk: Seq[Long], key: Long) => cmsEst(sk.toArray, key))
    spark.udf.register("graft_cms_str",
      udaf(new CmsStrAgg, Encoders.STRING))
    spark.udf.register("graft_cms_est_str",
      (sk: Seq[Long], key: String) =>
        if (key == null) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(cmsEstStr(sk.toArray, key)))
    spark.udf.register("graft_reservoir",
      udaf(new ReservoirAgg, Encoders.STRING))
    spark.udf.register("graft_bloom",
      udaf(new BloomAgg, Encoders.STRING))
    // null guard (adversarial-fixture check): a NULL key previously
    // reached hash60(null) and threw NPE mid-query; SQL semantics make
    // membership-of-NULL unknown → NULL, which is also what the qp15
    // oracle's three-valued BOOL_AND(p IN ...) yields for it
    spark.udf.register("graft_bloom_contains",
      (sk: Seq[Long], key: String) =>
        if (key == null) null.asInstanceOf[java.lang.Boolean]
        else java.lang.Boolean.valueOf(bloomContains(sk.toArray, key)))
  }
}
