package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives (the qp11/qp12 machinery as a
  * reusable surface). Membership is a pure function of the row's id —
  * no RNG state, no seed plumbing — so samples reproduce across runs,
  * engines, and cluster sizes, and a new shard samples itself without
  * coordination. All helpers are plain codegen'd column expressions:
  * STATELESS, so they apply unchanged to batch DataFrames and streaming
  * sources (proven by StreamingPipelineSpec).
  */
object SamplingOps {

  /** 4-hex-digit md5 prefix of `salt || id` — uniform over 65536 values;
    * compare lexicographically against a threshold ('199a' ≈ 10%). */
  def hashBucket(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4)

  /** Per-stratum keep filter: rows pass when their hash bucket falls
    * under the stratum's threshold (4 lowercase hex digits; fraction ≈
    * threshold/65536). Unlisted strata use `default`. */
  def stratifiedKeep(id: Column, stratum: Column,
      thresholds: Map[String, String], default: String,
      salt: String = "strat|"): Column = {
    val th = thresholds.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    hashBucket(id, salt) < th
  }

  /** Uniform keep filter at `permil`/1000 — the unstratified special
    * case (hex threshold precomputed from the rate). permil = 1000
    * short-circuits to keep-everything: its threshold value 65536
    * renders as the FIVE-char string "10000", which compares BELOW
    * almost every 4-char bucket lexicographically and would silently
    * keep only ~6% (review r16). */
  def uniformKeep(id: Column, permil: Int, salt: String = "samp|"): Column = {
    require(permil >= 0 && permil <= 1000, s"permil out of range: $permil")
    if (permil == 1000) lit(true)
    else {
      val th = f"${(permil * 65536) / 1000}%04x"
      hashBucket(id, salt) < lit(th)
    }
  }

  /** Keep filter targeting ~`target` rows out of `n` on an 8-hex
    * (32-bit) hash space — the CONSTANT-SIZE sampling shape (a rate
    * like [[uniformKeep]]'s, floored at 1‰, would grow the sample as
    * n/1000 forever; ADVICE r17). `n <= target` keeps everything.
    * Expected keep = n·th/2^32 ≈ target; past n ≈ target·2^32 the
    * max(…,1) floor keeps ~n/2^32 rows (graceful over-granularity,
    * never zero — the qp30 lesson). Same md5 membership contract as
    * the rest of the module: a pure function of (salt, id). */
  def targetKeep(id: Column, n: Long, target: Long,
      salt: String = "samp|"): Column =
    if (n <= target) lit(true)
    else
      substring(md5(concat(lit(salt), id.cast("string"))), 1, 8) <
        lit(targetThreshold(n, target))

  /** The 8-hex threshold [[targetKeep]] compares against — exposed so
    * the floor regimes are directly assertable (expected keep =
    * n·th/2^32 ≈ target; max(…,1) keeps ~n/2^32 past n ≈ target·2^32
    * instead of zero — the qp30 lesson). */
  private[pipeline] def targetThreshold(n: Long, target: Long): String =
    f"${math.max(1L, math.min(0xffffffffL,
      (target.toDouble * 4294967296.0 / n).toLong))}%08x"
}
