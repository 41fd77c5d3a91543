package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot paths.
  *
  * [[FloatDotProduct]] replaces the `aggregate(zip_with(...))` lambda chain
  * used for embedding dot products: higher-order functions are interpreted
  * closure-per-element, while this expression whole-stage-codegens to a
  * tight primitive loop over the ArrayData (no boxing, no per-element
  * virtual calls). Summation is the same left-to-right double fold, so
  * results are bit-identical to the lambda formulation (and to the DuckDB
  * oracle's list_reduce).
  *
  * [[SimHash64]] computes the 64-bit SimHash of a token array (md5-derived
  * 60-bit token hashes, bitwise majority vote) in one pass — the reference
  * operation is a per-document fingerprint for near-dup detection. Eval is
  * JVM-side (md5 dominates; codegen would save nothing), matching the SQL
  * lambda formulation bit-for-bit.
  */
object GraftFunctions {

  /** Idempotently register the expressions as SQL functions on a session.
    * Skips sessions that already carry the functions so repeated calls
    * (one per query in Bench/Verify) don't spam the log with
    * `SimpleFunctionRegistry ... replaced` warnings. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"))) return
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => FloatDotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_bands",
      exprs => MinHashBands(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hyperplane_bands",
      exprs => HyperplaneBands(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_split_rows",
      exprs => SplitRows(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bytesum",
      exprs => ByteSum(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_signpack",
      exprs => SignPack(exprs(0),
        litInt(exprs, 1, "graft_signpack(arr, lo, hi)"),
        litInt(exprs, 2, "graft_signpack(arr, lo, hi)")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_winnow",
      exprs => WinnowPrints(exprs(0),
        litInt(exprs, 1, "graft_winnow(arr, w)")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot_int",
      exprs => LongDotProduct(exprs(0), exprs(1)), "scala_udf")
  }

  /** Extract a required constant-integer argument at builder time with
    * a named error — a bare eval() on a missing or non-constant
    * argument dies with IndexOutOfBounds/ClassCast instead of saying
    * what the function expects (review r17). Accepts any FOLDABLE
    * integer expression (a literal, `2 + 2`, a negated literal — the
    * shapes eval() always handled), not just a bare Literal (the first
    * fix's over-narrowing, review r17 pass 2). Only INTEGRAL evaluated
    * values qualify — the prior `Number` match silently truncated
    * `graft_signpack(a, 1.5, 3)` to lo=1 via intValue(), and wrapped a
    * constant long outside Int range, instead of erroring (ADVICE
    * r17); a fractional or out-of-Int-range constant now throws the
    * same named IllegalArgumentException. */
  private def litInt(exprs: Seq[Expression], i: Int, usage: String): Int = {
    val v = exprs.lift(i).flatMap { e =>
      try if (e.foldable) Option(e.eval()) else None
      catch { case _: Exception => None }
    }
    v match {
      case Some(n: java.lang.Byte) => n.intValue()
      case Some(n: java.lang.Short) => n.intValue()
      case Some(n: java.lang.Integer) => n.intValue()
      case Some(n: java.lang.Long) if n.longValue() == n.intValue() =>
        n.intValue()
      case Some(n: java.lang.Long) => throw new IllegalArgumentException(
        s"$usage: argument ${i + 1} is out of Int range ($n)")
      case _ => throw new IllegalArgumentException(
        s"$usage: argument ${i + 1} must be a constant integer")
    }
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_dot", a, b)
  }

  def simhash64(spark: SparkSession, tokens: Column): Column = {
    register(spark); call_function("graft_simhash64", tokens)
  }

  def nfc(spark: SparkSession, s: Column): Column = {
    register(spark); call_function("graft_nfc", s)
  }
}

/** Unicode NFC normalization as a codegen'd string expression — the
  * canonical text-cleanup step a training pipeline runs BEFORE
  * tokenizing/fingerprinting, so visually identical text (composed
  * `é` vs decomposed `e` + U+0301) dedups and counts identically.
  * Spark ships no normalizer builtin; `java.text.Normalizer`
  * implements the same Unicode NFC algorithm DuckDB's `nfc_normalize`
  * (utf8proc) does, which oracles the function bit-exactly (qt15) —
  * with the caveat that the two engines freeze DIFFERENT Unicode
  * table versions: codepoints whose composition behavior was
  * added/changed after the older table froze can normalize
  * differently across engines (immaterial for the BMP sequences the
  * oracle constructs; flagged for anyone pointing qt15 at arbitrary
  * corpus text). Codegen emits
  * one static call per row inside the whole-stage loop; already-NFC
  * ASCII passes through via the Normalizer's quick-check fast path. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got $other")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sum of UNSIGNED byte values of a binary column — the hot loop of
  * the multimodal frame-energy STUB (qm5/qm6/qm7, where a real decoder
  * would produce a luma histogram / RMS). Replaces the interpreted
  * `aggregate(transform(sequence(1, 64), j -> ascii(substring(...))))`
  * lambda chain, which re-evaluated a full-text substring per element
  * (64 interpreted closure calls per frame — measured 2.4s for the
  * frame scan at sf0.1 vs ~0.3s for this loop), with one codegen'd
  * pass over the frame's bytes. Operating on bytes also makes the
  * engine side slice the BINARY payload directly (ADVICE r15: the
  * char-sliced form diverged from byte-based recomputes on any
  * non-ASCII doc); the char-slicing DuckDB oracle stays equal on the
  * ASCII corpus the qm specs assert by name. */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bytesum expects binary, got $other")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += (bytes(i) & 0xffL); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $acc += ($c[$i] & 0xffL);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Pack the SIGNS of array<float> elements [lo..hi] (0-based, inclusive,
  * ≤64 wide) into a long — bit (i - lo) is set iff element i exists, is
  * non-null, and is > 0. The 1-bit (binary) quantization step of qe15's
  * RaBitQ-style retrieval audit. Replaces the interpreted
  * `aggregate(transform(sequence(lo, hi), i -> IF(a[i] > 0,
  * shiftleft(1L, i-lo), 0L)), 0L, (a, x) -> a | x)` chain — two
  * 32-element closure-per-element folds per row, the third measured
  * instance of the graft_dot/graft_bytesum lesson class — with one
  * codegen'd primitive loop. Missing (out-of-range) and NULL elements
  * contribute a 0 bit — the lambda's semantics with the `get(a, i)`
  * accessor (`a[i]` itself ANSI-throws past the end; qe15's corpus is
  * always 64-dim so the accessors agree there, and the expression
  * takes the tolerant reading); a NULL ARRAY yields NULL
  * (the lambda folds it to 0L — divergence documented and spec-pinned,
  * NULL is the honest answer for "the signs of no vector"). NaN packs
  * 1: both SQL engines' total order puts NaN above every number, so
  * the lambda's `> 0` is TRUE there — the eval/codegen below must
  * test `v > 0 || isNaN(v)`, not Java's NaN-false comparison. */
case class SignPack(child: Expression, lo: Int, hi: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if lo >= 0 && hi >= lo && hi - lo < 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_signpack range [$lo, $hi] must satisfy 0 <= lo <= hi < lo + 64")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_signpack expects array<float>, got $other")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var w = 0L
    var i = lo
    while (i <= hi && i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getFloat(i)
        if (v > 0.0f || java.lang.Float.isNaN(v)) w |= 1L << (i - lo)
      }
      i += 1
    }
    w
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      s"""
         |int $n = $c.numElements();
         |long $w = 0L;
         |for (int $i = $lo; $i <= $hi && $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    float ${w}_v = $c.getFloat($i);
         |    if (${w}_v > 0.0f || java.lang.Float.isNaN(${w}_v)) {
         |      $w |= 1L << ($i - $lo);
         |    }
         |  }
         |}
         |${ev.value} = $w;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  // NULL on length mismatch or a null element — the zip_with/aggregate
  // lambda parity semantics (zip_with pads the shorter side with nulls
  // and the additive fold null-propagates), not a silent truncation
  // that would turn ragged embeddings into plausible numbers (review
  // r16). Always nullable so codegen's isNull slot is assignable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n && !$bad; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |    else { $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over two array<bigint> columns — the
  * INT8-quantized twin of [[FloatDotProduct]] (qe12's recall audit
  * ranks candidates by the quantized dot; 127·127·dim stays far under
  * a long). Retires the last `aggregate(zip_with(...))` fold lambda in
  * any query path — the fourth and final instance of the
  * closure-per-element lesson class. Null parity matches
  * FloatDotProduct (and the lambda it replaces): NULL on length
  * mismatch or any null element, never a silent truncation. */
case class LongDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_int expects two array<bigint> args, got " +
        s"${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n && !$bad; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |    else { $acc += $a.getLong($i) * $b.getLong($i); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SimHash64(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<string>, got $other")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < tokens.numElements()) {
      // null elements cast no vote — the SQL-lambda parity semantics
      // (md5(NULL) is NULL and the vote sums skip NULLs); the raw
      // getUTF8String would NPE in tokenHash (review r16)
      if (!tokens.isNullAt(i)) {
        val tok = tokens.getUTF8String(i)
        val h = SimHash64.tokenHash(md, tok)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0L) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash LSH band values of a shingle array in one pass: for seeds
  * j = 0..3, hash every shingle with md5("s<j>|" + shingle); the two
  * 16-hex-char halves of the digest are two independent MinHash components
  * (min taken lexicographically = numerically for fixed-width lowercase
  * hex). Band b = minLow(b) || minHigh(b) — 4 bands × 2 rows, the classic
  * (b=4, r=2) LSH layout. Bit-identical to the SQL-lambda formulation
  * `min(substr(md5(concat('s<j>|', x)), 1|17, 16))` but one digest per
  * seed per shingle and no per-element interpreted closures or garbage.
  * Empty input → 4 empty strings (matching coalesce(min(...), '')).
  */
case class MinHashBands(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val NumSeeds = 4

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(NumSeeds)(j => s"s$j|".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val out = new Array[Any](NumSeeds)
    if (n == 0) {
      var b = 0
      while (b < NumSeeds) { out(b) = UTF8String.EMPTY_UTF8; b += 1 }
    } else {
      val md = java.security.MessageDigest.getInstance("MD5")
      // running minima as 16-char hex strings, low half and high half
      val minLow = new Array[String](NumSeeds)
      val minHigh = new Array[String](NumSeeds)
      var i = 0
      while (i < n) {
        // null shingles contribute no hash — the SQL-lambda parity
        // semantics (array_min skips the NULL md5(NULL) produces);
        // the raw getUTF8String would NPE (review r16)
        if (!shingles.isNullAt(i)) {
          val sh = shingles.getUTF8String(i).getBytes
          var j = 0
          while (j < NumSeeds) {
            md.reset()
            md.update(seedPrefixes(j))
            md.update(sh)
            val hex = MinHashBands.toHex(md.digest())
            val low = hex.substring(0, 16)
            val high = hex.substring(16, 32)
            if (minLow(j) == null || low < minLow(j)) minLow(j) = low
            if (minHigh(j) == null || high < minHigh(j)) minHigh(j) = high
            j += 1
          }
        }
        i += 1
      }
      var b = 0
      while (b < NumSeeds) {
        // all-null input degenerates like the empty array: the lambda's
        // coalesce(array_min(...), '') yields the '' band
        out(b) =
          if (minLow(b) == null) UTF8String.EMPTY_UTF8
          else UTF8String.fromString(minLow(b) + minHigh(b))
        b += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken, the MOSS
  * local-minimum scheme) in one native pass: hash every shingle to its
  * 16-hex md5 prefix, slide a window of `w` consecutive hashes, keep
  * each window's MINIMUM, return the DISTINCT minima in first-occurrence
  * order. Replaces qp34's two stacked interpreted lambda chains
  * (`transform(sh, md5...)` then `transform(sequence...,
  * array_min(slice(...)))` — closure-per-element AND a fresh w-element
  * array per window; the graft_dot/bytesum/signpack lesson class, which
  * this expression declines to instance a fourth time). Eval-only with
  * CodegenFallback — md5 dominates, the MinHashBands rationale.
  * Degenerations match the SQL/oracle formulation on NULL-FREE
  * shingle arrays (all the withShingles surface produces — its
  * transform concatenates split() tokens, which are never null): an
  * empty array keeps NO fingerprint (a shingle-less doc cannot weld
  * into an artifact cluster — the qp8 empty-band lesson); fewer than
  * `w` shingles keep exactly one (the min of all, the algorithm's
  * short-input form). Null shingle ELEMENTS are a documented
  * divergence from the lambda, spec-pinned: the expression COMPACTS
  * them out before windowing (a null shingle is "no shingle" — the
  * MinHashBands contract), so window boundaries are drawn over the
  * real shingles, whereas the lambda keeps the null's slot (array_min
  * skips it inside each window) and its all-null short-input case
  * emits a NULL print the declared containsNull=false output could
  * not carry. Fixed-width lowercase hex keeps lexicographic MIN ==
  * numeric MIN. */
case class WinnowPrints(child: Expression, w: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 2 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow window must be >= 2, got $w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = Array.newBuilder[String]
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        md.reset()
        md.update(shingles.getUTF8String(i).getBytes)
        hs += MinHashBands.toHex(md.digest()).substring(0, 16)
      }
      i += 1
    }
    val h = hs.result()
    val out = new java.util.LinkedHashSet[String]()
    if (h.length > 0 && h.length < w) {
      var m = h(0); var j = 1
      while (j < h.length) { if (h(j) < m) m = h(j); j += 1 }
      out.add(m)
    } else if (h.length >= w) {
      var s = 0
      while (s <= h.length - w) {
        var m = h(s); var j = s + 1
        while (j < s + w) { if (h(j) < m) m = h(j); j += 1 }
        out.add(m)
        s += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst table function (UDTF): split a string into one row per
  * token — the reference's canonical `TableFunction` example (`Split` in
  * the flink-table UDTF docs; TableFunction.java:41 collect()-per-row).
  * A true `Generator` expression, so the planner runs it in a `Generate`
  * node exactly like explode — per-partition, no UDF-wrapping, usable
  * from SQL (`LATERAL VIEW graft_split_rows(text, ' ')`) and the column
  * API. NULL input or delimiter yields no rows (Flink: no collect). */
case class SplitRows(child: Expression, delim: Expression)
  extends org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(child, delim)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && delim.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_split_rows expects (string, string), got " +
        s"${child.dataType} / ${delim.dataType}")

  override def elementSchema: StructType =
    StructType(StructField("token", StringType, nullable = false) :: Nil)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow):
      IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    val d = delim.eval(input).asInstanceOf[UTF8String]
    if (s == null || d == null) Nil
    else s.split(d, -1).toSeq
      .map(t => org.apache.spark.sql.catalyst.InternalRow(t))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), delim = newChildren(1))
}

/** Random-hyperplane LSH band keys of a float embedding in one pass:
  * 8 bands × 8 sign bits against 64 fixed seeded Gaussian hyperplanes →
  * `array<bigint>` of 8 per-band keys. Two vectors are near-dup CANDIDATES
  * if any band key collides; exact cosine verifies. Per-plane collision
  * probability for angle θ is 1 − θ/π, so candidate recall is
  * 1 − (1 − p^8)^8: ≈0.94 at cosine 0.9, ≈0.99 at 0.95, ≈1 at 0.99 —
  * tuned for the near-duplicate regime, while random (near-orthogonal)
  * pairs collide on a band with probability ≈2^-8, keeping expected bucket
  * sizes ~n/256 per band. Codegen'd to a static primitive loop (64 dots of
  * dim-64 per row would be ruinous as interpreted lambda closures). */
case class HyperplaneBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bands expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBands.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {
  val NumBands = 8
  val BitsPerBand = 8
  val Dim = 64

  /** Fixed-seed Gaussian planes: deterministic across sessions/executors
    * (same requirement as the MinHash seeds — candidates must not depend
    * on where a row is evaluated). */
  val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(20260812L)
    Array.fill(NumBands * BitsPerBand)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  def compute(vec: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val dim = vec.numElements()
    val out = new Array[Any](NumBands)
    var b = 0
    while (b < NumBands) {
      var key = 0L
      var j = 0
      while (j < BitsPerBand) {
        val p = planes(b * BitsPerBand + j)
        val n = math.min(dim, p.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += vec.getFloat(i).toDouble * p(i); i += 1 }
        if (acc > 0.0) key |= (1L << j)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object MinHashBands {
  private val Hex = "0123456789abcdef".toCharArray
  private[functions] def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = Hex((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = Hex(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }
}

object SimHash64 {
  private val HexDigits = "0123456789abcdef"

  /** First 15 hex chars of md5(token) as a 60-bit long — identical to the
    * SQL `CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)`. */
  private[functions] def tokenHash(md: java.security.MessageDigest,
      tok: UTF8String): Long = {
    md.reset()
    val digest = md.digest(tok.getBytes)
    // 15 hex chars = 7.5 bytes: bytes 0..6 fully + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (digest(i) & 0xFFL)
      i += 1
    }
    (h << 4) | ((digest(7) & 0xF0L) >> 4)
  }

  /** For tests: hash from a plain string. */
  def tokenHash(s: String): Long =
    tokenHash(java.security.MessageDigest.getInstance("MD5"),
      UTF8String.fromString(s))
}
