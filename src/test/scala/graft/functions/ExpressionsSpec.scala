package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("graft_dot matches the lambda fold bit-for-bit (codegen + interpreted)") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val got = df.select(
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
        .as("lambda"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, l) => assert(n == l) }
    assert(got.head._1 == 32.0)
  }

  test("graft_dot null parity: length mismatch and null elements yield NULL, not truncation") {
    // review r16: the expression silently truncated to the shorter
    // array where the documented-equivalent lambda fold null-propagates
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(expr("graft_dot(a, b)")).collect()
    assert(got(0).isNullAt(0), "length mismatch must be NULL")
    assert(got(1).getDouble(0) == 5.0)
    val withNull = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))," +
        " array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))")
    assert(withNull.collect().head.isNullAt(0), "null element must be NULL")
  }

  test("graft_dot_int matches the zip_with fold and null-propagates") {
    // qe12's quantized ranking dot — exact integer, same null parity as
    // graft_dot (NULL on mismatch/null element, never truncation)
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1L, -2L, 3L), Array(4L, 5L, -6L)),
      (Array(127L, 127L), Array(127L, 127L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val got = df.select(
      expr("graft_dot_int(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, " +
        "(acc, v) -> acc + v)").as("viaLambda"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, l) => assert(n == l) }
    assert(got(0)._1 == 4L - 10L - 18L)
    assert(got(1)._1 == 2L * 127L * 127L)
    val nulls = spark.sql(
      "SELECT graft_dot_int(array(1L, 2L), array(1L, 2L, 3L))," +
        " graft_dot_int(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L))")
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("graft_signpack equals the SQL lambda formulation (codegen + interpreted)") {
    // qe15's 1-bit quantization step — the interpreted
    // aggregate(transform(sequence...)) chain it replaced is the pinned
    // reference semantics (the graft_dot/graft_bytesum lesson class)
    GraftFunctions.register(spark)
    // get(a, i) — not a[i], which ANSI-throws past the end — so the
    // lambda states the missing-element-is-a-0-bit semantics on the
    // short-array rows too (qe15's corpus is always 64-dim, where the
    // two element accessors agree)
    def lambda(lo: Int, hi: Int) =
      s"""aggregate(transform(sequence($lo, $hi), i ->
         |  IF(get(a, i) > 0, shiftleft(1L, i - $lo), 0L)),
         |  0L, (acc, x) -> acc | x)""".stripMargin
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Array.fill(64)(rnd.nextFloat() - 0.5f)) ++ Seq(
      Array(1.0f, -1.0f, 0.0f), // shorter than the range: missing bits 0
      Array.empty[Float],
      Array.fill(64)(0.0f),
      Array(Float.NaN, 1.0f)) // NaN sets its bit: SQL total order puts
    // NaN above every number, so the lambda's `> 0` is TRUE there
    val got = rows.toDF("a").select(
      expr("graft_signpack(a, 0, 31)").as("n1"), expr(lambda(0, 31)).as("l1"),
      expr("graft_signpack(a, 32, 63)").as("n2"), expr(lambda(32, 63)).as("l2"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == rows.length)
    got.foreach { case (n1, l1, n2, l2) => assert(n1 == l1 && n2 == l2) }
    // null ELEMENT contributes a 0 bit in both formulations; a null ARRAY
    // is the documented divergence (NULL natively, 0L from the lambda)
    val r = spark.sql(
      "SELECT graft_signpack(array(CAST(NULL AS FLOAT), CAST(2.0 AS FLOAT)), 0, 31)," +
        " graft_signpack(CAST(NULL AS ARRAY<FLOAT>), 0, 31)").collect().head
    assert(r.getLong(0) == 2L)
    assert(r.isNullAt(1))
  }

  test("constant-int builder args: named errors for non-constant, fractional, out-of-range") {
    // ADVICE r17: the Number match silently truncated 1.5 to lo=1 via
    // intValue() and wrapped a constant long outside Int range. Only
    // integral in-range constants qualify; everything else gets the
    // named builder-time IllegalArgumentException, never a silent
    // truncation.
    GraftFunctions.register(spark)
    val df = Seq(Array(1.0f, -1.0f)).toDF("a")
    for (bad <- Seq(
        "graft_signpack(a, 1.5, 3)", // fractional: was lo=1 silently
        "graft_signpack(a, 0, 4294967296)", // long wraps to 0 via intValue
        "graft_signpack(a, 0, CAST('3' AS DOUBLE))", // foldable non-integral
        "graft_winnow(a, 2.5)")) {
      val e = intercept[Exception] { df.select(expr(bad)).collect() }
      // Spark may wrap the builder error; the named message must survive
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("must be a constant integer") ||
        msg.contains("out of Int range"), s"$bad -> $msg")
    }
    // the shapes eval() always handled still build: arithmetic constants,
    // negation, and an exact-valued long
    val ok = df.select(
      expr("graft_signpack(a, 2 - 2, CAST(31 AS BIGINT))").as("p"),
      expr("graft_winnow(array('x y z'), 2 + 2)").as("w")).collect()
    assert(ok.nonEmpty)
  }

  test("graft_winnow equals the stacked SQL lambda formulation") {
    // qp34's fingerprint selection — the MOSS window-minimum scheme.
    // Reference semantics: hash each shingle to its 16-hex md5 prefix,
    // keep each w-window's min, distinct; < w shingles keep one print
    // (min of all), zero keep none.
    GraftFunctions.register(spark)
    val w = 4
    val lambda =
      s"""CASE WHEN size(hs) = 0 THEN array()
         |WHEN size(hs) < $w THEN array(array_min(hs))
         |ELSE array_distinct(transform(sequence(1, size(hs) - ${w - 1}),
         |  j -> array_min(slice(hs, j, $w)))) END""".stripMargin
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(40)(
      Array.fill(3 + rnd.nextInt(40))(s"tok${rnd.nextInt(30)} x y")) ++ Seq(
      Array.empty[String], // no shingles -> no prints
      Array("a b c"), // short input -> one print
      Array("a b c", "b c d", "c d e"), // still < w
      Array("a b c", "b c d", "c d e", "d e f")) // exactly one window
    val got = rows.toDF("sh")
      .withColumn("hs", expr("transform(sh, x -> substr(md5(x), 1, 16))"))
      .select(expr("graft_winnow(sh, 4)").as("native"),
        expr(lambda).as("viaLambda"))
      .as[(Seq[String], Seq[String])].collect()
    assert(got.length == rows.length)
    got.foreach { case (n, l) => assert(n == l) }
    assert(got.takeRight(4).map(_._1.size).toSeq == Seq(0, 1, 1, 1))
    // null ELEMENTS: the documented divergence — the expression
    // compacts nulls out BEFORE windowing (a null shingle is "no
    // shingle", the MinHashBands contract), the lambda keeps the
    // null's slot; and an all-null array keeps NO print (the lambda's
    // short-input branch would emit a NULL one). Pinned so the
    // contract can't silently drift (review r17; withShingles never
    // produces null elements, so the oracled surface is unaffected).
    val nulls = spark.sql(
      "SELECT graft_winnow(array('a b c', CAST(NULL AS STRING), 'b c d'," +
        " 'c d e', 'd e f'), 4) AS compacted," +
        " graft_winnow(array(CAST(NULL AS STRING), CAST(NULL AS STRING)), 4)" +
        " AS allNull").collect().head
    // 4 non-null shingles -> exactly one window over the compacted run
    assert(nulls.getSeq[String](0).size == 1)
    assert(nulls.getSeq[String](1).isEmpty)
  }

  test("simhash/minhash skip null array elements instead of crashing") {
    // review r16: a null element NPE'd the task; parity semantics skip
    // it (array_min / the vote sum ignore the NULL md5(NULL) yields)
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_simhash64(array('a', CAST(NULL AS STRING), 'b'))," +
        " graft_simhash64(array('a', 'b'))," +
        " graft_minhash_bands(array('x y z', CAST(NULL AS STRING)))," +
        " graft_minhash_bands(array('x y z'))," +
        " graft_minhash_bands(array(CAST(NULL AS STRING)))").collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getSeq[String](2) == r.getSeq[String](3))
    assert(r.getSeq[String](4).forall(_.isEmpty)) // all-null = empty bands
  }

  test("graft_nfc: NFC composition, identity on ASCII, null pass-through (codegen + interpreted)") {
    GraftFunctions.register(spark)
    // decomposed e + U+0301 composes; composed input is a fixed point;
    // ASCII untouched; Hangul Jamo compose (the multi-char NFC case)
    val decomposed = "Cafee\u0301"
    val composed = "Cafe\u00e9"
    val jamo = "\u1100\u1161\u11a8" // G + A + K
    val syllable = "\uac01"
    val rows = Seq(decomposed, composed, "plain ascii text", jamo, null)
    val df = rows.toDF("s")
    val got = df.select(expr("graft_nfc(s)")).as[String].collect().toSeq
    assert(got === Seq(composed, composed, "plain ascii text",
      syllable, null))
    // direct interpreted path (eval) agrees
    val interp = rows.filter(_ != null).map { s =>
      graft.functions.NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(s))
        .eval(null).toString
    }
    assert(interp === Seq(composed, composed, "plain ascii text",
      syllable))
    // force the WHOLE-STAGE-CODEGEN path: a LocalRelation select folds
    // to interpreted projection at optimization time, so run the
    // function over the parquet-backed fixture (the graft_dot pattern)
    // with a decomposed prefix concatenated in
    val docs = graft.Engine.table(spark, sf, "documents")
    val viaCodegen = docs
      .select(expr(s"graft_nfc(concat('$decomposed ', substr(text, 1, 8)))")
        .as("n"), expr("substr(text, 1, 8)").as("t"))
      .as[(String, String)].collect()
    assert(viaCodegen.nonEmpty)
    viaCodegen.foreach { case (n, t) =>
      assert(n === java.text.Normalizer.normalize(decomposed + " " + t,
        java.text.Normalizer.Form.NFC))
      assert(n.startsWith(composed))
    }
  }

  test("graft_dot on the embeddings table equals the qe1 norm column") {
    GraftFunctions.register(spark)
    val e = graft.Engine.table(spark, sf, "embeddings")
    val both = e.select(
      expr("graft_dot(embedding, embedding)").as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
        .as("lambda"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, l) => assert(n == l) }
  }

  test("simhash64 expression equals the SQL lambda formulation") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spark engines process queries with catalyst",
      "one"
    ).toDF("text").withColumn("tk", split($"text", " "))
    val got = docs.select(
      expr("graft_simhash64(tk)").as("native"),
      expr(
        """aggregate(zip_with(
          |  aggregate(transform(tk, w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)),
          |    transform(sequence(0, 63), b -> 0L),
          |    (acc, h) -> zip_with(acc, sequence(0, 63),
          |      (c, b) -> c + IF((shiftright(h, CAST(b AS INT)) & 1L) = 1L, 1L, -1L))),
          |  sequence(0, 63),
          |  (c, b) -> IF(c > 0L, shiftleft(1L, CAST(b AS INT)), 0L)),
          |  0L, (a, x) -> a + x)""".stripMargin).as("lambda"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, l) => assert(n == l) }
  }

  test("tokenHash matches conv(substr(md5(w),1,15),16,10)") {
    val words = Seq("hello", "spark", "a", "zz9")
    val viaSql = words.toDF("w")
      .select(expr("CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)"))
      .as[Long].collect()
    words.zip(viaSql).foreach { case (w, expected) =>
      assert(SimHash64.tokenHash(w) == expected, w)
    }
  }

  test("minhash bands expression equals the SQL lambda formulation") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "a b c",
      "one two" // < 3 tokens → empty shingles → empty band strings
    ).toDF("text")
    val sh = graft.pipeline.DedupQueries.withShingles(docs)
    val viaSql = (0 until 4).map { j =>
      concat(
        expr(s"coalesce(array_min(transform(sh, x -> substr(md5(concat('s$j|', x)), 1, 16))), '')"),
        expr(s"coalesce(array_min(transform(sh, x -> substr(md5(concat('s$j|', x)), 17, 16))), '')"))
    }
    val rows = sh.select(
      expr("graft_minhash_bands(sh)").as("native"),
      array(viaSql: _*).as("lambda"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, l) => assert(n == l) }
  }

  test("SplitRows is a true Generator: plans as Generate, matches explode(split)") {
    GraftFunctions.register(spark)
    val df = Seq("a b c", "x y", "", "solo").toDF("text")
    val viaGen = df.select(expr("graft_split_rows(text, ' ')").as("token"))
    assert(viaGen.queryExecution.executedPlan.toString.contains("Generate"),
      "the UDTF must run in a Generate node, not a UDF projection")
    val got = viaGen.as[String].collect().sorted.toSeq
    val expected = df.select(explode(split($"text", " ")).as("t"))
      .as[String].collect().sorted.toSeq
    assert(got == expected)
    // NULL input produces no rows (Flink TableFunction: no collect call)
    val withNull = Seq(Some("a b"), None).toDF("text")
    assert(withNull.select(expr("graft_split_rows(text, ' ')"))
      .count() == 2)
  }
}
