package graft.functions

import graft.SparkSuite

/** Golden expression cases ported 1:1 from the reference's expression test
  * layer (flink-table expressions/ScalarFunctionsTest.scala, over the test
  * row of utils/ScalarTypesTestBase.scala:30-68): the reference's SQL
  * expression text (modulo dialect) evaluated over the same row must
  * produce the reference's exact expected string. Field names f0.. mirror
  * the reference row positions.
  */
class ReferenceGoldenSpec extends SparkSuite {

  private lazy val row = {
    import spark.implicits._
    Seq((
      "This is a test String.", // f0
      true, // f1
      42.toByte, // f2
      43.toShort, // f3
      44L, // f4
      4.5f, // f5
      4.6d, // f6
      3, // f7
      " This is a test String. ", // f8
      "%This is a test String.", // f23
      null.asInstanceOf[String] // f33 (null string)
    )).toDF("f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7", "f8", "f23", "f33")
      .createOrReplaceTempView("ref_row")
  }

  private def eval(expr: String): String = {
    row
    val v = spark.sql(s"SELECT $expr FROM ref_row").head().get(0)
    if (v == null) "null" else v.toString
  }

  // (sql expression, reference expected string, reference test)
  private val cases: Seq[(String, String, String)] = Seq(
    ("OVERLAY('xxxxxtest' PLACING 'xxxx' FROM 6)", "xxxxxxxxx", "testOverlay"),
    ("OVERLAY('xxxxxtest' PLACING 'xxxx' FROM 6 FOR 2)", "xxxxxxxxxst", "testOverlay"),
    ("POSITION('test' IN 'xxxtest')", "4", "testPosition"),
    ("POSITION('testx' IN 'xxxtest')", "0", "testPosition"),
    ("SUBSTRING(f0, 2)", "his is a test String.", "testSubstring"),
    ("SUBSTRING(f0, 2, 5)", "his i", "testSubstring"),
    ("SUBSTRING(f0, 1, f7)", "Thi", "testSubstring"),
    ("SUBSTRING(f0 FROM 2 FOR 1)", "h", "testSubstring"),
    ("SUBSTRING(f0 FROM 2)", "his is a test String.", "testSubstring"),
    ("TRIM(f8)", "This is a test String.", "testTrim"),
    ("TRIM(TRAILING FROM f8)", " This is a test String.", "testTrim"),
    ("TRIM(BOTH '.' FROM f0)", "This is a test String", "testTrim"),
    ("CHAR_LENGTH(f0)", "22", "testCharLength"),
    ("CHARACTER_LENGTH(f0)", "22", "testCharLength"),
    ("UPPER(f0)", "THIS IS A TEST STRING.", "testUpperCase"),
    ("LOWER(f0)", "this is a test string.", "testLowerCase"),
    ("INITCAP(f0)", "This Is A Test String.", "testInitCap"),
    ("f0||f0", "This is a test String.This is a test String.", "testConcat"),
    ("f0 LIKE 'Th_s%'", "true", "testLike"),
    ("f0 LIKE '%is a%'", "true", "testLike"),
    ("f0 NOT LIKE 'Th_s%'", "false", "testNotLike"),
    ("f23 LIKE '&%Th_s%' ESCAPE '&'", "true", "testLikeWithEscape"),
    ("f23 LIKE '&%%is a%' ESCAPE '&'", "true", "testLikeWithEscape"),
    ("f0 LIKE 'Th_s%' ESCAPE '&'", "true", "testLikeWithEscape"),
    ("f23 NOT LIKE '&%Th_s%' ESCAPE '&'", "false", "testNotLikeWithEscape"),
    ("CONCAT('xx', f33)", "null", "testMultiConcat"),
    ("CONCAT('AA','BB','CC','---')", "AABBCC---", "testMultiConcat"),
    ("CONCAT('x~x','b~b','c~~~~c','---')", "x~xb~bc~~~~c---", "testMultiConcat"),
    ("CONCAT_WS(f33, 'AA')", "null", "testConcatWs"),
    ("concat_ws('~~~~','AA')", "AA", "testConcatWs"),
    ("concat_ws('~','AA','BB')", "AA~BB", "testConcatWs"),
    ("LPAD('hi',4,'??')", "??hi", "testLPad"),
    ("LPAD('hi',1,'??')", "h", "testLPad"),
    ("LPAD('',1,'??')", "?", "testLPad"),
    ("LPAD('',30,'??')", "??????????????????????????????", "testLPad"),
    ("LPAD('ab',1,'??')", "a", "testLPad"),
    ("LPAD('äääääääää',2,'??')", "ää", "testLPad"),
    ("LPAD('äääääääää',10,'??')", "?äääääääää", "testLPad"),
    ("LPAD('äää',13,'12345')", "1234512345äää", "testLPad"),
    ("LPAD(f33,1,'??')", "null", "testLPad"),
    ("RPAD('hi',4,'??')", "hi??", "testRPad"),
    ("RPAD('hi',1,'??')", "h", "testRPad"),
    ("RPAD('',1,'??')", "?", "testRPad"),
    ("RPAD('1',30,'??')", "1?????????????????????????????", "testRPad"),
    ("RPAD('üö',1,'??')", "ü", "testRPad"),
    ("MOD(f4, f7)", "2", "testMod"),
    ("MOD(f4, 3)", "2", "testMod"),
    ("MOD(44, 3)", "2", "testMod"))

  cases.foreach { case (expr, expected, ref) =>
    test(s"$ref: $expr") {
      assert(eval(expr) == expected)
    }
  }

  // SIMILAR TO has no Spark SQL syntax — the Compat translation covers it
  // (ScalarFunctionsTest.testSimilar / testNotSimilar).
  test("testSimilar via Compat.similarTo") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("This is a test String.").toDF("f0")
    assert(df.where(Compat.similarTo(col("f0"), "_*")).count() == 1)
    assert(df.where(Compat.similarTo(col("f0"),
      "This (is)? a (test)+ Strin_*")).count() == 1)
    assert(df.where(!Compat.similarTo(col("f0"), "_*")).count() == 0)
  }

  // Documented dialect delta: negative pad lengths yield NULL in the
  // reference (LPAD('111',-2,'??') → null) but empty string in Spark.
  test("documented delta: negative pad length (reference: null)") {
    assert(eval("LPAD('111',-2,'??')") == "")
    assert(eval("RPAD('111',-2,'??')") == "")
  }

  // Temporal literals and interval arithmetic ported from
  // TemporalTypesTest.scala:33-120 (value semantics — interval *display*
  // formats differ by engine, so arithmetic results are compared instead).
  private val temporalCases: Seq[(String, String, String)] = Seq(
    ("CAST(DATE '1990-10-14' AS STRING)", "1990-10-14", "testTimePointLiterals"),
    ("CAST(CAST('1500-04-30' AS DATE) AS STRING)", "1500-04-30", "testTimePointLiterals"),
    ("CAST(TIMESTAMP '1990-10-14 23:00:00.123' AS STRING)",
      "1990-10-14 23:00:00.123", "testTimePointLiterals"),
    ("CAST(CAST('1500-04-30 12:00:00' AS TIMESTAMP) AS STRING)",
      "1500-04-30 12:00:00", "testTimePointLiterals"),
    ("CAST(DATE '1990-10-14' + INTERVAL 12 DAY AS STRING)",
      "1990-10-26", "testTimeIntervalLiterals"),
    ("CAST(DATE '1990-10-14' + INTERVAL 1 YEAR AS STRING)",
      "1991-10-14", "testTimeIntervalLiterals"),
    ("CAST(TIMESTAMP '1990-10-14 00:00:00' + INTERVAL 1 HOUR AS STRING)",
      "1990-10-14 01:00:00", "testTimeIntervalLiterals"),
    ("CAST(TIMESTAMP '1990-10-14 00:00:00' + INTERVAL 3 MINUTE AS STRING)",
      "1990-10-14 00:03:00", "testTimeIntervalLiterals"))

  temporalCases.foreach { case (expr, expected, ref) =>
    test(s"$ref: $expr") {
      assert(eval(expr) == expected)
    }
  }

  // Hash functions ported from ScalarFunctionsTest.testHashFunctions
  // (:1935): the reference's exact digests for 'test' across md5/sha1/sha2.
  private val hashCases: Seq[(String, String)] = Seq(
    ("MD5('test')", "098f6bcd4621d373cade4e832627b4f6"),
    ("SHA1('test')", "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3"),
    ("SHA2('test', 224)",
      "90a3ed9e32b2aaf4c61c410eb925426119e1a9dc53d4286ade99a809"),
    ("SHA2('test', 256)",
      "9f86d081884c7d659a2feaa0c55ad015a3bf4f1b2b0b822cd15d6c15b0f00a08"),
    ("SHA2('test', 384)",
      "768412320f7b0aa5812fce428dc4706b3cae50e02a64caa16a782249bfe8efc4b7ef1ccb126255d196047dfedf17a0a9"),
    ("SHA2('test', 512)",
      "ee26b0dd4af7e749aa1a8ee3c10ae9923f618980772e473f8819a5d4940e0db27ac185f8a0e1d5f84f88bc887fd67b143732c304cc5fa9ad8e6f57f50028a8ff"))

  hashCases.foreach { case (expr, expected) =>
    test(s"testHashFunctions: $expr") {
      assert(eval(expr) == expected)
    }
  }
}
