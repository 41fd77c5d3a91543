package graft.functions

import graft.SparkSuite

/** Math golden cases ported from ScalarFunctionsTest.scala:479-1230: the
  * reference asserts `math.exp(42).toString` etc. — both engines run on the
  * JVM, so values must be bit-identical (compared numerically; Calcite
  * floor/ceil preserve the input type while Spark widens to long, a
  * type-width delta with equal values).
  */
class MathGoldenSpec extends SparkSuite {

  private def evalD(expr: String): Double = {
    val v = spark.sql(
      s"SELECT CAST($expr AS DOUBLE) FROM VALUES (1) AS t(x)").head()
    v.getDouble(0)
  }

  private val cases: Seq[(String, Double, String)] = Seq(
    ("EXP(CAST(42 AS TINYINT))", math.exp(42), "testExp"),
    ("EXP(CAST(43 AS SMALLINT))", math.exp(43), "testExp"),
    ("EXP(CAST(44 AS BIGINT))", math.exp(44), "testExp"),
    ("EXP(CAST(4.6 AS DOUBLE))", math.exp(4.6), "testExp"),
    ("EXP(3)", math.exp(3), "testExp"),
    ("LOG10(CAST(42 AS TINYINT))", math.log10(42), "testLog10"),
    ("LOG10(CAST(4.6 AS DOUBLE))", math.log10(4.6), "testLog10"),
    ("SQRT(CAST(4.6 AS DOUBLE))", math.sqrt(4.6), "testSqrt"),
    ("SQRT(3)", math.sqrt(3), "testSqrt"),
    ("SQRT(CAST(44 AS BIGINT))", math.sqrt(44L), "testSqrt"),
    ("SQRT(CAST(2 AS DOUBLE))", math.sqrt(2.0), "testSqrt"),
    ("SQRT(25)", 5.0, "testSqrt"),
    ("POWER(CAST(2.2 AS DOUBLE), CAST(0.5 AS DOUBLE))", math.sqrt(2.2), "testSqrt"),
    ("LN(CAST(42 AS TINYINT))", math.log(42), "testLn"),
    ("LN(CAST(44 AS BIGINT))", math.log(44L), "testLn"),
    ("FLOOR(CAST(4.5 AS FLOAT))", 4.0, "testArithmeticFloorCeil"),
    ("CEIL(CAST(4.5 AS FLOAT))", 5.0, "testArithmeticFloorCeil"),
    ("FLOOR(CAST(43 AS SMALLINT))", 43.0, "testArithmeticFloorCeil"),
    ("CEIL(CAST(43 AS SMALLINT))", 43.0, "testArithmeticFloorCeil"),
    ("FLOOR(CAST('-1231.1231231321321321111' AS DECIMAL(30,20)))", -1232.0,
      "testArithmeticFloorCeil"),
    ("CEIL(CAST('-1231.1231231321321321111' AS DECIMAL(30,20)))", -1231.0,
      "testArithmeticFloorCeil"),
    ("SIN(CAST(42 AS TINYINT))", math.sin(42), "testSin"),
    ("COS(CAST(42 AS TINYINT))", math.cos(42), "testCos"),
    ("TAN(CAST(42 AS TINYINT))", math.tan(42), "testTan"),
    ("COT(CAST(42 AS TINYINT))", 1.0 / math.tan(42), "testCot"),
    ("ASIN(CAST(0.45 AS DOUBLE))", math.asin(0.45), "testAsin"),
    ("ACOS(CAST(0.46 AS DOUBLE))", math.acos(0.46), "testAcos"),
    ("ATAN(CAST(0.46 AS DOUBLE))", math.atan(0.46), "testAtan"),
    ("DEGREES(CAST(0.46 AS DOUBLE))", math.toDegrees(0.46), "testDegrees"),
    ("RADIANS(CAST(0.46 AS DOUBLE))", math.toRadians(0.46), "testRadians"),
    ("SIGN(CAST(-4.6 AS DOUBLE))", -1.0, "testSign"))

  cases.foreach { case (expr, expected, ref) =>
    test(s"$ref: $expr") {
      assert(evalD(expr) == expected)
    }
  }
}
