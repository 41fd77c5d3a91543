package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypesSpec extends AnyFunSuite {
  test("primitive mappings match Catalyst types") {
    assert(Types.STRING == StringType && Types.LONG == LongType
      && Types.DOUBLE == DoubleType && Types.SQL_TIMESTAMP == TimestampType)
    assert(Types.DECIMAL(18, 2) == DecimalType(18, 2))
  }

  test("ROW builds named and positional structs") {
    assert(Types.ROW("a" -> Types.INT, "b" -> Types.STRING) ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(Types.ROW(Types.INT, Types.STRING).fieldNames.toSeq ==
      Seq("f0", "f1"))
  }

  test("arrays, maps and multiset encodings") {
    assert(Types.PRIMITIVE_ARRAY(Types.DOUBLE) ==
      ArrayType(DoubleType, containsNull = false))
    assert(Types.OBJECT_ARRAY(Types.STRING) ==
      ArrayType(StringType, containsNull = true))
    assert(Types.MAP(Types.STRING, Types.LONG) == MapType(StringType, LongType))
    assert(Types.MULTISET(Types.INT) ==
      MapType(IntegerType, IntegerType, valueContainsNull = false))
  }

  test("a schema built from Types round-trips through a DataFrame") {
    val spark = SparkSuite.session
    val schema = Types.ROW("id" -> Types.LONG, "name" -> Types.STRING,
      "tags" -> Types.OBJECT_ARRAY(Types.STRING))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "x", Seq("t"))), schema)
    assert(df.schema == schema && df.count() == 1)
  }
}
