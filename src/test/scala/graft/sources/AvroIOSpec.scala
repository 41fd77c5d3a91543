package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro object-container-file round-trips over avro-core (the
  * AvroInputFormat/AvroOutputFormat surface, re-expressed without the
  * absent spark-avro DataSource jar). */
class AvroIOSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_avro").toString

  test("round-trip: primitives + nulls survive, one container file per partition") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null),
      Row(3L, "gamma", -0.25, true, Array[Byte]()),
      Row(4L, "delta", 99.0, false, Array[Byte](-1)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).repartition(3)
    val dir = tmp()
    AvroIO.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 3) // one container file per partition
    val back = AvroIO.read(spark, dir)
    assert(back.schema == schema)
    def canon(r: Row) = (r.getLong(0), Option(r.getString(1)),
      Option(r.get(2)), r.getBoolean(3),
      Option(r.getAs[Array[Byte]](4)).map(_.toSeq))
    assert(back.collect().map(canon).toSet == rows.map(canon).toSet)
  }

  test("the avro schema mapping round-trips, both directions") {
    val s = StructType(Seq(
      StructField("a", IntegerType, nullable = true),
      StructField("b", FloatType, nullable = false),
      StructField("nested", StructType(Seq(
        StructField("x", StringType, nullable = true),
        StructField("ys", ArrayType(LongType, containsNull = false),
          nullable = false))), nullable = true),
      StructField("m", MapType(StringType, DoubleType,
        valueContainsNull = true), nullable = false)))
    val avro = AvroIO.avroSchemaOf(s)
    assert(AvroIO.sparkSchemaOf(avro) == s)
    // avro maps require string keys — anything else rejects by name
    val e = intercept[IllegalArgumentException] {
      AvroIO.avroSchemaOf(StructType(Seq(
        StructField("m", MapType(LongType, LongType)))))
    }
    assert(e.getMessage.contains("string keys"))
  }

  test("round-trip: nested structs, arrays of structs, and maps") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType, nullable = true),
        StructField("tags", ArrayType(StringType, containsNull = true),
          nullable = false))), nullable = true),
      StructField("spans", ArrayType(StructType(Seq(
        StructField("off", IntegerType, nullable = false),
        StructField("len", IntegerType, nullable = false))),
        containsNull = false), nullable = false),
      StructField("scores", MapType(StringType, DoubleType,
        valueContainsNull = true), nullable = false)))
    val rows = Seq(
      Row(1L, Row("en", Seq("a", null, "c")),
        Seq(Row(0, 5), Row(7, 2)), Map("q" -> 0.5, "p" -> null)),
      Row(2L, null, Seq.empty, Map.empty[String, Double]),
      Row(3L, Row(null, Seq.empty), Seq(Row(3, 3)),
        Map("only" -> -1.25)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).repartition(2)
    val dir = tmp()
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == schema)
    def norm(v: Any): Any = v match {
      case r: Row => r.toSeq.map(norm).toList
      case s: scala.collection.Seq[_] => s.map(norm).toList
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => k -> norm(x) }.toMap
      case other => other
    }
    assert(back.collect().map(norm).toSet == rows.map(norm).toSet)
  }

  test("round-trip: date / timestamp-micros / decimal logical types") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("amt", DecimalType(12, 2), nullable = true)))
    val t0 = java.sql.Timestamp.valueOf("2023-06-15 12:34:56.123456")
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2020-02-29"), t0,
        new java.math.BigDecimal("12345.67")),
      Row(2L, null, null, null),
      Row(3L, java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        new java.math.BigDecimal("-0.01")))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).coalesce(1)
    val dir = tmp()
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == schema)
    // the avro file really carries logical types, not raw primitives
    val avro = AvroIO.avroSchemaOf(schema)
    assert(avro.toString.contains("\"logicalType\":\"date\"")
      && avro.toString.contains("\"logicalType\":\"timestamp-micros\"")
      && avro.toString.contains("\"logicalType\":\"decimal\""))
    val got = back.collect()
    assert(got.map(r => (r.getLong(0), String.valueOf(r.getDate(1)),
        String.valueOf(r.getTimestamp(2)),
        String.valueOf(r.getDecimal(3)))).toSet ==
      rows.map(r => (r.getLong(0), String.valueOf(r.get(1)),
        String.valueOf(r.get(2)),
        Option(r.get(3)).map(_.asInstanceOf[java.math.BigDecimal]
          .setScale(2).toString).getOrElse("null"))).toSet)
  }

  test("typed dataset round-trip via toDF") {
    val dir = tmp()
    val df = Seq((10L, "x", 1.0), (11L, "y", 2.0), (12L, "z", 3.0))
      .toDF("k", "s", "v").coalesce(1)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((10L, "x", 1.0), (11L, "y", 2.0), (12L, "z", 3.0)))
  }
}
