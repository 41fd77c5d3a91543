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

  /** Writes one container file with an externally-authored schema (the
    * shapes OUR write path never produces — enum/fixed/unions — as an
    * upstream producer would). */
  private def writeForeign(schemaJson: String,
      fill: org.apache.avro.generic.GenericData.Record => Unit*): String = {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmp()
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    fill.foreach { f =>
      val rec = new GenericData.Record(schema); f(rec); w.append(rec)
    }
    w.close()
    dir
  }

  test("read-side completion: enum → string, fixed → binary") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.GenericData
    val json =
      """{"type":"record","name":"r","fields":[
        |  {"name":"color","type":{"type":"enum","name":"Color",
        |     "symbols":["RED","GREEN","BLUE"]}},
        |  {"name":"digest","type":{"type":"fixed","name":"Md5","size":4}}
        |]}""".stripMargin
    val schema = new Schema.Parser().parse(json)
    val enumS = schema.getField("color").schema()
    val fixedS = schema.getField("digest").schema()
    val dir = writeForeign(json,
      r => { r.put("color", new GenericData.EnumSymbol(enumS, "GREEN"))
             r.put("digest", new GenericData.Fixed(fixedS,
               Array[Byte](1, 2, 3, 4))) },
      r => { r.put("color", new GenericData.EnumSymbol(enumS, "RED"))
             r.put("digest", new GenericData.Fixed(fixedS,
               Array[Byte](9, 8, 7, 6))) })
    val back = AvroIO.read(spark, dir)
    assert(back.schema == StructType(Seq(
      StructField("color", StringType, nullable = false),
      StructField("digest", BinaryType, nullable = false))))
    val got = back.collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(got == Set(("GREEN", Seq[Byte](1, 2, 3, 4)),
      ("RED", Seq[Byte](9, 8, 7, 6))))
  }

  test("numeric union promotion is order-independent: union(long,int) " +
      "and union(double,float) promote like their reversals") {
    val json =
      """{"type":"record","name":"r","fields":[
        |  {"name":"n","type":["long","int"]},
        |  {"name":"x","type":["null","double","float"]}
        |]}""".stripMargin
    val dir = writeForeign(json,
      r => { r.put("n", Int.box(7)); r.put("x", Float.box(0.5f)) },
      r => { r.put("n", Long.box(1L << 40)); r.put("x", null) })
    val back = AvroIO.read(spark, dir)
    assert(back.schema == StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("x", DoubleType, nullable = true))))
    assert(back.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      == Set((7L, Some(0.5)), (1L << 40, None)))
  }

  test("read-side completion: numeric union promotions and the " +
      "union(int, string) member struct") {
    val json =
      """{"type":"record","name":"r","fields":[
        |  {"name":"n","type":["int","long"]},
        |  {"name":"x","type":["null","float","double"]},
        |  {"name":"u","type":["int","string"]},
        |  {"name":"nu","type":["null","int","string"]}
        |]}""".stripMargin
    val dir = writeForeign(json,
      r => { r.put("n", Int.box(7)); r.put("x", Float.box(1.5f))
             r.put("u", Int.box(42)); r.put("nu", null) },
      r => { r.put("n", Long.box(1L << 40)); r.put("x", null)
             r.put("u", new org.apache.avro.util.Utf8("hi"))
             r.put("nu", new org.apache.avro.util.Utf8("s")) })
    val back = AvroIO.read(spark, dir)
    // documented mapping: promotions collapse to the wide branch;
    // union(int,string) → struct<member0: int, member1: string>
    assert(back.schema == StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("x", DoubleType, nullable = true),
      StructField("u", StructType(Seq(
        StructField("member0", IntegerType, nullable = true),
        StructField("member1", StringType, nullable = true))),
        nullable = false),
      StructField("nu", StructType(Seq(
        StructField("member0", IntegerType, nullable = true),
        StructField("member1", StringType, nullable = true))),
        nullable = true))))
    val got = back.collect().map { r =>
      (r.getLong(0), Option(r.get(1)),
        (Option(r.getStruct(2).get(0)), Option(r.getStruct(2).get(1))),
        Option(r.getStruct(3)).map(s =>
          (Option(s.get(0)), Option(s.get(1)))))
    }.toSet
    assert(got == Set(
      (7L, Some(1.5), (Some(42), None), None),
      (1L << 40, None, (None, Some("hi")), Some((None, Some("s"))))))
    // re-writing the member-struct READ result round-trips the STRUCT
    // form (the documented flattening), stable under a second cycle
    val dir2 = tmp()
    AvroIO.write(back.coalesce(1), dir2)
    val again = AvroIO.read(spark, dir2)
    assert(again.schema == back.schema)
    assert(again.collect().map(_.toString).toSet ==
      back.collect().map(_.toString).toSet)
  }
}
