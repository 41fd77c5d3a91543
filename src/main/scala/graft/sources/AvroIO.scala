package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro OBJECT-CONTAINER-FILE source/sink over the in-image avro-core
  * library (flink-formats/flink-avro/.../AvroInputFormat.java:54 reads
  * the same container framing via DataFileReader;
  * AvroOutputFormat.java:53 writes it). The spark-avro DataSource jar is
  * NOT in the image, so this is the documented last-resort tier — an
  * RDD-level format driver over public avro-core + Hadoop FileSystem
  * APIs. Type surface: the primitive kernel
  * (boolean/int/long/float/double/string/bytes) plus — since round
  * 10 — NESTED records (struct ↔ record), arrays, and string-keyed
  * maps, recursively at any depth, every position nullable via
  * union(null, T): the full GenericRecord surface AvroInputFormat
  * exposes short of fixed/enum/multi-branch unions.
  *
  * Scale shape: one container file per input partition on write (the
  * reference's parallel OutputFormat posture); reads parallelize per
  * file via binaryFiles — container blocks inside one file are NOT
  * split (the reference's unsplit-DataFileReader behavior when no
  * block-splitting is configured), so write-side partitioning is the
  * parallelism dial.
  */
object AvroIO {

  /** Spark schema → Avro record schema (nullable positions become
    * union(null, base), the standard Avro convention). Round 10 widens
    * the mapping beyond the flat primitive kernel: nested STRUCTs map
    * to nested records (record names derive from the field path —
    * Avro requires unique names), ARRAYs to avro arrays, and
    * string-keyed MAPs to avro maps, all recursively and at any
    * nesting depth. */
  def avroSchemaOf(schema: StructType, name: String = "row"): Schema = {
    def base(dt: DataType, path: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType => // logical type date over int (epoch days)
        org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType => // logical type timestamp-micros over long
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case dt: DecimalType => // logical type decimal over bytes
        org.apache.avro.LogicalTypes.decimal(dt.precision, dt.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case st: StructType => record(st, path)
      case ArrayType(et, containsNull) =>
        Schema.createArray(wrap(et, containsNull, path + "_item"))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(wrap(vt, valueContainsNull, path + "_value"))
      case other => throw new IllegalArgumentException(
        s"AvroIO cannot map $other (avro maps need string keys)")
    }
    def wrap(dt: DataType, nullable: Boolean, path: String): Schema = {
      val b = base(dt, path)
      if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), b)
      else b
    }
    def record(st: StructType, path: String): Schema = {
      val fields = new java.util.ArrayList[Schema.Field]()
      st.fields.foreach { f =>
        val s = wrap(f.dataType, f.nullable, path + "_" + f.name)
        val default: AnyRef =
          if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
        fields.add(new Schema.Field(f.name, s, null, default))
      }
      Schema.createRecord(path, null, "graft", false, fields)
    }
    record(schema, name)
  }

  /** Avro record schema → Spark schema (the read-side inverse;
    * recursive over records/arrays/maps). */
  def sparkSchemaOf(schema: Schema): StructType = {
    def of(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val ts = s.getTypes
        require(ts.size == 2 && ts.get(0).getType == Schema.Type.NULL,
          s"only union(null, T) is supported: $s")
        (of(ts.get(1))._1, true)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT =>
        (if (s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Date])
           DateType
         else IntegerType, false)
      case Schema.Type.LONG =>
        (if (s.getLogicalType
             .isInstanceOf[org.apache.avro.LogicalTypes.TimestampMicros])
           TimestampType
         else LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES =>
        (s.getLogicalType match {
          case d: org.apache.avro.LogicalTypes.Decimal =>
            DecimalType(d.getPrecision, d.getScale)
          case _ => BinaryType
        }, false)
      case Schema.Type.RECORD => (structOf(s), false)
      case Schema.Type.ARRAY =>
        val (dt, n) = of(s.getElementType)
        (ArrayType(dt, containsNull = n), false)
      case Schema.Type.MAP =>
        val (dt, n) = of(s.getValueType)
        (MapType(StringType, dt, valueContainsNull = n), false)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro type $other")
    }
    def structOf(s: Schema): StructType =
      StructType(s.getFields.toArray.map {
        case f: Schema.Field =>
          val (dt, nullable) = of(f.schema())
          StructField(f.name(), dt, nullable)
      })
    structOf(schema)
  }

  /** Spark value → Avro value, following the (already union-aware)
    * schema recursively. */
  private def toAvro(v: Any, s: Schema): AnyRef = v match {
    case null => null
    case _ => s.getType match {
      case Schema.Type.UNION => toAvro(v, s.getTypes.get(1))
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        val fs = s.getFields
        var i = 0
        while (i < fs.size()) {
          rec.put(i, toAvro(row.get(i), fs.get(i).schema()))
          i += 1
        }
        rec
      case Schema.Type.ARRAY =>
        val out = new java.util.ArrayList[AnyRef]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(e =>
          out.add(toAvro(e, s.getElementType)))
        out
      case Schema.Type.MAP =>
        val out = new java.util.HashMap[String, AnyRef]()
        v.asInstanceOf[scala.collection.Map[String, Any]].foreach {
          case (k, x) => out.put(k, toAvro(x, s.getValueType))
        }
        out
      case Schema.Type.INT
          if s.getLogicalType.isInstanceOf[
            org.apache.avro.LogicalTypes.Date] =>
        Int.box(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
      case Schema.Type.LONG
          if s.getLogicalType.isInstanceOf[
            org.apache.avro.LogicalTypes.TimestampMicros] =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        Long.box(Math.floorDiv(ts.getTime, 1000L) * 1000000L
          + ts.getNanos / 1000L)
      case Schema.Type.BYTES
          if s.getLogicalType.isInstanceOf[
            org.apache.avro.LogicalTypes.Decimal] =>
        val d = s.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.getScale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case Schema.Type.BYTES =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _ => v.asInstanceOf[AnyRef]
    }
  }

  /** Avro value → Spark value (Utf8 → String, ByteBuffer → bytes,
    * records/arrays/maps recursively). */
  private def fromAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case i: java.lang.Integer if dt == DateType =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case l: java.lang.Long if dt == TimestampType =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      ts
    case bb: java.nio.ByteBuffer if dt.isInstanceOf[DecimalType] =>
      val a = new Array[Byte](bb.remaining()); bb.get(a)
      new java.math.BigDecimal(new java.math.BigInteger(a),
        dt.asInstanceOf[DecimalType].scale)
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    case rec: GenericRecord =>
      val st = dt.asInstanceOf[StructType]
      val vals = new Array[Any](st.length)
      var i = 0
      while (i < st.length) {
        vals(i) = fromAvro(rec.get(i), st.fields(i).dataType)
        i += 1
      }
      Row.fromSeq(vals.toIndexedSeq)
    case l: java.util.Collection[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val out = Vector.newBuilder[Any]
      l.forEach(e => out += fromAvro(e, et))
      out.result()
    case m: java.util.Map[_, _] =>
      val vt = dt.asInstanceOf[MapType].valueType
      val out = Map.newBuilder[String, Any]
      m.forEach((k, x) => out += (k.toString -> fromAvro(x, vt)))
      out.result()
    case other => other
  }

  /** Write one container file per partition under `path`
    * (part-NNNNN.avro). */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaOf(sparkSchema).toString
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val schema = new Schema.Parser().parse(avroJson)
      val fs = FileSystem.get(new java.net.URI(path), hconf.value)
      val out = fs.create(new Path(path, f"part-$pid%05d.avro"), true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      it.foreach { row =>
        w.append(toAvro(row, schema).asInstanceOf[GenericRecord])
      }
      w.close()
      Iterator.single(pid)
    }.count(): Unit
  }

  /** Read every container file under `path`; the schema comes from the
    * first file (all parts share it — the write contract). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"no .avro container files under $path")
    val first = new DataFileStream[GenericRecord](
      fs.open(files.head), new GenericDatumReader[GenericRecord]())
    val avroJson = try first.getSchema.toString finally first.close()
    val sparkSchema = sparkSchemaOf(new Schema.Parser().parse(avroJson))
    val rows = spark.sparkContext
      .binaryFiles(files.map(_.toString).mkString(","))
      .flatMap { case (_, pds) =>
        val in = pds.open()
        val reader = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row =
            fromAvro(reader.next(), sparkSchema).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
