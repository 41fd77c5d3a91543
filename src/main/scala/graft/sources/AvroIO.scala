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
  * union(null, T), plus — round-10 completion — READ-side enum (→
  * string), fixed (→ binary), and multi-branch unions (int/long → long,
  * float/double → double, anything else → a member0..memberN struct,
  * the public spark-avro conventions): the full GenericRecord surface
  * AvroInputFormat exposes.
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
    * recursive over records/arrays/maps). Round-10 widening — the three
    * GenericRecord corners beyond the write-side mapping, following the
    * public spark-avro conventions so a user switching libraries sees
    * the same shapes:
    *  - ENUM → string (the symbol name);
    *  - FIXED → binary (the fixed-width bytes);
    *  - multi-branch UNION: a null branch contributes nullability;
    *    union(int, long) reads as long and union(float, double) as
    *    double (the numeric promotions); any other member set maps to
    *    a STRUCT with one nullable field per branch, named
    *    `member0..memberN` in union order, exactly one non-null per
    *    value (so union(int, string) → struct<member0: int,
    *    member1: string>). Write-side schemas derive from Spark types
    *    and therefore never produce these; reading and re-writing a
    *    member-struct round-trips the STRUCT form (the documented
    *    flattening, not the original union). */
  def sparkSchemaOf(schema: Schema): StructType = {
    def of(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        import scala.jdk.CollectionConverters._
        val ts = s.getTypes.asScala.toList
        val branches = ts.filterNot(_.getType == Schema.Type.NULL)
        val nullable = branches.size != ts.size
        // promotions match on the branch SET (spark-avro is
        // order-independent: union(long,int) promotes like
        // union(int,long))
        branches.map(_.getType) match {
          case _ :: Nil => (of(branches.head)._1, nullable)
          case ts2 if ts2.toSet == Set(Schema.Type.INT, Schema.Type.LONG) =>
            (LongType, nullable)
          case ts2
              if ts2.toSet == Set(Schema.Type.FLOAT, Schema.Type.DOUBLE) =>
            (DoubleType, nullable)
          case _ =>
            (StructType(branches.zipWithIndex.map { case (b, i) =>
              StructField(s"member$i", of(b)._1, nullable = true)
            }), nullable)
        }
      case Schema.Type.ENUM => (StringType, false)
      case Schema.Type.FIXED => (BinaryType, false)
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

  /** Avro value → Spark value, SCHEMA-DIRECTED (the avro schema decides
    * the conversion, so union member-structs are unambiguous — a record
    * value can be either a struct field or a union branch, and only the
    * schema knows which). Utf8 → String, ByteBuffer → bytes, enum
    * symbol → String, fixed → bytes, records/arrays/maps recursively,
    * unions per the [[sparkSchemaOf]] mapping. */
  private def fromAvro(v: Any, s: Schema, dt: DataType): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        import scala.jdk.CollectionConverters._
        val branches = s.getTypes.asScala.toList
          .filterNot(_.getType == Schema.Type.NULL)
        (branches.map(_.getType), dt) match {
          case (_ :: Nil, _) => fromAvro(v, branches.head, dt)
          case (ts2, LongType)
              if ts2.toSet == Set(Schema.Type.INT, Schema.Type.LONG) =>
            Long.box(v.asInstanceOf[Number].longValue())
          case (ts2, DoubleType)
              if ts2.toSet == Set(Schema.Type.FLOAT, Schema.Type.DOUBLE) =>
            Double.box(v.asInstanceOf[Number].doubleValue())
          case (_, st: StructType) => // member struct: one branch set
            val fullIdx = GenericData.get().resolveUnion(s, v)
            val branch = s.getTypes.get(fullIdx)
            val memberIdx = branches.indexOf(branch)
            val vals = new Array[Any](st.length)
            vals(memberIdx) =
              fromAvro(v, branch, st.fields(memberIdx).dataType)
            Row.fromSeq(vals.toIndexedSeq)
          case other => throw new IllegalArgumentException(
            s"cannot read union $s as $dt ($other)")
        }
      case Schema.Type.ENUM => v.toString
      case Schema.Type.FIXED =>
        v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.RECORD =>
        val st = dt.asInstanceOf[StructType]
        val rec = v.asInstanceOf[GenericRecord]
        val fs = s.getFields
        val vals = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          vals(i) = fromAvro(rec.get(i), fs.get(i).schema(),
            st.fields(i).dataType)
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      case Schema.Type.ARRAY =>
        val et = dt.asInstanceOf[ArrayType].elementType
        val out = Vector.newBuilder[Any]
        v.asInstanceOf[java.util.Collection[_]]
          .forEach(e => out += fromAvro(e, s.getElementType, et))
        out.result()
      case Schema.Type.MAP =>
        val vt = dt.asInstanceOf[MapType].valueType
        val out = Map.newBuilder[String, Any]
        v.asInstanceOf[java.util.Map[_, _]].forEach((k, x) =>
          out += (k.toString -> fromAvro(x, s.getValueType, vt)))
        out.result()
      case Schema.Type.INT if dt == DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue()))
      case Schema.Type.LONG if dt == TimestampType =>
        val l = v.asInstanceOf[java.lang.Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
        ts
      case Schema.Type.BYTES if dt.isInstanceOf[DecimalType] =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
        val a = new Array[Byte](bb.remaining()); bb.get(a)
        new java.math.BigDecimal(new java.math.BigInteger(a),
          dt.asInstanceOf[DecimalType].scale)
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
        val a = new Array[Byte](bb.remaining()); bb.get(a); a
      case Schema.Type.STRING => v.toString
      case _ => v
    }
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
      // close on failure too — INCLUDING a failure writing the container
      // header in create() (review r17 pass 2: the first fix started the
      // try after create, so a header-write IO error still leaked the
      // stream): an abandoned writer pins its stream for the executor's
      // lifetime, and a retry re-creates the file (overwrite=true) so
      // the close loses nothing. A close() failure on the broken-stream
      // path is SUPPRESSED onto the root cause rather than masking it.
      try {
        w.create(schema, out)
        it.foreach { row =>
          w.append(toAvro(row, schema).asInstanceOf[GenericRecord])
        }
      } catch {
        case t: Throwable =>
          try w.close()
          catch { case c: Throwable if c ne t => t.addSuppressed(c) }
          try out.close()
          catch { case c: Throwable if c ne t => t.addSuppressed(c) }
          throw t
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
        val schema = new Schema.Parser().parse(avroJson)
        val in = pds.open()
        // the head file's schema rides as the READER (expected) schema:
        // a part written under a different schema then fails with avro's
        // named resolution error instead of fromAvro silently walking
        // the wrong field layout (review r17; the write contract says
        // all parts share one schema — this makes a violation loud)
        val reader = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord](null, schema))
        // exhaustion closes the stream below, but an early-terminated
        // consumer (limit/take, a downstream failure) never reaches it —
        // the write path's r17 leak lesson, read form: tie the close to
        // task completion so no partition pins its input stream for the
        // executor's lifetime (double-close is a no-op on DataFileStream)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            try reader.close() catch { case _: java.io.IOException => () }
          })
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row =
            fromAvro(reader.next(), schema, sparkSchema).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
