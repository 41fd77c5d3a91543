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
  * APIs — kept deliberately small: flat records of the primitive kernel
  * (boolean/int/long/float/double/string/bytes), nullable via
  * union(null, T), which is AvroInputFormat's GenericRecord surface.
  *
  * Scale shape: one container file per input partition on write (the
  * reference's parallel OutputFormat posture); reads parallelize per
  * file via binaryFiles — container blocks inside one file are NOT
  * split (the reference's unsplit-DataFileReader behavior when no
  * block-splitting is configured), so write-side partitioning is the
  * parallelism dial.
  */
object AvroIO {

  /** Spark schema → Avro record schema (nullable fields become
    * union(null, base), the standard Avro convention). */
  def avroSchemaOf(schema: StructType, name: String = "row"): Schema = {
    def base(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroIO supports the flat primitive kernel; got $other")
    }
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val s =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base(f.dataType))
        else base(f.dataType)
      val default: AnyRef =
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
      fields.add(new Schema.Field(f.name, s, null, default))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Avro record schema → Spark schema (the read-side inverse). */
  def sparkSchemaOf(schema: Schema): StructType = {
    def of(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val ts = s.getTypes
        require(ts.size == 2 && ts.get(0).getType == Schema.Type.NULL,
          s"only union(null, T) is supported: $s")
        (of(ts.get(1))._1, true)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro type $other")
    }
    StructType(schema.getFields.toArray.map {
      case f: Schema.Field =>
        val (dt, nullable) = of(f.schema())
        StructField(f.name(), dt, nullable)
    })
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
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          val v = row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          }
          rec.put(i, v)
          i += 1
        }
        w.append(rec)
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
    val n = sparkSchema.length
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
          def next(): Row = {
            val rec = reader.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              vals(i) = rec.get(i) match {
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case other => other
              }
              i += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
