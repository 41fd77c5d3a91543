package graft

import org.apache.spark.sql.types._

/** The reference's Table/SQL type surface (Types.scala:32-198 in
  * flink-table, rooted at TypeInformation/BasicTypeInfo — SURVEY.md §1.2)
  * mapped onto Catalyst DataTypes. One name per reference type so user code
  * and docs can speak the reference vocabulary; semantic deltas are noted
  * inline.
  */
object Types {
  // primitives (BasicTypeInfo.java:69 / Types.scala:37-77)
  val STRING: DataType = StringType
  val BOOLEAN: DataType = BooleanType
  val BYTE: DataType = ByteType
  val SHORT: DataType = ShortType
  val INT: DataType = IntegerType
  val LONG: DataType = LongType
  val FLOAT: DataType = FloatType
  val DOUBLE: DataType = DoubleType
  /** DECIMAL defaults to Spark's system default precision/scale. */
  val DECIMAL: DataType = DecimalType.SYSTEM_DEFAULT
  def DECIMAL(precision: Int, scale: Int): DataType =
    DecimalType(precision, scale)

  // temporal (Types.scala:82-102)
  val SQL_DATE: DataType = DateType
  /** No TIME type in Spark — represented as millis-of-day (documented
    * delta, SURVEY.md §1.2). */
  val SQL_TIME: DataType = IntegerType
  val SQL_TIMESTAMP: DataType = TimestampType
  val INTERVAL_MONTHS: DataType = YearMonthIntervalType()
  val INTERVAL_MILLIS: DataType = DayTimeIntervalType()

  // composites (Types.scala:121-198)
  def ROW(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })
  def ROW(types: DataType*)(implicit d: DummyImplicit): StructType =
    StructType(types.zipWithIndex.map { case (t, i) => StructField(s"f$i", t) })
  def PRIMITIVE_ARRAY(elem: DataType): ArrayType =
    ArrayType(elem, containsNull = false)
  def OBJECT_ARRAY(elem: DataType): ArrayType =
    ArrayType(elem, containsNull = true)
  def MAP(key: DataType, value: DataType): MapType = MapType(key, value)
  /** MULTISET[E] is backed by Map[E, Integer] in the reference — identical
    * encoding here (and in the COLLECT aggregate, Udafs.MultisetAgg). */
  def MULTISET(elem: DataType): MapType =
    MapType(elem, IntegerType, valueContainsNull = false)
}
